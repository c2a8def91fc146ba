package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming materialized-view maintenance: fold each micro-batch's
  * partial aggregate into a versioned per-key state snapshot with
  * `foreachBatch` — the production pattern for keeping a 100 TB rollup
  * current without ever re-scanning history ([[IncrementalAgg]] is the
  * algebra; this is its streaming driver).
  *
  * Exactly-once without a transactional sink: version = batchId. Batch
  * b ALWAYS merges `state_v{b-1}` + its own partial and overwrites
  * `state_v{b}` — a retried batch recomputes the identical snapshot
  * from the identical predecessor (idempotent), and a crash between
  * write and commit just replays the same deterministic merge. This is
  * the same replay contract Structured Streaming's file sinks rely on,
  * expressed over plain parquet.
  *
  * Scale shape per batch: one partial-agg shuffle over the BATCH, one
  * key-sized outer merge against the previous snapshot. State size is
  * the key cardinality, not history volume.
  */
object StreamMatView {

  /** Run the stream to completion (AvailableNow), folding batches into
    * `stateDir/state_v{batchId}`; returns the final state frame.
    * `prep` shapes each raw micro-batch into (keys..., valueCol) rows
    * before aggregation (filters/derivations — kept OUT of the stream
    * plan so the whole pipeline is plain batch code under foreachBatch).
    */
  def runFold(stream: DataFrame, keys: Seq[String], valueCol: String,
              stateDir: String, prep: DataFrame => DataFrame): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val inc = IncrementalAgg.aggregate(prep(batch), keys, valueCol)
        val merged =
          if (bid == 0) inc
          else IncrementalAgg.merge(
            spark.read.parquet(s"$stateDir/state_v${bid - 1}"), inc, keys)
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/state_v$bid")
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    q.exception.foreach(throw _)
    val versions = Option(new java.io.File(stateDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("state_v") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.stripPrefix("state_v").toLong)
    require(versions.nonEmpty, s"runFold: no committed state in $stateDir")
    spark.read.parquet(s"$stateDir/state_v${versions.max}")
  }
}
