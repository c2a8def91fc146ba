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
    // the final version is THIS run's highest written batchId — never
    // inferred from the directory listing, which may hold more versions
    // from an earlier, longer run sharing the stateDir (a listing-max
    // would silently return that stale snapshot)
    val lastBid = new java.util.concurrent.atomic.AtomicLong(-1L)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val inc = IncrementalAgg.aggregate(prep(batch), keys, valueCol)
        val merged =
          if (bid == 0) inc
          else IncrementalAgg.merge(
            spark.read.parquet(s"$stateDir/state_v${bid - 1}"), inc, keys)
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/state_v$bid")
        lastBid.getAndUpdate(m => math.max(m, bid))
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    q.exception.foreach(throw _)
    require(lastBid.get() >= 0, s"runFold: stream produced no batches")
    spark.read.parquet(s"$stateDir/state_v${lastBid.get()}")
  }

  /** Bitmap-state twin of [[runFold]] over
    * [[IncrementalAgg.aggregateBitmap]]/[[IncrementalAgg.mergeBitmap]]:
    * the streaming engagement-bitmap maintainer. OR-merge is idempotent,
    * so a replayed batch is harmless even beyond the versioned-snapshot
    * replay contract.
    */
  def runFoldBitmap(stream: DataFrame, keys: Seq[String], dayCol: String,
                    stateDir: String, prep: DataFrame => DataFrame)
  : DataFrame = {
    val spark = stream.sparkSession
    val lastBid = new java.util.concurrent.atomic.AtomicLong(-1L)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val inc = IncrementalAgg.aggregateBitmap(prep(batch), keys, dayCol)
        val merged =
          if (bid == 0) inc
          else IncrementalAgg.mergeBitmap(
            spark.read.parquet(s"$stateDir/state_v${bid - 1}"), inc, keys)
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/state_v$bid")
        lastBid.getAndUpdate(m => math.max(m, bid))
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    q.exception.foreach(throw _)
    require(lastBid.get() >= 0, "runFoldBitmap: stream produced no batches")
    spark.read.parquet(s"$stateDir/state_v${lastBid.get()}")
  }
}
