package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
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
  * the key cardinality, not history volume — and the snapshot WRITE is
  * key-hash partitioned with a file count sized from the previous
  * snapshot's on-disk bytes ([[graft.sources.Export.parquetBytes]], the
  * compactParquet sizing idiom), so a wide key space never funnels
  * through one task the way the earlier `coalesce(1)` write did. The
  * target file size rides `spark.graft.stateTargetBytes` (default
  * 64 MiB); sizing from the b-1 snapshot lags growth by one batch,
  * which stays within ~2x of ideal while keys accumulate.
  */
object StreamMatView {

  /** Snapshot file count for batch `bid`: previous snapshot bytes /
    * target, 1 for the first batch (no predecessor to size from —
    * a fresh state is one batch's key set).
    */
  private def stateFiles(spark: org.apache.spark.sql.SparkSession,
                         stateDir: String, bid: Long): Int =
    if (bid == 0) 1
    else {
      val target = spark.conf
        .getOption("spark.graft.stateTargetBytes")
        .map(_.toLong).getOrElse(64L << 20)
      val bytes = graft.sources.Export.parquetBytes(
        spark, s"$stateDir/state_v${bid - 1}")
      math.max(1L, (bytes + target - 1) / target).toInt
    }

  private def writeState(merged: DataFrame, keys: Seq[String],
                         stateDir: String, bid: Long, nFiles: Int): Unit =
    merged.repartition(nFiles, keys.map(col): _*)
      .write.mode("overwrite").parquet(s"$stateDir/state_v$bid")

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
        val nFiles = stateFiles(spark, stateDir, bid)
        val merged =
          if (bid == 0) inc
          else IncrementalAgg.merge(
            spark.read.parquet(s"$stateDir/state_v${bid - 1}"), inc, keys)
        writeState(merged, keys, stateDir, bid, nFiles)
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
        val nFiles = stateFiles(spark, stateDir, bid)
        val merged =
          if (bid == 0) inc
          else IncrementalAgg.mergeBitmap(
            spark.read.parquet(s"$stateDir/state_v${bid - 1}"), inc, keys)
        writeState(merged, keys, stateDir, bid, nFiles)
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
