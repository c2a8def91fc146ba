package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
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

  /** Changed-bucket delta fold — [[runFold]] upgraded so a micro-batch
    * rewrites ONLY the state buckets its keys hash into, instead of the
    * full snapshot. At 100 TB key cardinalities the full-snapshot fold
    * reads and rewrites the entire rollup every batch even when the
    * batch touches a sliver of the key space (the common shape: a
    * time-local batch touches recently-active keys); here per-batch IO
    * is proportional to the TOUCHED-bucket state, and untouched buckets
    * are carried forward by manifest pointer — zero bytes moved.
    *
    * Layout: state rows live under `delta_v{bid}/__bucket={b}/` (hive
    * partitioned by the key-hash bucket, `pmod(xxhash64(keys), B)`,
    * `B` = `spark.graft.stateBuckets`, default 16 — the file-sizing
    * knob: one bucket ≈ state bytes / B). `manifest_v{bid}.json` maps
    * every bucket to the delta version currently holding it; the
    * manifest write is the batch's commit point.
    *
    * Exactly-once is the same idempotent-replay contract as [[runFold]]:
    * batch b derives everything from `manifest_v{b-1}` plus its own
    * deterministic partial, so a retried batch overwrites
    * `delta_v{b}` and `manifest_v{b}` with identical content. A crash
    * between the delta write and the manifest write replays into the
    * same overwrite. The touched-bucket list is a ≤B-element distinct
    * collect — bounded by configuration, never by data.
    */
  def runFoldDelta(stream: DataFrame, keys: Seq[String], valueCol: String,
                   stateDir: String, prep: DataFrame => DataFrame)
  : DataFrame = {
    val spark = stream.sparkSession
    val nBuckets = spark.conf.getOption("spark.graft.stateBuckets")
      .map(_.toInt).getOrElse(16)
    require(nBuckets > 0, "stateBuckets must be positive")
    def bucketOf = pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))
    val lastBid = new java.util.concurrent.atomic.AtomicLong(-1L)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val inc = IncrementalAgg.aggregate(prep(batch), keys, valueCol)
          .withColumn("__bucket", bucketOf)
        // bounded by nBuckets (a config constant), not by keys — safe
        val touched = inc.select("__bucket").distinct()
          .collect().map(_.getLong(0)).sorted
        val prev = if (bid == 0) Map.empty[Long, String]
          else readManifest(stateDir, bid - 1)
        val prevPaths = touched.flatMap(prev.get).distinct
        if (touched.nonEmpty) {
          // bucket is a pure function of the key, so the union of the
          // touched buckets' rows merges by key and re-derives __bucket
          // on the way out — no bucket column needs to live in the files
          val merged =
            if (prevPaths.isEmpty) inc
            else IncrementalAgg.merge(
              spark.read.parquet(prevPaths.map(p => s"$stateDir/$p"): _*),
              inc.drop("__bucket"), keys).withColumn("__bucket", bucketOf)
          merged.repartition(col("__bucket"))
            .write.partitionBy("__bucket").mode("overwrite")
            .parquet(s"$stateDir/delta_v$bid")
        }
        val manifest = prev ++ touched.map(b =>
          b -> s"delta_v$bid/__bucket=$b")
        writeManifest(stateDir, bid, manifest)
        lastBid.getAndUpdate(m => math.max(m, bid))
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    q.exception.foreach(throw _)
    require(lastBid.get() >= 0, "runFoldDelta: stream produced no batches")
    readStateDelta(spark, stateDir, lastBid.get())
  }

  /** Current state under the delta layout: the union of every bucket's
    * manifest-pointed file set (partition-pruned — only live versions
    * are ever opened).
    */
  def readStateDelta(spark: org.apache.spark.sql.SparkSession,
                     stateDir: String, bid: Long): DataFrame = {
    val paths = readManifest(stateDir, bid).values.toSeq.sorted
      .map(p => s"$stateDir/$p")
    require(paths.nonEmpty, s"empty state manifest at version $bid")
    spark.read.parquet(paths: _*)
  }

  /** bucket -> relative path, one line per bucket, bucket-sorted — the
    * content is a pure function of the fold history, so a replayed
    * batch rewrites it byte-identically.
    */
  private def writeManifest(stateDir: String, bid: Long,
                            m: Map[Long, String]): Unit = {
    val f = new java.io.File(s"$stateDir/manifest_v$bid.json")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.println(m.toSeq.sortBy(_._1)
      .map { case (b, p) => s""""$b":"$p"""" }.mkString("{", ",", "}"))
    finally w.close()
  }

  private def readManifest(stateDir: String, bid: Long): Map[Long, String] = {
    val src = scala.io.Source.fromFile(
      s"$stateDir/manifest_v$bid.json", "UTF-8")
    val txt = try src.mkString.trim finally src.close()
    if (txt == "{}") Map.empty
    else txt.stripPrefix("{").stripSuffix("}").split(",")
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"").toLong ->
          v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
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
