package graft

import graft.operators.StopDetect
import graft.streaming.StreamingStopDetect
import graft.streaming.StreamingStopDetect.Ping
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Durability contract the AvailableNow gates bypass: a stateful
  * streaming query (the stop automaton — custom flatMapGroupsWithState
  * state) writing to a real file sink with `checkpointLocation`, stopped
  * after one trigger cycle and RESTARTED on new input. The checkpoint
  * must (a) restore the per-user automaton state — the fixture splits
  * INSIDE an open stationary run, so the post-restart rows only get the
  * pre-restart run id if state actually came back — and (b) replay
  * exactly once: the first file's rows must not re-emit on restart.
  */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val p = StopDetect.Params(50.0, 2L, 600L, 3600L, "haversine")

  // user u: one stationary run that STRADDLES the file boundary (state
  // restore is load-bearing), then a jump; user v: dwell entirely in
  // file 1 whose closure arrives in file 2.
  private val part1 = Seq(
    Ping("u", 19.0000, -99.0, 0L),
    Ping("u", 19.0001, -99.0, 400L),
    Ping("u", 19.0002, -99.0, 800L),
    Ping("v", 20.0000, -98.0, 100L),
    Ping("v", 20.0001, -98.0, 500L))
  private val part2 = Seq(
    Ping("u", 19.0003, -99.0, 1200L), // run 1 continues across restart
    Ping("u", 19.0004, -99.0, 1600L),
    Ping("u", 19.1000, -99.0, 2000L), // breaks run 1
    Ping("v", 20.0002, -98.0, 900L),
    Ping("v", 20.1000, -98.0, 1300L)) // breaks v's run
  private val maxTs = 2000L
  private def sentinels = Seq("u", "v").map(uid =>
    Ping(uid, 0.0, 0.0, maxTs + p.maxStayingTime + 1L))

  private val schema = StructType(Seq(
    StructField("uid", StringType), StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timestamp", LongType)))

  private def addFile(src: java.nio.file.Path, idx: Int,
                      pings: Seq[Ping]): Unit = {
    val scratch = java.nio.file.Files.createTempDirectory("graft-rec-scr-")
    pings.toDF().coalesce(1).write.mode("overwrite")
      .parquet(scratch.toString)
    val part = scratch.toFile.listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, src.resolve(f"f$idx%02d.parquet"))
  }

  test("stop automaton restores from checkpoint and replays exactly once") {
    val base = java.nio.file.Files.createTempDirectory("graft-recovery-")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString

    def runOnce(): Unit = {
      val raw = spark.readStream.schema(schema)
        .parquet(src.toString).as[Ping]
      val q = StreamingStopDetect.stopEvents(raw, p)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    addFile(src, 0, part1)
    runOnce()
    val afterRun1 = spark.read.parquet(out).count()
    // file 1 alone emits NOTHING: both users' runs are still open (rows
    // classify when their run closes), so everything is in state — the
    // restart below carries the entire answer in the checkpoint
    assert(afterRun1 === 0L)

    addFile(src, 1, part2 ++ sentinels)
    runOnce() // NEW query instance, SAME checkpoint: state must restore

    val streamed = spark.read.parquet(out)
      .select("uid", "timestamp", "stop_events", "latitude", "longitude")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    // exactly-once: no (uid, ts) appears twice across the two runs
    assert(streamed.map(t => (t._1, t._2)).distinct.size === streamed.size)

    val batch = StopDetect.stopEvents(
      (part1 ++ part2).toDF("uid", "latitude", "longitude", "timestamp"), p)
      .select("uid", "timestamp", "stop_events")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    // sentinel-flushed streaming output = the batch segmentation, run ids
    // included — u's run id continuity across the restart proves the
    // automaton state came back from the checkpoint
    assert(streamed === batch)
  }

  test("stream-stream interval join restores join state from checkpoint " +
    "and replays exactly once") {
    // the load-bearing pair STRADDLES the restart: purchase p2 arrives
    // before the stop, its matching view v2 after — the match can only
    // emit if the right side's join state came back from the checkpoint
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-recovery2-")
    val vSrc = base.resolve("v"); java.nio.file.Files.createDirectories(vSrc)
    val pSrc = base.resolve("p"); java.nio.file.Files.createDirectories(pSrc)
    val ckpt = base.resolve("ckpt").toString
    val out = base.resolve("out").toString

    def vdf(rows: Seq[(Long, Long, Long)]) = rows.toDF("user_id", "event_id", "sec")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("sec")).as("ts"))
    def pdf(rows: Seq[(Long, Long, Long)]) = rows.toDF("user_id", "purchase_id", "sec")
      .select(col("user_id"), col("purchase_id"),
        timestamp_seconds(col("sec")).as("pts"))
    def addParquet(dir: java.nio.file.Path, idx: Int,
                   df: org.apache.spark.sql.DataFrame): Unit = {
      val scratch = java.nio.file.Files.createTempDirectory("graft-rec2-scr-")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = scratch.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, dir.resolve(f"f$idx%02d.parquet"))
    }

    val vSchema = vdf(Seq((1L, 1L, 1L))).schema
    val pSchema = pdf(Seq((1L, 1L, 1L))).schema
    def runOnce(): Unit = {
      val v = spark.readStream.schema(vSchema).parquet(vSrc.toString)
      val p = spark.readStream.schema(pSchema).parquet(pSrc.toString)
      val q = graft.streaming.StreamSessions
        .intervalJoin(v, p, "user_id", "ts", "pts", "6 HOURS", "1 day")
        .select(col("user_id"), col("event_id"), col("purchase_id"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // run 1: pair (v1, p1) complete; p2 arrives with no view yet
    addParquet(vSrc, 0, vdf(Seq((1L, 101L, 1500L))))
    addParquet(pSrc, 0, pdf(Seq((1L, 201L, 1000L), (1L, 202L, 2000L))))
    runOnce()
    val run1 = spark.read.parquet(out)
      .select("event_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(run1 === Set((101L, 201L)))

    // run 2 (new query instance, same checkpoint): v2 matches the
    // RESTORED p2 state; (v3, p3) is a fresh same-batch pair
    addParquet(vSrc, 1, vdf(Seq((1L, 102L, 3000L), (2L, 103L, 3600L))))
    addParquet(pSrc, 1, pdf(Seq((2L, 203L, 3500L))))
    runOnce()
    val all = spark.read.parquet(out)
      .select("event_id", "purchase_id").as[(Long, Long)].collect().toSeq
    // exactly once: run 1's pair did not re-emit
    assert(all.size === all.distinct.size)
    // v2 matches BOTH p1 (2000 s back) and p2 (1000 s back) — both within
    // the 6 h lookback and only available via restored state
    assert(all.toSet === Set((101L, 201L), (102L, 201L), (102L, 202L),
      (103L, 203L)))
  }
}
