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
}
