package graft

import graft.streaming.{StreamMatView, StreamSessions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamMatViewSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def state(df: DataFrame): Map[Long, (Long, Long, Long, Long, Long)] =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap

  private def stage(tag: String): String =
    StreamSessions.stageOrderedFrames(s"mvspec:$tag") {
      Seq(
        Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v"),
        Seq((1L, 30L)).toDF("k", "v"),
        Seq((2L, 7L), (3L, 100L)).toDF("k", "v"))
    }

  test("folded snapshots equal the whole-input aggregate; mid versions " +
    "are prefix states") {
    val dir = stage("a")
    val stateDir = java.nio.file.Files
      .createTempDirectory("mvspec").toString
    val fin = StreamMatView.runFold(
      StreamSessions.readParquetStreamThrottled(spark, dir, schema),
      Seq("k"), "v", stateDir, identity)
    assert(state(fin) === Map(
      1L -> (3L, 60L, 10L, 30L, 1400L),
      2L -> (2L, 12L, 5L, 7L, 74L),
      3L -> (1L, 100L, 100L, 100L, 10000L)))
    // version b is exactly the fold of batches 0..b — the contract that
    // makes the batchId-versioned replay idempotent
    val v1 = state(spark.read.parquet(s"$stateDir/state_v1"))
    assert(v1 === Map(
      1L -> (3L, 60L, 10L, 30L, 1400L), 2L -> (1L, 5L, 5L, 5L, 25L)))
  }

  test("key-hash partitioned state: a multi-file snapshot round-trips") {
    // force the byte-sized file count up: with a ~500-byte target every
    // post-first snapshot (a few KB of parquet) spreads over several
    // key-hash files — the scale path that replaced coalesce(1)
    val dir = stage("c")
    val stateDir = java.nio.file.Files
      .createTempDirectory("mvspec3").toString
    spark.conf.set("spark.graft.stateTargetBytes", "500")
    try {
      val fin = StreamMatView.runFold(
        StreamSessions.readParquetStreamThrottled(spark, dir, schema),
        Seq("k"), "v", stateDir, identity)
      assert(state(fin) === Map(
        1L -> (3L, 60L, 10L, 30L, 1400L),
        2L -> (2L, 12L, 5L, 7L, 74L),
        3L -> (1L, 100L, 100L, 100L, 10000L)))
      val files = new java.io.File(s"$stateDir/state_v2").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files >= 2, s"expected a multi-file snapshot, got $files file")
    } finally spark.conf.unset("spark.graft.stateTargetBytes")
  }

  test("a full replay over the same state dir rewrites identical snapshots") {
    val dir = stage("b")
    val stateDir = java.nio.file.Files
      .createTempDirectory("mvspec2").toString
    def run() = state(StreamMatView.runFold(
      StreamSessions.readParquetStreamThrottled(spark, dir, schema),
      Seq("k"), "v", stateDir, identity))
    val first = run()
    val again = run() // same versions overwritten from the same parents
    assert(first === again)
  }
}
