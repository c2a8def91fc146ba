package graft

import graft.streaming.{StreamMatView, StreamSessions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamMatViewDeltaSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def state(df: DataFrame): Map[Long, (Long, Long, Long, Long, Long)] =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap

  private def stage(tag: String, frames: Seq[Seq[(Long, Long)]]): String =
    StreamSessions.stageOrderedFrames(s"mvdelta:$tag") {
      frames.map(_.toDF("k", "v"))
    }

  private def run(dir: String, stateDir: String) =
    StreamMatView.runFoldDelta(
      StreamSessions.readParquetStreamThrottled(spark, dir, schema),
      Seq("k"), "v", stateDir, identity)

  test("delta fold equals the full-snapshot fold and the whole-input agg") {
    val frames = Seq(
      Seq((1L, 10L), (1L, 20L), (2L, 5L)),
      Seq((1L, 30L)),
      Seq((2L, 7L), (3L, 100L)))
    val expect = Map(
      1L -> (3L, 60L, 10L, 30L, 1400L),
      2L -> (2L, 12L, 5L, 7L, 74L),
      3L -> (1L, 100L, 100L, 100L, 10000L))
    val dir = stage("a", frames)
    val sd = java.nio.file.Files.createTempDirectory("mvdelta").toString
    assert(state(run(dir, sd)) === expect)
    val fullDir = java.nio.file.Files.createTempDirectory("mvfull").toString
    val full = StreamMatView.runFold(
      StreamSessions.readParquetStreamThrottled(spark, dir, schema),
      Seq("k"), "v", fullDir, identity)
    assert(state(full) === expect)
  }

  test("a batch rewrites only the buckets its keys hash into") {
    // with many buckets, single-key batches almost surely land in
    // distinct buckets; assert structurally from the manifests: the
    // batch-1 delta holds ONLY key 9's bucket, and every other bucket's
    // pointer still references delta_v0
    spark.conf.set("spark.graft.stateBuckets", "64")
    try {
      val dir = stage("b", Seq(
        Seq((1L, 10L), (2L, 5L), (3L, 1L), (4L, 2L), (5L, 3L)),
        Seq((9L, 70L))))
      val sd = java.nio.file.Files.createTempDirectory("mvdelta2").toString
      run(dir, sd)
      val v1 = new java.io.File(s"$sd/delta_v1").listFiles()
        .filter(_.getName.startsWith("__bucket=")).map(_.getName).toSeq
      assert(v1.size === 1, s"batch 1 (one key) rewrote buckets: $v1")
      val m1 = scala.io.Source.fromFile(s"$sd/manifest_v1.json").mkString
      val v0Refs = "delta_v0".r.findAllIn(m1).size
      assert(v0Refs >= 4,
        s"untouched buckets must still point at delta_v0: $m1")
    } finally spark.conf.unset("spark.graft.stateBuckets")
  }

  test("a full replay over the same state dir lands on identical state") {
    val frames = Seq(Seq((1L, 4L), (7L, 9L)), Seq((7L, 1L), (8L, 2L)))
    val dir = stage("c", frames)
    val sd = java.nio.file.Files.createTempDirectory("mvdelta3").toString
    val first = state(run(dir, sd))
    val again = state(run(dir, sd))
    assert(first === again)
    assert(first === Map(
      1L -> (1L, 4L, 4L, 4L, 16L),
      7L -> (2L, 10L, 1L, 9L, 82L),
      8L -> (1L, 2L, 2L, 2L, 4L)))
  }

  test("an empty-after-prep batch carries the manifest forward unchanged") {
    val dir = StreamSessions.stageOrderedFrames("mvdelta:d") {
      Seq(Seq((1L, 10L)).toDF("k", "v"), Seq((2L, -1L)).toDF("k", "v"))
    }
    val sd = java.nio.file.Files.createTempDirectory("mvdelta4").toString
    val fin = StreamMatView.runFoldDelta(
      StreamSessions.readParquetStreamThrottled(spark, dir, schema),
      Seq("k"), "v", sd, prep = _.filter(col("v") > 0))
    assert(state(fin) === Map(1L -> (1L, 10L, 10L, 10L, 100L)))
    val m0 = scala.io.Source.fromFile(s"$sd/manifest_v0.json").mkString.trim
    val m1 = scala.io.Source.fromFile(s"$sd/manifest_v1.json").mkString.trim
    assert(m0 === m1)
    assert(!new java.io.File(s"$sd/delta_v1").exists())
  }
}
