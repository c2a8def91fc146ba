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

  private def manifest(stateDir: String, bid: Long): String =
    scala.io.Source.fromFile(
      s"$stateDir/manifest_v$bid.tsv", "UTF-8").mkString

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
      val m1 = manifest(sd, 1)
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
    assert(manifest(sd, 0).trim === manifest(sd, 1).trim)
    assert(!new java.io.File(s"$sd/delta_v1").exists())
  }

  test("an empty FIRST batch must not kill the stream (commit-point dirs)") {
    // the regression: writeManifest on batch 0 with no prior parquet
    // write ran before any directory existed — the manifest write (the
    // commit point) must create its own parents
    val dir = StreamSessions.stageOrderedFrames("mvdelta:e") {
      Seq(Seq((1L, -5L)).toDF("k", "v"), Seq((3L, 8L)).toDF("k", "v"))
    }
    val sd = java.nio.file.Files.createTempDirectory("mvdelta5")
      .resolve("nested/state").toString
    val fin = StreamMatView.runFoldDelta(
      StreamSessions.readParquetStreamThrottled(spark, dir, schema),
      Seq("k"), "v", sd, prep = _.filter(col("v") > 0))
    assert(state(fin) === Map(3L -> (1L, 8L, 8L, 8L, 64L)))
  }

  test("an all-empty stream reads back as a typed empty frame") {
    // same contract as runFold's empty snapshot: schema, zero rows —
    // not an exception
    val dir = StreamSessions.stageOrderedFrames("mvdelta:f") {
      Seq(Seq((1L, -1L)).toDF("k", "v"), Seq((2L, -2L)).toDF("k", "v"))
    }
    val sd = java.nio.file.Files.createTempDirectory("mvdelta6").toString
    val fin = StreamMatView.runFoldDelta(
      StreamSessions.readParquetStreamThrottled(spark, dir, schema),
      Seq("k"), "v", sd, prep = _.filter(col("v") > 0))
    assert(fin.columns.toSeq === Seq("k", "n", "total", "mn", "mx", "sumsq"))
    assert(fin.count() === 0L)
  }

  test("the manifest commit point works through a file: URI (no java.io)") {
    // a production stateDir is s3a://…/hdfs://… — pin that every
    // manifest/GC path resolves a Hadoop FileSystem from the URI
    // instead of assuming a local path
    val frames = Seq(Seq((1L, 2L), (2L, 3L)), Seq((1L, 5L)))
    val dir = stage("g", frames)
    val local = java.nio.file.Files.createTempDirectory("mvdelta7")
    val sd = "file://" + local.toString
    val fin = run(dir, sd)
    assert(state(fin) === Map(
      1L -> (2L, 7L, 2L, 5L, 29L),
      2L -> (1L, 3L, 3L, 3L, 9L)))
    assert(java.nio.file.Files.exists(local.resolve("manifest_v1.tsv")))
  }

  test("bitmap delta fold equals the full-snapshot bitmap fold") {
    val dayFrames = Seq(
      Seq((1L, 0L), (1L, 3L), (2L, 1L)),
      Seq((1L, 3L), (2L, 59L), (3L, 7L)))
    val dir = StreamSessions.stageOrderedFrames("mvdelta:h") {
      dayFrames.map(_.toDF("k", "day"))
    }
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("day", LongType)))
    val sdD = java.nio.file.Files.createTempDirectory("mvbmpD").toString
    val sdF = java.nio.file.Files.createTempDirectory("mvbmpF").toString
    def bmp(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val delta = StreamMatView.runFoldBitmapDelta(
      StreamSessions.readParquetStreamThrottled(spark, dir, sch),
      Seq("k"), "day", sdD, identity)
    val full = StreamMatView.runFoldBitmap(
      StreamSessions.readParquetStreamThrottled(spark, dir, sch),
      Seq("k"), "day", sdF, identity)
    val expect = Map(
      1L -> ((1L << 0) | (1L << 3)),
      2L -> ((1L << 1) | (1L << 59)),
      3L -> (1L << 7))
    assert(bmp(delta) === expect)
    assert(bmp(full) === expect)
  }

  private def writeFrame(dir: java.nio.file.Path, idx: Int,
                         df: DataFrame): Unit = {
    val scratch = java.nio.file.Files.createTempDirectory("mvckpt-scr")
    df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val part = scratch.toFile.listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    val target = dir.resolve(f"f$idx%04d.parquet")
    java.nio.file.Files.move(part.toPath, target)
    target.toFile.setLastModified(1700000000000L + idx * 60000L): Unit
  }

  test("a checkpointed fold resumes from the commit instead of replaying") {
    // the production incremental-refresh shape: the job restarts after
    // new files arrive and folds ONLY them — batchIds and state
    // versions continue, and untouched buckets still point at the
    // PRE-restart delta versions (carry-forward across restarts, not
    // just across batches)
    val src = java.nio.file.Files.createTempDirectory("mvckpt-src")
    writeFrame(src, 0, Seq((1L, 10L), (2L, 5L)).toDF("k", "v"))
    writeFrame(src, 1, Seq((1L, 20L)).toDF("k", "v"))
    val sd = java.nio.file.Files.createTempDirectory("mvckpt-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mvckpt-ck").toString
    spark.conf.set("spark.graft.streamCheckpointDir", ckpt)
    try {
      val s1 = state(run(src.toString, sd))
      assert(s1 === Map(
        1L -> (2L, 30L, 10L, 20L, 500L),
        2L -> (1L, 5L, 5L, 5L, 25L)))
      writeFrame(src, 2, Seq((2L, 7L), (3L, 1L)).toDF("k", "v"))
      val s2 = state(run(src.toString, sd))
      assert(s2 === Map(
        1L -> (2L, 30L, 10L, 20L, 500L),
        2L -> (2L, 12L, 5L, 7L, 74L),
        3L -> (1L, 1L, 1L, 1L, 1L)))
      // bids continued past the restart (no replay of batches 0-1)...
      assert(new java.io.File(s"$sd/manifest_v2.tsv").exists())
      // ...and key 1's bucket (untouched by batch 2) still points at a
      // pre-restart delta version
      val m2 = manifest(sd, 2)
      assert("delta_v[01]".r.findAllIn(m2).nonEmpty,
        s"restart must carry pre-restart buckets forward: $m2")
    } finally spark.conf.unset("spark.graft.streamCheckpointDir")
  }

  test("writeManifest creates its own parents and replaces atomically") {
    // the commit point must not depend on a prior parquet write having
    // created the state dir (an empty-prep batch 0 writes no delta),
    // and a replayed batch's rewrite must be a REPLACE, not
    // delete-then-create
    val sd = java.nio.file.Files.createTempDirectory("mvmanifest")
      .resolve("deep/nested").toString
    val m = Map(3L -> "delta_v0/__bucket=3", 1L -> "delta_v0/__bucket=1")
    StreamMatView.writeManifest(spark, sd, 0L, m)
    assert(StreamMatView.readManifest(spark, sd, 0L) === m)
    val m2 = m + (2L -> "delta_v1/__bucket=2")
    StreamMatView.writeManifest(spark, sd, 0L, m2) // replay-style rewrite
    assert(StreamMatView.readManifest(spark, sd, 0L) === m2)
  }

  test("gcDelta keeps buckets referenced only by manifests AFTER the cut") {
    spark.conf.set("spark.graft.stateBuckets", "4")
    try {
      val frames = Seq(
        Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
          (6L, 1L), (7L, 1L)),
        Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L), (5L, 2L),
          (6L, 2L), (7L, 2L)),
        Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 3L),
          (6L, 3L), (7L, 3L)))
      val dir = stage("j", frames)
      val sd = java.nio.file.Files.createTempDirectory("mvgc2").toString
      val fin = state(run(dir, sd))
      // cut at version 1: liveness must be the UNION of manifests 1 AND
      // 2 — delta_v2 (the CURRENT state, referenced only by
      // manifest_v2) must survive, only delta_v0 goes
      val (buckets, manifests) = StreamMatView.gcDelta(spark, sd, 1L)
      assert(buckets === 4, "exactly version 0's four buckets")
      assert(manifests === 1)
      assert(!new java.io.File(s"$sd/delta_v0").exists())
      assert(new java.io.File(s"$sd/delta_v2").exists())
      assert(state(StreamMatView.readStateDelta(spark, sd, 2L)) === fin)
      assert(StreamMatView.readStateDelta(spark, sd, 1L).count() === 8L)
    } finally spark.conf.unset("spark.graft.stateBuckets")
  }

  test("a checkpointed restart with NO new files returns committed state") {
    val src = java.nio.file.Files.createTempDirectory("mvnoop-src")
    writeFrame(src, 0, Seq((1L, 10L), (2L, 5L)).toDF("k", "v"))
    val sd = java.nio.file.Files.createTempDirectory("mvnoop-st").toString
    val ckpt = java.nio.file.Files.createTempDirectory("mvnoop-ck").toString
    spark.conf.set("spark.graft.streamCheckpointDir", ckpt)
    try {
      val s1 = state(run(src.toString, sd))
      // the daily no-op refresh: zero new files must be a clean no-op
      // returning the committed state, not a crash
      val s2 = state(run(src.toString, sd))
      assert(s2 === s1)
      // snapshot-loop twin of the same contract
      val sdFull = java.nio.file.Files
        .createTempDirectory("mvnoop-full").toString
      def runFull() = StreamMatView.runFold(
        StreamSessions.readParquetStreamThrottled(spark, src.toString,
          schema), Seq("k"), "v", sdFull, identity)
      val f1 = state(runFull())
      assert(state(runFull()) === f1)
    } finally spark.conf.unset("spark.graft.streamCheckpointDir")
  }

  test("a checkpointed fold never adopts another lineage's leftovers") {
    // foreign run (no checkpoint) leaves state_v0 AND state_v1 in the
    // dir; a NEW checkpointed lineage folds one batch (overwriting
    // state_v0) and then restarts with no new files — the fallback must
    // return THIS lineage's committed version from the checkpoint's
    // commits log, never the foreign listing-max state_v1
    val sd = java.nio.file.Files.createTempDirectory("mvlin-st").toString
    val srcA = java.nio.file.Files.createTempDirectory("mvlin-a")
    writeFrame(srcA, 0, Seq((1L, 1L)).toDF("k", "v"))
    writeFrame(srcA, 1, Seq((1L, 2L)).toDF("k", "v"))
    StreamMatView.runFold(
      StreamSessions.readParquetStreamThrottled(spark, srcA.toString,
        schema), Seq("k"), "v", sd, identity) // foreign: v0 and v1
    val ckpt = java.nio.file.Files.createTempDirectory("mvlin-ck").toString
    spark.conf.set("spark.graft.streamCheckpointDir", ckpt)
    try {
      val srcB = java.nio.file.Files.createTempDirectory("mvlin-b")
      writeFrame(srcB, 0, Seq((9L, 7L)).toDF("k", "v"))
      def runB() = StreamMatView.runFold(
        StreamSessions.readParquetStreamThrottled(spark, srcB.toString,
          schema), Seq("k"), "v", sd, identity)
      val own = state(runB()) // bid 0: overwrites state_v0, commits
      assert(own === Map(9L -> (1L, 7L, 7L, 7L, 49L)))
      assert(state(runB()) === own,
        "no-new-files restart must return this lineage's state, not " +
          "the foreign state_v1")
    } finally spark.conf.unset("spark.graft.streamCheckpointDir")
  }

  test("two folds under ONE checkpoint conf keep separate offset lineages") {
    // the conf names a BASE dir; each fold's offsets are keyed by its
    // state dir — a shared literal location would make fold B inherit
    // fold A's batchId sequence and file log
    val base = java.nio.file.Files.createTempDirectory("mviso-ck").toString
    spark.conf.set("spark.graft.streamCheckpointDir", base)
    try {
      val srcA = java.nio.file.Files.createTempDirectory("mviso-a")
      writeFrame(srcA, 0, Seq((1L, 10L)).toDF("k", "v"))
      val srcB = java.nio.file.Files.createTempDirectory("mviso-b")
      writeFrame(srcB, 0, Seq((2L, 7L)).toDF("k", "v"))
      val sdA = java.nio.file.Files.createTempDirectory("mviso-sa").toString
      val sdB = java.nio.file.Files.createTempDirectory("mviso-sb").toString
      assert(state(run(srcA.toString, sdA)) ===
        Map(1L -> (1L, 10L, 10L, 10L, 100L)))
      assert(state(run(srcB.toString, sdB)) ===
        Map(2L -> (1L, 7L, 7L, 7L, 49L)))
    } finally spark.conf.unset("spark.graft.streamCheckpointDir")
  }

  test("keepHistory overrides a session-wide stateGcOnComplete " +
    "(time-travel folds keep every version)") {
    spark.conf.set("spark.graft.stateGcOnComplete", "true")
    try {
      val frames = Seq(Seq((1L, 1L)), Seq((1L, 2L)), Seq((1L, 3L)))
      // gc-on-complete path: only the final version survives
      val sdGc = java.nio.file.Files.createTempDirectory("mvkh-gc").toString
      run(stage("kh1", frames), sdGc)
      assert(!new java.io.File(s"$sdGc/manifest_v1.tsv").exists(),
        "without keepHistory the conf must collect below-final versions")
      // keepHistory path: version 1 remains time-travel-readable
      val sdKeep = java.nio.file.Files.createTempDirectory("mvkh-k").toString
      StreamMatView.runFoldDelta(
        StreamSessions.readParquetStreamThrottled(
          spark, stage("kh2", frames), schema),
        Seq("k"), "v", sdKeep, identity, keepHistory = true)
      assert(new java.io.File(s"$sdKeep/manifest_v1.tsv").exists())
      assert(state(StreamMatView.readStateDelta(spark, sdKeep, 1L)) ===
        Map(1L -> (2L, 3L, 1L, 2L, 5L)))
    } finally spark.conf.unset("spark.graft.stateGcOnComplete")
  }

  test("read below the GC cut fails loudly, never returns partial state") {
    // the retention contract's fail-loud half: a version below the cut
    // has its manifest deleted (resolve-time error), and a frame
    // RESOLVED before the cut hits FileNotFound at scan time under the
    // default ignoreMissingFiles=false — wrong data is never possible
    val frames = Seq(Seq((1L, 1L)), Seq((1L, 2L)), Seq((1L, 3L)))
    val dir = stage("cut", frames)
    val sd = java.nio.file.Files.createTempDirectory("mvcut").toString
    val fin = state(run(dir, sd))
    val preResolved = StreamMatView.readStateDelta(spark, sd, 0L)
    StreamMatView.gcDelta(spark, sd, 2L)
    // resolve-after-cut: the below-cut manifest is gone
    intercept[Exception] {
      StreamMatView.readStateDelta(spark, sd, 1L).collect()
    }
    // resolved-before-cut: the already-planned read fails at scan time
    val e = intercept[org.apache.spark.SparkException] {
      preResolved.collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        Option(c.getMessage).exists(_.contains("FileNotFound"))),
      s"expected FileNotFound in the cause chain: $e")
    // the cut version itself still reads exactly
    assert(state(StreamMatView.readStateDelta(spark, sd, 2L)) === fin)
  }

  test("gcDelta reclaims superseded buckets; live state is untouched") {
    spark.conf.set("spark.graft.stateBuckets", "4")
    try {
      // every batch touches ALL four buckets → batch 2 supersedes the
      // delta_v0 and delta_v1 copies entirely
      val frames = Seq(
        Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
          (6L, 1L), (7L, 1L)),
        Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L), (5L, 2L),
          (6L, 2L), (7L, 2L)),
        Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 3L),
          (6L, 3L), (7L, 3L)))
      val dir = stage("i", frames)
      val sd = java.nio.file.Files.createTempDirectory("mvgc").toString
      val before = state(run(dir, sd))
      val (buckets, manifests) = StreamMatView.gcDelta(spark, sd, 2L)
      assert(buckets === 8, "two fully-superseded versions x 4 buckets")
      assert(manifests === 2)
      assert(!new java.io.File(s"$sd/delta_v0").exists())
      assert(!new java.io.File(s"$sd/delta_v1").exists())
      assert(state(StreamMatView.readStateDelta(spark, sd, 2L)) === before)
    } finally spark.conf.unset("spark.graft.stateBuckets")
  }

  test("a pin clamps gcDelta's cut; unpin releases the history") {
    spark.conf.set("spark.graft.stateBuckets", "4")
    try {
      val frames = Seq(
        Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)),
        Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L)),
        Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
      val dir = stage("pin", frames)
      val sd = java.nio.file.Files.createTempDirectory("mvpin").toString
      val fin = state(run(dir, sd))
      val v0 = state(StreamMatView.readStateDelta(spark, sd, 0L))
      StreamMatView.pinDeltaVersion(spark, sd, 0L, "audit")
      assert(StreamMatView.pinnedDeltaVersions(spark, sd) ===
        Map("audit" -> 0L))
      // requested cut 2, effective cut 0: nothing is reclaimable
      // (liveness is the union of ALL manifests), and the honest
      // return reports the zero reclaim
      assert(StreamMatView.gcDelta(spark, sd, 2L) === ((0, 0)))
      assert(state(StreamMatView.readStateDelta(spark, sd, 0L)) === v0)
      assert(state(StreamMatView.readStateDelta(spark, sd, 2L)) === fin)
      // unpin -> the same cut now reclaims versions 0 and 1
      assert(StreamMatView.unpinDeltaVersion(spark, sd, "audit"))
      assert(!StreamMatView.unpinDeltaVersion(spark, sd, "audit"),
        "second unpin is an idempotent no-op")
      val (buckets, manifests) = StreamMatView.gcDelta(spark, sd, 2L)
      assert(buckets === 8 && manifests === 2)
      intercept[Exception] {
        StreamMatView.readStateDelta(spark, sd, 0L).collect()
      }
      assert(state(StreamMatView.readStateDelta(spark, sd, 2L)) === fin)
    } finally spark.conf.unset("spark.graft.stateBuckets")
  }

  test("the oldest pin across owners wins; re-pin moves one handle") {
    val frames = Seq(Seq((1L, 1L)), Seq((1L, 2L)), Seq((1L, 3L)))
    val dir = stage("pin2", frames)
    val sd = java.nio.file.Files.createTempDirectory("mvpin2").toString
    state(run(dir, sd))
    StreamMatView.pinDeltaVersion(spark, sd, 0L, "slow-export")
    StreamMatView.pinDeltaVersion(spark, sd, 1L, "audit")
    // oldest pin (0) bounds the cut even though "audit" allows 1
    assert(StreamMatView.gcDelta(spark, sd, 2L) === ((0, 0)))
    assert(new java.io.File(s"$sd/manifest_v0.tsv").exists())
    // re-pin under the same owner REPLACES that owner's handle
    StreamMatView.pinDeltaVersion(spark, sd, 2L, "slow-export")
    assert(StreamMatView.pinnedDeltaVersions(spark, sd) ===
      Map("slow-export" -> 2L, "audit" -> 1L))
    val (_, manifests) = StreamMatView.gcDelta(spark, sd, 2L)
    assert(manifests === 1, "audit's pin at 1 still holds manifest 1")
    assert(!new java.io.File(s"$sd/manifest_v0.tsv").exists())
    assert(new java.io.File(s"$sd/manifest_v1.tsv").exists())
  }

  test("pinning dead history or a bad owner fails loudly") {
    val frames = Seq(Seq((1L, 1L)), Seq((1L, 2L)))
    val dir = stage("pin3", frames)
    val sd = java.nio.file.Files.createTempDirectory("mvpin3").toString
    state(run(dir, sd))
    intercept[IllegalArgumentException] {
      StreamMatView.pinDeltaVersion(spark, sd, 7L, "x") // never existed
    }
    StreamMatView.gcDelta(spark, sd, 1L)
    intercept[IllegalArgumentException] {
      StreamMatView.pinDeltaVersion(spark, sd, 0L, "x") // already GC'd
    }
    intercept[IllegalArgumentException] {
      StreamMatView.pinDeltaVersion(spark, sd, 1L, "no/slashes")
    }
    assert(StreamMatView.pinnedDeltaVersions(spark, sd) === Map.empty,
      "failed pins leave no file behind")
  }

  test("withDeltaPin unpins in a finally block, exception or not") {
    val frames = Seq(Seq((1L, 1L)), Seq((1L, 2L)))
    val dir = stage("pin4", frames)
    val sd = java.nio.file.Files.createTempDirectory("mvpin4").toString
    val fin = state(run(dir, sd))
    val got = StreamMatView.withDeltaPin(spark, sd, 0L, "loan") {
      assert(StreamMatView.pinnedDeltaVersions(spark, sd) ===
        Map("loan" -> 0L))
      state(StreamMatView.readStateDelta(spark, sd, 1L))
    }
    assert(got === fin)
    assert(StreamMatView.pinnedDeltaVersions(spark, sd) === Map.empty)
    intercept[RuntimeException] {
      StreamMatView.withDeltaPin(spark, sd, 0L, "loan") {
        throw new RuntimeException("reader died")
      }
    }
    assert(StreamMatView.pinnedDeltaVersions(spark, sd) === Map.empty,
      "pin released even when the loaned read throws")
  }
}
