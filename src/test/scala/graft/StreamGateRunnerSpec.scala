package graft

import java.nio.file.{Files, Paths}
import graft.streaming.StreamSessions
import org.apache.spark.sql.functions._

/** End-to-end coverage for the complete-mode AvailableNow runner (the q89
  * gate path) and the single-file staging helper — the two pieces that
  * shipped uncovered in round 6 and broke in the bench.
  */
class StreamGateRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String): Unit =
    Seq(
      // user a: two sessions split by a > 30 min gap
      ("a", 0L), ("a", 600L), ("a", 1200L),
      ("a", 1200L + 1801L), // gap 1801 s > 1800 -> new session
      // user b: one session
      ("b", 100L), ("b", 200L))
      .toDF("user_id", "tsec")
      .select(col("user_id"), timestamp_seconds(col("tsec")).as("ts"))
      // one part-file: the staging test symlinks a SINGLE file, the
      // fixture-table shape (driver tables are one file per table)
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)

  private def sessionize(dir: String) = {
    val schema = spark.read.parquet(dir).schema
    StreamSessions.readParquetStream(spark, dir, schema)
      .groupBy(col("user_id"),
        session_window(col("ts"), "1800 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("s_start"),
        col("n_events"))
  }

  test("runToCompletion returns the full final aggregate and drops its view") {
    val dir = Files.createTempDirectory("graft_ss").toString
    writeEvents(dir)
    val before = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_ss_run")).count()
    val out = StreamSessions.runToCompletion(sessionize(dir), "graft_ss_run")
    val got = out.collect()
      .map(r => (r.getAs[String]("user_id"), r.getAs[Long]("s_start"),
        r.getAs[Long]("n_events"))).toSet
    // complete mode: EVERY session present, including the final one the
    // watermark never passes (the append-mode withheld tail)
    assert(got === Set(("a", 0L, 3L), ("a", 3001L, 1L), ("b", 100L, 2L)))
    // the memory-sink temp view must not leak across invocations
    val after = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_ss_run")).count()
    assert(after === before)
  }

  test("runToCompletion is repeatable within one session (bench passes)") {
    val dir = Files.createTempDirectory("graft_ss2").toString
    writeEvents(dir)
    val a = StreamSessions.runToCompletion(sessionize(dir), "graft_ss2").count()
    val b = StreamSessions.runToCompletion(sessionize(dir), "graft_ss2").count()
    assert(a === 3L && b === 3L)
  }

  test("runToCompletionAppend: stateful dedup emits each key once") {
    val dir = Files.createTempDirectory("graft_ss4").toString
    writeEvents(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = StreamSessions.readParquetStream(spark, dir, schema)
    val out = StreamSessions.runToCompletionAppend(
      StreamSessions.dedupStream(
        stream.select(col("user_id"), col("ts")), "user_id", "1 hour")
        .select("user_id"),
      "graft_ss4")
    assert(out.collect().map(_.getString(0)).sorted.toSeq === Seq("a", "b"))
  }

  test("stageFrameAsDir: derived frame staged once as a one-file dir") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val dir = StreamSessions.stageFrameAsDir("spec-frame")(df)
    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(parts.length === 1, "must stage exactly one part file")
    assert(spark.read.parquet(dir).count() === 2L)
    // memoized: the thunk must not re-run (a second write would churn
    // mtimes and could split a later AvailableNow run)
    assert(StreamSessions.stageFrameAsDir("spec-frame")(
      sys.error("thunk re-ran")) === dir)
  }

  test("sentinel flush: streaming stop detect equals batch on finite input") {
    // the q93 pattern in miniature: one user, a valid 3-ping dwell then a
    // jump; the sentinel classifies the tail exactly as batch's NULL
    // forward gap does
    val p = graft.operators.StopDetect.Params()
    val pings = Seq(
      ("u", 19.0, -99.0, 0L), ("u", 19.0, -99.0, 300L),
      ("u", 19.00001, -99.0, 600L),
      ("u", 19.5, -99.5, 900L))
      .toDF("uid", "latitude", "longitude", "timestamp")
    val batch = graft.operators.StopDetect.stopEvents(pings, p)
      .collect().map(r => (r.getString(0), r.getLong(4), r.getLong(1))).toSet
    val maxTs = 900L
    val withSentinel = pings.union(
      Seq(("u", 0.0, 0.0, maxTs + p.maxStayingTime + 1L))
        .toDF("uid", "latitude", "longitude", "timestamp"))
    val dir = StreamSessions.stageFrameAsDir("spec-sentinel")(withSentinel)
    val raw = StreamSessions.readParquetStream(spark, dir,
      withSentinel.schema)
      .as[graft.streaming.StreamingStopDetect.Ping]
    val got = StreamSessions.runToCompletionAppend(
      graft.streaming.StreamingStopDetect.stopEvents(raw, p),
      "spec_sentinel")
      .collect()
      .map(r => (r.getString(0), r.getLong(4), r.getLong(1))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("stageFileAsDir makes a single parquet FILE streamable") {
    // the r6 bench failure: FileStreamSource rejects a file path
    // ("Option 'basePath' must be a directory") that batch read accepts
    val dir = Files.createTempDirectory("graft_ss3").toString
    writeEvents(dir)
    val file = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val staged = StreamSessions.stageFileAsDir(file)
    assert(staged !== file)
    assert(Files.isDirectory(Paths.get(staged)))
    // memoized: same staging dir on repeat calls (bench passes reuse it)
    assert(StreamSessions.stageFileAsDir(file) === staged)
    val out = StreamSessions.runToCompletion(
      sessionize(staged), "graft_ss3")
    assert(out.count() === 3L)
    // a directory input passes through untouched
    assert(StreamSessions.stageFileAsDir(dir) === dir)
  }

  test("intervalJoin: stream-stream range join equals the batch join") {
    // left u: events at 0/200/400; right u: 150/390/400/410.
    // lookback 100 s => 200 matches 150; 400 matches 390 AND the
    // exactly-simultaneous 400; 410 is in the future, 0 matches nothing;
    // user w has no right rows at all.
    val lDir = StreamSessions.stageFrameAsDir("spec-ij-left") {
      Seq(("u", 1L, 0L), ("u", 2L, 200L), ("u", 3L, 400L),
        ("w", 4L, 200L))
        .toDF("user_id", "lid", "tsec")
        .select(col("user_id"), col("lid"),
          timestamp_seconds(col("tsec")).as("ts"))
    }
    val rDir = StreamSessions.stageFrameAsDir("spec-ij-right") {
      Seq(("u", 10L, 150L), ("u", 11L, 390L), ("u", 12L, 400L),
        ("u", 13L, 410L))
        .toDF("user_id", "rid", "rsec")
        .select(col("user_id"), col("rid"),
          timestamp_seconds(col("rsec")).as("rts"))
    }
    val l = StreamSessions.readParquetStream(spark, lDir,
      spark.read.parquet(lDir).schema)
    val r = StreamSessions.readParquetStream(spark, rDir,
      spark.read.parquet(rDir).schema)
    val got = StreamSessions.runToCompletionAppend(
      StreamSessions.intervalJoin(l, r, "user_id", "ts", "rts",
        "100 SECONDS", "1 hour")
        .select("lid", "rid"),
      "spec_ij")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((2L, 10L), (3L, 11L), (3L, 12L)))
  }

  test("slidingCounts: each event lands in exactly width/slide windows") {
    val dir = StreamSessions.stageFrameAsDir("spec-slide") {
      // t=30 -> windows [-60,60) and [0,120); t=70 -> [0,120)/[60,180);
      // t=100 -> same pair as 70; values sum per window copy
      Seq(("a", 30L, 1L), ("a", 70L, 2L), ("a", 100L, 4L))
        .toDF("user_id", "tsec", "value")
        .select(col("user_id"), timestamp_seconds(col("tsec")).as("ts"),
          col("value"))
    }
    val ev = StreamSessions.readParquetStream(spark, dir,
      spark.read.parquet(dir).schema)
    val got = StreamSessions.runToCompletion(
      StreamSessions.slidingCounts(
        ev, "120 seconds", "60 seconds", "1 hour")
        .select(col("user_id"),
          unix_timestamp(col("w_start")).as("ws"),
          col("n_events"), col("sum_value").cast("long").as("sv")),
      "spec_slide")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set(
      ("a", -60L, 1L, 1L), ("a", 0L, 3L, 7L), ("a", 60L, 2L, 6L)))
  }
}
