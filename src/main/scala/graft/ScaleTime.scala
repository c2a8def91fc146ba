package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time-EXTENDED streaming scale smoke (dev main) — the bounded-state
  * proof [[ScaleSmoke]]'s densified fixture cannot give.
  *
  * ScaleSmoke grows volume by stacking user-shifted copies into the SAME
  * event-time span, so per-window density grows xN and every watermark
  * state peak honestly scales xN with input — that proves EVICTION
  * works, not that state is bounded. The 100 TB claim is "state ≈
  * window, independent of history length": only a fixture with the SAME
  * density over an xN-LONGER horizon can show a flat state peak. This
  * main builds that fixture (events only: ts shifted by a whole-day-
  * aligned span stride per copy, SAME user population, event_id shifted
  * by a multiple of 70 so the %5/%7 ping jitter is copy-invariant) and
  * replays the watermark-gated stream queries (q97/q110/q151) at both
  * shapes with per-batch event-time width HELD CONSTANT: 16 chunks /
  * 8 stop-files on sf0.1, 16·N / 8·N on the xN horizon. Acceptance:
  * `state_peak_time` within ~2x of `state_peak_src` while input grows
  * xN.
  *
  * q143/q203 are excluded by design: their staging slices on fixed
  * calendar days, so an extended horizon collapses into one giant final
  * batch — a harness artifact, not a state measurement (their state is
  * key-cardinality-bounded, which the densified smoke already covers).
  */
object ScaleTime {

  private val targets =
    Seq("q97_stream_stops_unordered", "q110_stream_join",
      "q151_stream_outer_join")

  /** Build `dst/events.parquet`: nCopies copies of src events tiling the
    * TIME axis at constant density. Marker-guarded like ScaleSmoke.
    */
  private def buildTimeExtended(spark: SparkSession, src: String,
                                dst: String, nCopies: Int): Unit = {
    val fs = new java.io.File(dst)
    if (new java.io.File(s"$dst/_OK_time_v1_$nCopies").exists()) return
    fs.mkdirs()
    Option(fs.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_OK_"))
      .foreach(_.delete())
    val events = Tables.events(spark, src) // ts normalized to ns Long
    val mm = events.agg(min("ts"), max("ts")).collect()(0)
    val dayNs = 86400L * 1000000000L
    // whole-day-aligned stride >= span+1: copies tile contiguously (no
    // overlap, no gap beyond day rounding), keeping density constant
    val stride = ((mm.getLong(1) - mm.getLong(0)) / dayNs + 1L) * dayNs
    val copies = spark.range(0, nCopies).select(col("id").as("copy"))
    events.crossJoin(copies)
      .select(
        // multiple of 70 keeps event_id % 5 / % 7 (ping jitter inputs)
        // copy-invariant — every copy replays the same trajectories,
        // just later in time
        (col("event_id") + col("copy") * lit(1000300L)).as("event_id"),
        (col("ts") + col("copy") * lit(stride)).as("ts"),
        col("user_id"), // SAME users: density per unit time is constant
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    new java.io.File(s"$dst/_OK_time_v1_$nCopies").createNewFile(): Unit
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // streaming replay cost is per-batch per-state-partition commits;
      // at 16·N batches the default 32 state partitions would dominate
      // wall clock without touching the measured peaks (peaks are row
      // counts summed over partitions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_TIME_SHUFFLE", "8"))
      // metrics ride StreamingQuery.recentProgress, which retains only
      // the last 100 updates by default — a 16·N-batch replay would
      // silently truncate input_rows (and clip the peak window) past
      // N ≈ 6; keep every batch's progress visible to the harness
      .config("spark.sql.streaming.numRecentProgressUpdates", "4000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_TIME_DIR", "/tmp/graft_time")
    val nCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(f => targets.filter(t => f.split(",").exists(t.startsWith)))
      .getOrElse(targets)
    buildTimeExtended(spark, src, dst, nCopies)

    spark.conf.set("spark.graft.streamSinkNoop", "true")
    val stats = scala.collection.mutable.Map
      .empty[(String, String), graft.streaming.StreamSessions.StreamRunMetrics]
    val wall = scala.collection.mutable.Map.empty[(String, String), Double]
    def run(name: String, dir: String, chunkMult: Int): Unit = {
      CacheScope.releaseAll()
      graft.streaming.StreamSessions.lastRunMetrics.clear()
      spark.conf.set("spark.graft.streamChunks", (16 * chunkMult).toString)
      spark.conf.set("spark.graft.streamFiles", (8 * chunkMult).toString)
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(name)(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      wall((name, dir)) = dt
      graft.streaming.StreamSessions.lastRunMetrics.headOption
        .foreach { case (_, m) => stats((name, dir)) = m }
      val m = stats.get((name, dir))
      System.err.println(
        f"[scale-time] $name ${dir.split('/').last} $dt%.1f s " +
          s"peak=${m.map(_.statePeakRows).getOrElse(-1L)} " +
          s"rows=${m.map(_.inputRows).getOrElse(-1L)} " +
          s"batches=${m.map(_.batches).getOrElse(-1L)}")
    }
    for (n <- only) { run(n, src, 1); run(n, dst, nCopies) }

    val parts = only.map { n =>
      val (a, b) = (stats((n, src)), stats((n, dst)))
      s""""$n":{"wall_src":${wall((n, src))},"wall_time":${wall((n, dst))}""" +
        s""","state_peak_src":${a.statePeakRows},"state_peak_time":${b.statePeakRows}""" +
        s""","input_rows_src":${a.inputRows},"input_rows_time":${b.inputRows}""" +
        s""","batches_src":${a.batches},"batches_time":${b.batches}""" +
        s""","peak_ratio":${b.statePeakRows.toDouble / math.max(1L, a.statePeakRows)}}"""
    }
    val json = parts.mkString(
      s"""{"metric":"scale_time_extended","copies":$nCopies,""" +
        s""""fixture":"constant_density_extended_horizon","queries":{""",
      ",", "}}")
    println(json)
    val out = new java.io.PrintWriter(
      new java.io.File(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
        "SCALE_time.json")), "UTF-8")
    try out.println(json) finally out.close()
    spark.stop()
  }
}
