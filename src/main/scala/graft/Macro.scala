package graft

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end curation macro-run (dev main) — the q78 pipeline at sf1+
  * scale with per-stage timings and row counts, the way a production
  * curation job actually ships: each stage boundary PERSISTED to
  * parquet, so every stage's cost is measured against real input IO and
  * the record shows where a 100 TB run's wall clock would go.
  *
  * This answers a question the per-query smokes can't: q78 benches the
  * FUSED pipeline (Catalyst sees all four stages at once), but at
  * production scale stages are separate jobs with a durable boundary
  * between them — different IO profile, no cross-stage fusion. The
  * macro-run records both shapes over the SAME fixture:
  * stage-materialized total vs fused single-plan wall. Timing fairness:
  * each stage's `sec` covers the write AND the read-back count (both
  * sides of the boundary's IO), and the fixture is warmed with one full
  * read before the staged run so the fused pass (which runs second)
  * holds no page-cache advantage.
  *
  * The durable boundary's PAYOFF is measured, not asserted: after the
  * full staged run, the harness simulates a crash after stage 2 (the
  * decontam/select outputs are deleted, quality/dedup kept) and
  * restarts. A completed stage carries a `_GRAFT_DONE` marker (written
  * AFTER the parquet commit and its count — the stage's commit point);
  * the restart skips marked stages by reading their parquet back,
  * recomputes only the missing tail, and the record pins per-stage
  * skipped/recomputed plus a final-output content hash
  * (order-independent xor — [[Bench.force]]) that must equal the
  * uninterrupted run's.
  *
  * Stages (q78's exact semantics — the oracle-checked composition):
  *  1 quality    token-count band + langId agreement filter
  *  2 dedup      normalized exact dedup, first-doc-wins
  *  3 decontam   5-gram overlap vs the doc_id%41 benchmark slice, anti
  *  4 select     BPE token count + hash-ordered token-budget selection
  *
  * Output: MACRO_sf{N}.json with per-stage {sec, rows_out}, the
  * stage-sum, the fused q78 wall at the same fixture dir, and the
  * `restart` section.
  */
object Macro {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE coalescing floor (see Bench.scala): keeps CPU-dense tiny
      // shuffles parallel at gate scale; inert at production sizes
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "128k")
      // cached-plan AQE re-partitioning (see Bench.scala)
      .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val nCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    ScaleSmoke.ensureFixture(spark, src, dst, nCopies)
    val work = sys.env.getOrElse("SPARK_GRAFT_MACRO_DIR", "/tmp/graft_macro")

    // per-stage record for the CURRENT pipeline pass: name ->
    // (sec, rows_out, skipped)
    val stages = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Long, Boolean)]
    // markers ride the Hadoop FileSystem resolved from the work dir —
    // java.io would silently never-skip (and write bogus local files)
    // under an hdfs:/s3a: SPARK_GRAFT_MACRO_DIR, which is exactly where
    // a durable-boundary pipeline puts its stage outputs
    val hconf = spark.sessionState.newHadoopConf()
    def marker(path: String) =
      new org.apache.hadoop.fs.Path(s"$path/_GRAFT_DONE")
    def stage(name: String, resume: Boolean)(out: => DataFrame)
    : DataFrame = {
      val path = s"$work/$name"
      val mk = marker(path)
      val mfs = mk.getFileSystem(hconf)
      if (resume && mfs.exists(mk)) {
        val back = spark.read.parquet(path)
        stages(name) = (0.0, back.count(), true)
        System.err.println(s"[macro] $name SKIPPED (marker present)")
        back
      } else {
        // evaluate the upstream chain BEFORE the timer: `out` is
        // by-name (the resume short-circuit needs it), so upstream
        // stage() calls — and their writes — fire here; this stage's
        // own timing must not absorb them or stage secs nest and
        // double-count
        val frame = out
        // write AND read-back count inside the timing: the boundary's
        // cost is both sides of its IO (ADVICE r11 — the count was
        // previously untimed, understating every stage)
        val (rows, sec) = timed {
          frame.write.mode("overwrite").parquet(path)
          spark.read.parquet(path).count()
        }
        // marker AFTER the commit + count: a crash anywhere above
        // leaves no marker and the stage recomputes on restart
        mfs.create(mk, true).close()
        stages(name) = (sec, rows, false)
        System.err.println(f"[macro] $name $sec%.1f s, $rows rows")
        spark.read.parquet(path)
      }
    }

    // q78's quality gate checks langId(text) === lang; on the fixture
    // the per-token copy salt (required to keep gram spaces disjoint
    // for the dedup/decontam stages) shifts the char-gram profile, so
    // the language check must run on the DE-salted text or every
    // non-zero copy fails stage 1 and the downstream stages silently
    // shrink back to sf0.1 volume (observed: 1509 rows instead of
    // ~15k). Production text carries no salt; stripping "~c<n>"
    // reconstructs copy 0's text exactly.
    def quality(df: DataFrame): DataFrame = df.filter(
      TextFunctions.tokenCount(col("text")).between(20, 1000) &&
        TextFunctions.langId(
          regexp_replace(col("text"), "~c\\d+", "")) === col("lang"))
    def dedup(df: DataFrame): DataFrame =
      df.join(Dedup.normalizedExactDups(df, "doc_id", "text")
        .select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    def decontam(df: DataFrame): DataFrame =
      df.join(graft.operators.Decontaminate.overlap(
        df, "doc_id", "text",
        Tables.documents(spark, dst).filter(col("doc_id") % 41 === 0),
        "text", n = 5, minOverlap = 1)
        .filter(col("contaminated") === 1L)
        .select("doc_id"), Seq("doc_id"), "left_anti")
    // budget scales with the fixture so the selection's sort/cumsum
    // passes see fixture-sized input, same as q78's shape at sf0.1
    def select_(df: DataFrame): DataFrame =
      graft.operators.Sampling.tokenBudgetSelect(
        df.select(col("doc_id"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe")),
        "doc_id", col("n_bpe"), budget = 8000L * nCopies, seed = "cur")
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))

    val docs = Tables.documents(spark, dst)
    def pipeline(resume: Boolean): DataFrame =
      stage("select", resume)(
        select_(stage("decontam", resume)(
          decontam(stage("dedup", resume)(
            dedup(stage("quality", resume)(quality(docs))))))))

    // page-cache leveller: one full fixture read BEFORE the staged run,
    // so staged (first) and fused (second) both see a warm fixture
    Bench.force(docs)

    val selected = pipeline(resume = false)
    val fullHash = Bench.force(selected)
    val fullStages = stages.toSeq

    // crash simulation: stages 3-4 lost, 1-2 survive with markers — the
    // restart must skip 1-2 (no recompute) and land on the same output
    for (lost <- Seq("decontam", "select")) {
      val p = new org.apache.hadoop.fs.Path(s"$work/$lost")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(p, true): Unit
    }
    stages.clear()
    val (restarted, restartSec) = timed { pipeline(resume = true) }
    val restartHash = Bench.force(restarted)
    val restartStages = stages.toSeq

    // the fused single-plan form: the SAME four stages chained with no
    // stage boundary, so Catalyst plans them as one query — the
    // stage-materialization overhead is the difference. Like q78, the
    // quality frame is persisted: it feeds four plan branches (dedup
    // agg, semi-join left side, decontam grams, token counting) and
    // Spark does not share common subplans across joins
    CacheScope.releaseAll()
    val (_, fusedSec) = timed {
      val q = CacheScope.track(quality(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      Bench.force(select_(decontam(dedup(q))))
    }

    val stageSum = fullStages.map(_._2._1).sum
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val stageJson = fullStages.map { case (n, (s, r, _)) =>
      s""""$n":{"sec":${f3(s)},"rows_out":$r}"""
    }.mkString("{", ",", "}")
    // stages absent from the restart record were never even CONSULTED:
    // stage() takes its upstream by-name, so a marker hit short-circuits
    // the whole chain above it (quality is subsumed by dedup's marker)
    val restartByName = restartStages.toMap
    val restartJson = fullStages.map { case (n, (_, fullRows, _)) =>
      restartByName.get(n) match {
        case Some((s, r, skipped)) =>
          s""""$n":{"sec":${f3(s)},"rows_out":$r,""" +
            s""""action":"${if (skipped) "skipped" else "recomputed"}"}"""
        case None =>
          s""""$n":{"sec":0.000,"rows_out":$fullRows,""" +
            s""""action":"subsumed_by_downstream_marker"}"""
      }
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"macro_curation","copies":$nCopies,"stages":$stageJson,""" +
        s""""stage_total_sec":${f3(stageSum)},"fused_sec":${f3(fusedSec)},""" +
        s""""timing":"stage sec = write + read-back count; fixture warmed before staged run",""" +
        s""""restart":{"killed_after":"dedup","stages":$restartJson,""" +
        s""""restart_total_sec":${f3(restartSec)},""" +
        s""""final_hash":$fullHash,"restart_hash":$restartHash,""" +
        s""""hash_match":${fullHash == restartHash}},""" +
        s""""src":"$src"}"""
    println(json)
    val out = new java.io.PrintWriter(
      new java.io.File(sys.env.getOrElse("SPARK_GRAFT_MACRO_OUT",
        s"MACRO_sf$nCopies.json")), "UTF-8")
    try out.println(json) finally out.close()
    spark.stop()
  }
}
