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
  * stage-materialized total vs fused single-plan wall.
  *
  * Stages (q78's exact semantics — the oracle-checked composition):
  *  1 quality    token-count band + langId agreement filter
  *  2 dedup      normalized exact dedup, first-doc-wins
  *  3 decontam   5-gram overlap vs the doc_id%41 benchmark slice, anti
  *  4 select     BPE token count + hash-ordered token-budget selection
  *
  * Output: MACRO_sf{N}.json with per-stage {sec, rows_out}, the
  * stage-sum, and the fused q78 wall at the same fixture dir.
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val nCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    ScaleSmoke.ensureFixture(spark, src, dst, nCopies)
    val work = sys.env.getOrElse("SPARK_GRAFT_MACRO_DIR", "/tmp/graft_macro")

    val stages = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Long)]
    def stage(name: String, out: DataFrame): DataFrame = {
      val path = s"$work/$name"
      val (_, sec) = timed {
        out.write.mode("overwrite").parquet(path)
      }
      val back = spark.read.parquet(path)
      val rows = back.count()
      stages(name) = (sec, rows)
      System.err.println(f"[macro] $name $sec%.1f s, $rows rows")
      back
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
    val selected = stage("select",
      select_(stage("decontam",
        decontam(stage("dedup", dedup(stage("quality", quality(docs))))))))
    Bench.force(selected)

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

    val stageSum = stages.values.map(_._1).sum
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val stageJson = stages.map { case (n, (s, r)) =>
      s""""$n":{"sec":${f3(s)},"rows_out":$r}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"macro_curation","copies":$nCopies,"stages":$stageJson,""" +
        s""""stage_total_sec":${f3(stageSum)},"fused_sec":${f3(fusedSec)},""" +
        s""""src":"$src"}"""
    println(json)
    val out = new java.io.PrintWriter(
      new java.io.File(sys.env.getOrElse("SPARK_GRAFT_MACRO_OUT",
        s"MACRO_sf$nCopies.json")), "UTF-8")
    try out.println(json) finally out.close()
    spark.stop()
  }
}
