package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination (beyond-reference, LLM-pipeline operator):
  * score every corpus document by its word-n-gram overlap with an
  * evaluation/benchmark set, the standard check that a pretraining corpus
  * does not contain the test data it will later be scored on.
  *
  * Scale shape: the benchmark side is always tiny relative to the corpus
  * (benchmarks are megabytes; the corpus is the 100 TB side), so its
  * distinct n-gram hashes are BROADCAST — the corpus streams through one
  * codegen'd shingle explode, a broadcast hash join (no corpus shuffle for
  * the membership test), and a single hash aggregation on doc id. N-grams
  * cross the one shuffle as 8-byte hashes, never as strings
  * ([[TextFunctions.portableHash64]] — md5-derived, so the whole decision
  * is reproducible from any SQL engine and the q75 oracle checks it
  * bit-for-bit).
  *
  * Every corpus doc appears in the output (docs shorter than n tokens get
  * n_grams = 0): a decontamination pass that silently drops rows cannot
  * be composed into a keep/drop manifest.
  */
object Decontaminate {

  /** Per-document overlap scores: `n_grams` = distinct word n-grams in the
    * doc, `n_hit` = distinct n-grams also present anywhere in `bench`,
    * `contaminated` = 1 when n_hit >= minOverlap (long, manifest-style).
    */
  def overlap(corpus: DataFrame, idCol: String, textCol: String,
              bench: DataFrame, benchTextCol: String,
              n: Int = 8, minOverlap: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val benchGrams = TextFunctions
      .explodedShingles(bench.select(col(benchTextCol))
        .withColumn("__bid", lit(0L)), "__bid", benchTextCol, n)
      .select(TextFunctions.portableHash64(col("shingle")).as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    // keepEmptyDocs: a doc with < n tokens emits one null-shingle row,
    // whose null hash is skipped by count_distinct — the doc survives
    // with zero counts instead of vanishing from the manifest
    val corpusGrams = TextFunctions
      .explodedShingles(corpus, idCol, textCol, n, keepEmptyDocs = true)
      .select(col("id"),
        TextFunctions.portableHash64(col("shingle")).as("g"))
    corpusGrams
      .join(broadcast(benchGrams), Seq("g"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        count_distinct(col("g")).as("n_grams"),
        count_distinct(when(col("__hit").isNotNull, col("g"))).as("n_hit"))
      .withColumn("contaminated",
        (col("n_hit") >= minOverlap).cast("long"))
  }

  /** Semantic decontamination: flag corpus rows whose embedding is
    * within cosine `tau` of ANY benchmark embedding — the paraphrase
    * net that n-gram overlap misses. Same scale shape as [[overlap]]:
    * the benchmark side broadcasts, the corpus streams through one
    * fused-codegen cosine scan ([[graft.plans.CosineSimilarity]]) and
    * one hash aggregate on the corpus id — no corpus shuffle before
    * the final per-id max.
    *
    * Every corpus row appears in the output with its `max_sim`
    * (rounded to 6 dp BEFORE the max so the score is reproducible
    * across engines; rounding is monotone, so the rounded max equals
    * the max of rounded sims) and the keep/drop flag.
    */
  def semanticOverlap(corpus: DataFrame, idCol: String, vecCol: String,
                      bench: DataFrame, benchVecCol: String,
                      tau: Double): DataFrame = {
    val b = broadcast(bench.select(col(benchVecCol).as("__b_emb")))
    corpus.select(col(idCol), col(vecCol).as("__c_emb"))
      .crossJoin(b)
      .select(col(idCol),
        round(graft.functions.VectorFunctions.cosine(
          col("__c_emb"), col("__b_emb")), 6).as("__sim"))
      .groupBy(idCol)
      .agg(max(col("__sim")).as("max_sim"))
      .withColumn("contaminated", col("max_sim") >= tau)
  }
}
