package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-bounded similarity join over a string column — the
  * spelling-variant / near-identifier matcher of an entity-resolution
  * pipeline (the LLM-curation cousin: vocabulary typo mining before
  * frequency thresholds).
  *
  * Algorithm: deletion-neighborhood blocking (the FastSS / SymSpell
  * family). Every DISTINCT string generates its |s|+1 single-character
  * deletion variants plus itself; two strings within Levenshtein
  * distance 1 necessarily share a variant:
  *
  *   - substitution at position p: both sides' deletion at p yields the
  *     same string;
  *   - insertion/deletion: the longer side's deletion at the inserted
  *     position equals the shorter side verbatim (its identity variant);
  *   - equality is excluded by the pair ordering.
  *
  * so an equi-join on the variant string is a COMPLETE candidate
  * generator, and the exact `levenshtein` check on each candidate pair
  * removes the false positives (distinct strings whose deletion sets
  * intersect at distance 2, e.g. "ab"/"ba" sharing "a").
  *
  * Scale: candidate volume is Σ(|s|+1) over the vocabulary — linear in
  * total string bytes, vs the quadratic all-pairs the DuckDB oracle
  * runs (sound there only because distance ≤ 1 implies a length band of
  * ±1). One hash exchange on the variant key, one distinct on the pair;
  * bucket width is the true near-variant cluster size, not a hash
  * artifact. The verify is whole-stage-codegen (`levenshtein` is a
  * native binary expression).
  */
object EditDistance {

  /** Distinct unordered pairs of distinct values of `strCol` within
    * Levenshtein distance 1, as (name_a < name_b, dist).
    */
  def fuzzyPairs(df: DataFrame, strCol: String): DataFrame = {
    val u = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
    // i = 0-based deletion position; i == length(s) is the identity
    // variant (both substrings degenerate to s ++ "").
    val cands = u
      .select(col("s"),
        explode(sequence(lit(0), length(col("s")))).as("i"))
      .select(col("s"),
        concat(col("s").substr(lit(1), col("i")),
          col("s").substr(col("i") + lit(2), length(col("s"))))
          .as("variant"))
    cands.alias("a")
      .join(cands.alias("b"), Seq("variant"))
      .filter(col("a.s") < col("b.s"))
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
  }

  /** Jaro-Winkler near-duplicate pairs over the DISTINCT values of
    * `strCol`, blocked on the first whitespace token: pairs are compared
    * only within a block, which bounds candidates to Σ(block size)² over
    * the VOCABULARY (distinct-collapse first — corpus row count never
    * enters the join), vs an all-pairs quadratic. The similarity itself
    * is the native codegen [[graft.plans.JaroWinkler]] expression,
    * DuckDB-parity-pinned, evaluated once per candidate inside the
    * block join's codegen stage. The threshold compares the ROUNDED
    * score (6 dp, the repo's derived-double convention) so an IEEE
    * last-ulp difference between engines can never flip a boundary row.
    *
    * First-token blocking is the name-matching analog of the LSH band
    * buckets: complete for pairs agreeing on their leading token (the
    * high-signal field in "modifier noun" vocabularies), and the block
    * key's frequency — not the corpus size — caps the per-task work.
    */
  def jaroWinklerPairs(df: DataFrame, strCol: String,
                       threshold: Double): DataFrame = {
    // the vocabulary contraction is read by BOTH join sides: persist so
    // the corpus scan + distinct run once (q126's element-frame rule)
    val u = graft.CacheScope.track(
      df.select(col(strCol).as("s")).filter(col("s").isNotNull)
        .distinct()
        .withColumn("blk", split(col("s"), " ").getItem(0))
        .persist())
    u.alias("a")
      .join(u.alias("b"),
        col("a.blk") === col("b.blk") && col("a.s") < col("b.s"))
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"),
        round(graft.plans.JaroWinkler(col("a.s"), col("b.s")), 6).as("jw"))
      .filter(col("jw") >= threshold)
  }
}
