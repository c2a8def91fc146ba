package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern
  * (beyond the reference's surface — first-class per the build brief).
  *
  * At 100 TB the fact table is append-only and re-scanning history to
  * refresh a per-key rollup is the single most expensive anti-pattern a
  * pipeline can ship. The fix is algebraic: keep the rollup as MERGEABLE
  * per-key state (count / sum / min / max / sum-of-squares), fold each
  * new batch into it with one small outer-merge, and derive the
  * presentation columns (avg, variance) from state at read time. Every
  * state column is an integer sum or an extremum, so folding batches in
  * ANY order — or re-folding after a replay — lands on bit-identical
  * state; the q132 gate proves `fold(fold(init, day-evens), day-odds)`
  * hash-equals the single-pass recompute in DuckDB.
  *
  * Scale shape: `aggregate` is one partial-agg shuffle over the BATCH
  * only (the whole point — history is never touched); `merge` joins two
  * key-sized frames (state ⋈ state, dwarfed by the fact volume) and is
  * a coalesce-per-column full outer join, no window, no skew surface
  * beyond the key agg itself.
  */
object IncrementalAgg {

  private val stateCols = Seq("n", "total", "mn", "mx", "sumsq")

  /** Collapse one batch to per-key state. `valueCol` must already be an
    * exact (integer) column — cents, not dollars — so sums and
    * sum-of-squares are engine-exact under any fold order.
    */
  def aggregate(batch: DataFrame, keys: Seq[String], valueCol: String)
  : DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"),
        sum(col(valueCol) * col(valueCol)).as("sumsq"))

  /** Merge two state frames: counts and sums add, extrema take the
    * outer min/max; keys present on one side pass through. Associative
    * and commutative, so daily increments can fold in any order.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val l = stateCols.foldLeft(a) { (d, c) => d.withColumnRenamed(c, s"l_$c") }
    val r = stateCols.foldLeft(b) { (d, c) => d.withColumnRenamed(c, s"r_$c") }
    l.join(r, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("l_n"), lit(0L)) + coalesce(col("r_n"), lit(0L)))
          .as("n"),
        (coalesce(col("l_total"), lit(0L)) +
          coalesce(col("r_total"), lit(0L))).as("total"),
        least(col("l_mn"), col("r_mn")).as("mn"),
        greatest(col("l_mx"), col("r_mx")).as("mx"),
        (coalesce(col("l_sumsq"), lit(0L)) +
          coalesce(col("r_sumsq"), lit(0L))).as("sumsq")): _*)
  }

  /** Fold a sequence of batches into one state frame. */
  def foldBatches(batches: Seq[DataFrame], keys: Seq[String],
                  valueCol: String): DataFrame =
    batches.map(aggregate(_, keys, valueCol)).reduce(merge(_, _, keys))

  /** Bitmap-state variant of the algebra: per-key OR-fold of day bits
    * ([[graft.operators.Cohort.activityBitmap]]'s state, made
    * mergeable). `dayCol` must be a 0-based index < 60 (callers filter
    * — same sign-bit contract as the batch operator). OR is the ideal
    * mergeable state: idempotent (a replayed batch cannot corrupt it),
    * commutative, 8 bytes per key.
    */
  def aggregateBitmap(batch: DataFrame, keys: Seq[String],
                      dayCol: String): DataFrame =
    batch.filter(col(dayCol) >= 0 && col(dayCol) < 60)
      .groupBy(keys.map(col): _*)
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), " +
        s"CAST($dayCol AS INT)))").as("bmp"))

  def mergeBitmap(a: DataFrame, b: DataFrame, keys: Seq[String])
  : DataFrame =
    a.withColumnRenamed("bmp", "l_bmp")
      .join(b.withColumnRenamed("bmp", "r_bmp"), keys, "full_outer")
      .select(keys.map(col) :+
        (coalesce(col("l_bmp"), lit(0L))
          .bitwiseOR(coalesce(col("r_bmp"), lit(0L)))).as("bmp"): _*)

  /** Presentation view over state: derived avg and population variance,
    * each a one-shot correctly-rounded double expression (the q131
    * moment-assembly contract — engine-exact).
    */
  def present(state: DataFrame): DataFrame = {
    def D(c: org.apache.spark.sql.Column) = c.cast("double")
    state
      .withColumn("avg6", round(D(col("total")) / col("n"), 6))
      .withColumn("var6", round(
        (D(col("n")) * D(col("sumsq")) - D(col("total")) * D(col("total")))
          / (D(col("n")) * D(col("n"))), 6))
  }
}
