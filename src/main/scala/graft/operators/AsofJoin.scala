package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal nearest) join: enrich each left row with the latest
  * right row for the same key whose timestamp is <= the left timestamp.
  *
  * Spark-first formulation — no custom planner: tag both sides, union,
  * one window over (key, ts) carrying `last(value, ignoreNulls)` forward,
  * keep left rows. One shuffle on the key, no theta join, no per-key
  * materialization: at 100 TB this is a single exchange + sort, versus
  * the naive range-join's quadratic explosion.
  *
  * Tie rule: right rows sort before left rows at equal timestamps, so an
  * exactly-simultaneous right row IS matched (standard ASOF semantics,
  * same as DuckDB's `ON l.ts >= r.ts`).
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     reference side
    * @param keyCols   equality keys present on both sides
    * @param tsCol     ordering column name, both sides, numeric/timestamp
    * @param valueCols right-side payload columns to carry (must not clash
    *                  with left column names)
    * @param tolerance max allowed `left.ts - right.ts`, in the ts
    *                  column's own (numeric) units — matches further back
    *                  are nulled out, the standard bounded-staleness ASOF
    *                  (e.g. "only enrich with a purchase from the last
    *                  hour"). None = unbounded (classic ASOF).
    */
  def lastValue(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                tsCol: String, valueCols: Seq[String],
                tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
      .withColumn("__pay", lit(null))
    // the payload is carried as ONE struct (right ts + values): ASOF
    // matches the latest right ROW and takes its values even when some
    // are null — per-column last(ignoreNulls) would forward-fill an
    // OLDER row's value under a fresher null, diverging from standard
    // ASOF (and from the DuckDB oracle) on null payloads, and letting a
    // stale value slip past the tolerance bound
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__pay",
        struct(col(tsCol).as("__rts") +: valueCols.map(c =>
          col(c).as(c)): _*))
      .select(keyCols.map(col) ++
        Seq(col(tsCol), col("__side"), col("__pay")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__pay",
      last(col("__pay"), ignoreNulls = true).over(w))
    val gated = tolerance match {
      case None => filled
      case Some(tol) =>
        // staleness test on the matched row's own ts — one projection,
        // same window pass, no second shuffle
        filled.withColumn("__pay",
          when(col(tsCol) - col("__pay.__rts") <= tol, col("__pay")))
    }
    val out = valueCols.foldLeft(gated)( (df, c) =>
      df.withColumn(c, col(s"__pay.$c")))
    out.filter(col("__side") === 1)
      .select((leftCols ++ valueCols).map(col): _*)
  }
}
