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
    val l = valueCols.foldLeft(
      left.withColumn("__side", lit(1)))( (df, c) =>
      df.withColumn(c, lit(null)))
      .withColumn("__rts", lit(null))
    val r = right.select(
      (keyCols.map(col) :+ col(tsCol)) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(tsCol))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (valueCols :+ "__rts").foldLeft(unioned)( (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    val bounded = tolerance match {
      case None => filled
      case Some(tol) =>
        // the carried __rts rides the SAME window pass, so the staleness
        // test is one more projected column, not a second shuffle
        valueCols.foldLeft(filled)( (df, c) =>
          df.withColumn(c,
            when(col(tsCol) - col("__rts") <= tol, col(c))))
    }
    bounded.filter(col("__side") === 1)
      .select((leftCols ++ valueCols).map(col): _*)
  }
}
