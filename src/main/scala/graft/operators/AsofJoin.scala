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

  /** Time-weighted linear interpolation — the two-sided ASOF: each left
    * row gets the right-side value linearly interpolated between the
    * latest right row at-or-before its timestamp and the earliest right
    * row strictly after it (sensor/market-data resampling). Outside the
    * right side's span the nearest endpoint's value is held flat; keys
    * with no right rows at all interpolate to null.
    *
    * Same single-exchange shape as [[lastValue]]: tag both sides, union,
    * ONE window pass over (key, ts) computing both the forward fill
    * (last right row at-or-before) and the backward fill (first right row
    * after), then one projection does the arithmetic. No range join, no
    * per-key materialization. At equal timestamps the right row sorts
    * first, so an exactly-simultaneous sample is the "before" endpoint
    * and the interpolation returns its value exactly.
    *
    * The right side must be unique per (key, ts) — pre-aggregate
    * duplicates (e.g. max per second) or the fill picks an unspecified
    * one of the tied rows.
    *
    * @param valueCol right-side numeric column to interpolate; emitted
    *                 under the same name on the left rows
    */
  def interpolateLinear(left: DataFrame, right: DataFrame,
                        keyCols: Seq[String], tsCol: String,
                        valueCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__rv", col(valueCol).cast("double"))
      .select(keyCols.map(col) ++
        Seq(col(tsCol), col("__side"), col("__rv")): _*)
    val unioned = l.drop(valueCol)
      .unionByName(r, allowMissingColumns = true)
    val ord = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
    val before = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // ts and value are carried as ONE struct per direction so both fields
    // always come from the same right row (the lastValue null-payload
    // lesson); right rows at the left row's exact ts land in `before`
    // only (side 0 sorts first), so p.ts <= ts < n.ts and the
    // denominator below is never zero.
    val pay = struct(col(tsCol).cast("double").as("__rts"),
      col("__rv").as("__v"))
    val filled = unioned
      .withColumn("__p",
        last(when(col("__side") === 0, pay), ignoreNulls = true).over(before))
      .withColumn("__n",
        first(when(col("__side") === 0, pay), ignoreNulls = true).over(after))
    filled.filter(col("__side") === 1)
      .withColumn(valueCol,
        when(col("__p").isNotNull && col("__n").isNotNull,
          col("__p.__v") + (col("__n.__v") - col("__p.__v")) *
            (col(tsCol).cast("double") - col("__p.__rts")) /
            (col("__n.__rts") - col("__p.__rts")))
          .when(col("__p").isNotNull, col("__p.__v"))
          .when(col("__n").isNotNull, col("__n.__v")))
      .select((leftCols.filterNot(_ == valueCol) :+ valueCol).map(col): _*)
  }

  /** Linear multi-touch attribution — q140's last-touch rule upgraded
    * to the equal-split model, with EXACT conservation: each purchase's
    * value in micro units splits `value·1e6 div n` per qualifying touch
    * and the remainder `value·1e6 mod n` goes to the LATEST touch, so
    * the per-type totals sum to exactly the purchase total (float
    * splitting can never promise that; integer div/mod does).
    * Purchases with no touch in the window credit 'none' in full.
    *
    * Scale shape: one range join (user-keyed, tolerance-bounded) + two
    * windows keyed on the purchase id (count + latest rank share one
    * exchange) + the type-sized final aggregate.
    */
  def linearAttribution(purchases: DataFrame, touches: DataFrame,
                        keyCols: Seq[String], tsCol: String,
                        typeCol: String, valueCol: String,
                        toleranceUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = purchases.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__pts"),
        col("event_id").as("__pid"), col(valueCol).as("__val")): _*)
    val t = touches.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__tts"),
        col(typeCol).as("__ttype")): _*)
    val joined = p.join(t,
      keyCols.map(k => p(k) === t(k)).reduce(_ && _) &&
        col("__tts") <= col("__pts") &&
        col("__pts") - col("__tts") <= toleranceUs,
      "left")
    val w = Window.partitionBy("__pid")
    val wr = Window.partitionBy("__pid").orderBy(col("__tts").desc)
    joined
      .withColumn("__n", count(col("__ttype")).over(w))
      .withColumn("__rk", row_number().over(wr))
      .withColumn("touch_type",
        coalesce(col("__ttype"), lit("none")))
      .withColumn("credit_micro",
        when(col("__n") === 0, col("__val") * 1000000L)
          .otherwise(expr("__val * 1000000 div __n") +
            when(col("__rk") === 1, expr("__val * 1000000 % __n"))
              .otherwise(lit(0L))))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_micro")).as("credit_micro_total"))
  }
}
