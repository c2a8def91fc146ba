package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation analytics with EXACT decisions: the two-proportion
  * z-test's significance cut is a rational inequality once squared —
  * with ni users and xi converters per variant, x = x1+x2, N = n1+n2,
  * D = x1·n2 − x2·n1,
  *
  *   z² = D²·N / (n1·n2·x·(N−x))  >=  z²_crit
  *
  * cross-multiplies to `D²·N·critDen >= critNum·n1·n2·x·(N−x)` in
  * DECIMAL(38,0) — no sqrt, no float, the accept/reject decision is
  * bit-identical in any engine (1.96² = 3.8416 = 2401/625 exactly).
  * Degenerate pools (x = 0 or x = N: zero variance) are never
  * significant — both variants converted identically.
  *
  * One variant-keyed aggregate (two longs per variant) + a variant-pair
  * self-join over the handful of variant rows. The fact table is
  * scanned once.
  */
object Experiment {

  /** Per unordered variant pair: users, converters, exact rate bps,
    * difference bps, and the cross-multiplied significance verdict.
    */
  def twoProportionTest(df: DataFrame, variantCol: String,
                        convertedCol: Column,
                        critNum: Long = 2401, critDen: Long = 625)
  : DataFrame = {
    require(critNum > 0 && critDen > 0, "critical value must be positive")
    val per = df.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(convertedCol, 1L).otherwise(0L)).as("x"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    per.as("a").join(per.as("b"), col("a.variant") < col("b.variant"))
      .select(col("a.variant").as("variant_a"),
        col("b.variant").as("variant_b"),
        col("a.n").as("n_a"), col("a.x").as("x_a"),
        col("b.n").as("n_b"), col("b.x").as("x_b"))
      .withColumn("rate_a_bps", expr("x_a * 10000 div n_a"))
      .withColumn("rate_b_bps", expr("x_b * 10000 div n_b"))
      .withColumn("diff_bps", col("rate_a_bps") - col("rate_b_bps"))
      .withColumn("significant", {
        val x = col("x_a") + col("x_b")
        val n = col("n_a") + col("n_b")
        val d = dec(col("x_a")) * dec(col("n_b")) -
          dec(col("x_b")) * dec(col("n_a"))
        x > 0 && x < n &&
          d * d * dec(n) * dec(lit(critDen)) >=
            dec(lit(critNum)) * dec(col("n_a")) * dec(col("n_b")) *
              dec(x) * dec(n - x)
      })
  }
}
