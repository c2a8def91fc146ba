package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis for retention/lifetime questions — the product-limit
  * (Kaplan-Meier) estimator over right-censored integer durations:
  * "what fraction of users survive past t days", where a unit either
  * experienced the event (died=true at its duration) or is censored
  * (still alive when observation stopped — it contributes to the
  * at-risk pool up to its duration but never to a death).
  *
  *   S(t) = Π_{tᵢ ≤ t, dᵢ>0} (1 − dᵢ/nᵢ)
  *
  * Exactness split: every dᵢ (deaths at tᵢ) and nᵢ (at-risk = units
  * with duration ≥ tᵢ) is an exact integer from one duration-keyed
  * aggregate; the product is evaluated as exp(Σ ln(1−dᵢ/nᵢ)) whose ln
  * arguments are identical rationals in both engines and whose running
  * window sum accumulates in the same (ORDER BY t) order — the only
  * engine divergence is exp's final ulp, far inside round(…,6). The
  * dᵢ = nᵢ boundary (everyone remaining dies) would be ln(0) — an
  * ERROR in DuckDB and a null in Spark — so it is handled structurally:
  * a running "extinct" flag pins survival to exactly 0.0 from that
  * time on, and ln never sees a non-positive argument.
  *
  * Scale shape: the unit table collapses to the DURATION DOMAIN first
  * (one exchange); the cumulative windows run over that bounded domain
  * frame, never over units. Output rows are death times only.
  */
object Survival {

  /** `lives`: one row per unit with an integer `durCol` (≥ 0) and a
    * boolean `diedCol`. Returns (t, n_at_risk, d, survival) per death
    * time, survival rounded 6 dp.
    */
  def kaplanMeier(lives: DataFrame, durCol: String, diedCol: String)
  : DataFrame = {
    val d = graft.CacheScope.track(lives.groupBy(col(durCol).as("t"))
      .agg(sum(when(col(diedCol), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("ct"))
      .persist()) // totals + the cumulative chain both read the domain
    val tot = d.agg(sum("ct").as("n"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCur = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.crossJoin(broadcast(tot))
      .withColumn("n_at_risk",
        col("n") - coalesce(sum("ct").over(wPrev), lit(0L)))
      .withColumn("extinct",
        max(when(col("d") >= col("n_at_risk"), 1).otherwise(0)).over(wCur))
      .withColumn("surv",
        when(col("extinct") === 1, lit(0.0)).otherwise(
          exp(sum(when(col("d") > 0 && col("d") < col("n_at_risk"),
            log(lit(1) - col("d") / col("n_at_risk")))
            .otherwise(lit(0.0))).over(wCur))))
      .filter(col("d") > 0)
      .select(col("t"), col("n_at_risk"), col("d"),
        round(col("surv"), 6).as("survival"))
  }
}
