package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: group users by the time bucket of their
  * first activity (the cohort), then count how many of each cohort are
  * still active n buckets later — the standard growth-analytics matrix
  * (beyond-reference operator, first-class per the build brief).
  *
  * The caller supplies the integer time-bucket column (e.g.
  * `ts div week`) so bucketing stays exact integer arithmetic — no
  * calendar/timezone seam between engines (the q125 oracle reproduces
  * the matrix bit-for-bit from the same division).
  *
  * Scale shape: one distinct over (user, bucket) — the only pass that
  * sees event-level volume, and a partial-aggregatable one; the cohort
  * assignment is a user-keyed min aggregate whose exchange the
  * subsequent user join reuses; the matrix and cohort sizes are
  * cohort-keyed aggregates over the already-contracted (user, bucket)
  * frame. No windows, no driver state.
  */
object Cohort {

  /** One row per (cohort, offset) with the distinct active-user count and
    * the cohort's size: cohort = the user's minimum bucket, offset =
    * bucket - cohort (offset 0 row counts the full cohort by
    * construction).
    */
  def retention(events: DataFrame, userCol: String, bucketCol: String)
  : DataFrame = {
    val active = events
      .select(col(userCol).as("user"),
        col(bucketCol).cast("long").as("bucket"))
      .distinct()
    val first = active.groupBy("user").agg(min("bucket").as("cohort"))
    val sizes = first.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    active.join(first, "user")
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("bucket_offset"))
      .agg(countDistinct("user").as("n_active"))
      .join(sizes, "cohort")
      .select("cohort", "bucket_offset", "n_active", "cohort_size")
  }

  /** RFM segmentation — the classic customer-value grid: per user,
    * Recency (days since last activity, relative to the corpus max
    * day), Frequency (activity count), Monetary (value total), each
    * scored into `k` exact equal-frequency bins and combined into the
    * three-digit segment code.
    *
    * Binning is [[Sampling.quantileBins]] — the closed-form ntile that
    * needs NO global window (globalRowIndex + arithmetic), so scoring
    * scales past a single partition; ntile semantics (larger buckets
    * first, deterministic (metric, user) order) make the oracle a plain
    * ntile twin. Scores ascend with the metric: r_score 1 = most
    * recent, f/m_score k = most active/valuable — callers wanting
    * "5 = best" flip r with k+1−r_score.
    *
    * One user-keyed aggregate + three bounded index passes over the
    * user-sized frame + key-sized joins back.
    */
  def rfmSegments(events: DataFrame, userCol: String, dayCol: String,
                  valueCol: String, k: Int = 5): DataFrame = {
    val base = events
      .groupBy(col(userCol).as("user"))
      .agg(max(col(dayCol)).as("last_day"),
        count(lit(1)).as("f"),
        sum(col(valueCol)).as("m"))
    val maxDay = base.agg(max("last_day").as("corpus_max"))
    val withR = base.crossJoin(broadcast(maxDay))
      .withColumn("r", col("corpus_max") - col("last_day"))
      .select("user", "r", "f", "m")
    def score(metric: String): DataFrame =
      Sampling.quantileBins(withR.select(col("user"), col(metric)),
          metric, "user", k)
        .select(col("user"), col("bin").as(s"${metric}_score"))
    withR
      .join(score("r"), "user").join(score("f"), "user")
      .join(score("m"), "user")
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** Day-of-week activity profile with exact deviation-from-mean basis
    * points: per dow (pure `day % 7` — no calendar seam), volume,
    * total, and `dev_bps` = (avg_dow / avg_all − 1)·10000 decided in
    * DECIMAL(38,0) cross-multiplication (the q160 discipline) — the
    * seasonality report behind staffing/anomaly baselines. Two tiny
    * aggregates; the global row rides a broadcast (J5).
    */
  def weekdayProfile(events: DataFrame, dayCol: String, valueCol: String)
  : DataFrame = {
    val perDow = events
      .groupBy(pmod(col(dayCol), lit(7L)).as("dow"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
    val all = perDow.agg(sum("n").as("n_all"), sum("total").as("t_all"))
    perDow.crossJoin(broadcast(all))
      .select(col("dow"), col("n"), col("total"),
        expr("total * 1000000 div n").as("avg_micro"),
        expr("""CAST((CAST(total AS DECIMAL(38,0)) * n_all
                 - CAST(t_all AS DECIMAL(38,0)) * n) * 10000
               div (CAST(t_all AS DECIMAL(38,0)) * n) AS BIGINT)""")
          .as("dev_bps"))
  }

  /** Per-user activity BITMAP over a bounded day range — the bitmap-
    * index trick behind fast retention/engagement queries: one long
    * encodes 60 days of activity, and every downstream question
    * (active days, week-over-week retention, weekday mix) is a bitwise
    * AND/shift + popcount on that single column — no re-join to the
    * event table, no per-day rows.
    *
    * `dayCol` must already be a 0-based day index in [0, 60) (the
    * caller's exact integer division); the 60-day bound keeps the
    * bitmap clear of the sign bit, so right-shifts behave identically
    * (arithmetic = logical on non-negative longs) in every engine.
    *
    * One hash aggregate (bit_or is partial-aggregatable — 8 bytes of
    * state per user per partition); everything after is per-row bit
    * arithmetic. The q125 retention matrix answers "how many", this
    * answers "which days, per user" at 8 bytes a row.
    */
  def activityBitmap(events: DataFrame, userCol: String, dayCol: String)
  : DataFrame = {
    // weekday mask relative to day 0 (days ≡ 0..4 mod 7), a plan-time
    // constant identical in both engines
    val weekdayMask = (0 until 60).filter(_ % 7 < 5)
      .map(1L << _).reduce(_ | _)
    events
      .select(col(userCol).as("user"), col(dayCol).cast("long").as("day"))
      .filter(col("day") >= 0 && col("day") < 60)
      .groupBy("user")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(day AS INT)))")
        .as("bmp"))
      .select(col("user"), col("bmp"),
        expr("bit_count(bmp)").cast("long").as("n_active_days"),
        expr("bit_count(bmp & shiftright(bmp, 7))").cast("long")
          .as("wow_retained_days"),
        expr(s"bit_count(bmp & ${weekdayMask}L)").cast("long")
          .as("n_weekdays"))
  }
}
