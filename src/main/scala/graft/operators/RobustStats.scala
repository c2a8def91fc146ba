package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics for corpus/metric quality control
  * (beyond the reference's surface — first-class per the build brief).
  *
  * Both operators follow the repo's exactness contract: every comparison
  * happens in INTEGER arithmetic (cross-multiplied moments, exact ranks),
  * so the flag/clip decisions are bit-identical in any engine — floats
  * appear only in final presentation columns, each a one-shot correctly
  * rounded expression (the q131 precedent).
  */
object RobustStats {

  /** Per-group outlier counts by the z-sigma rule, decided exactly:
    * with μ = sx/n and σ²_pop = (n·sxx − sx²)/n², the test
    * |x − μ| > (zNum/zDen)·σ cross-multiplies to
    *   (n·x − sx)² · zDen² > zNum² · (n·sxx − sx²)
    * — all in long arithmetic (no float boundary, no sqrt). Input values
    * must be exact integers (cents). Caller's overflow contract:
    * n·max|x| must stay within ~3e9 so its square fits a long — group
    * by a bounded key (user, day), not a 5-value enum over the corpus.
    *
    * One partial-agg pass builds the three moments per group, a second
    * pass joins them back and counts flagged rows. The moment frame is
    * KEY-sized, not constant-sized — with a high-cardinality key it
    * grows with the data — so the join strategy is left to Catalyst/AQE
    * (broadcast under the threshold, shuffle hash above), never forced.
    * n=1 groups flag nothing (variance 0, deviation 0). Scale shape:
    * two shuffles on the group key, no window, no skew surface beyond
    * the key agg.
    */
  def outlierCounts(df: DataFrame, keys: Seq[String], valueCol: String,
                    zNum: Long = 3, zDen: Long = 1): DataFrame = {
    val keyCols = keys.map(col)
    val v = col(valueCol)
    val moments = df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"), sum(v).as("sx"),
        sum(v * v).as("sxx"))
    // (n·x − sx)² · zDen² > zNum² · (n·sxx − sx²)
    val dev = col("n") * v - col("sx")
    val isOut = dev * dev * lit(zDen * zDen) >
      lit(zNum * zNum) * (col("n") * col("sxx") - col("sx") * col("sx"))
    df.join(moments, keys)
      .groupBy(keyCols: _*)
      .agg(max(col("n")).as("n"),
        sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
        sum(when(isOut, v)).as("outlier_total"))
  }

  /** Winsorized statistics: clip each value to its group's exact
    * [pLo, pHi] percentile bounds (percentile_disc semantics: the value
    * at rank ceil(p·n) under the deterministic (value, id) total order),
    * then aggregate. The standard heavy-tail guard before averaging —
    * a handful of corrupt readings otherwise own the mean at any scale.
    *
    * Ranks, bounds, and clips are all integer-exact; pLo/pHi are
    * rationals (num/den) so ceil(p·n) is `(n·num + den − 1) div den`
    * with no float rank boundary. One window pass over the group
    * exchange computes ranks and group sizes; the two boundary values per
    * group join back (key-sized frame — strategy left to AQE); the
    * clip is a branch-free least/greatest.
    */
  def winsorizedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                      idCol: String, loNum: Long, hiNum: Long,
                      den: Long): DataFrame = {
    require(0 <= loNum && loNum <= hiNum && hiNum <= den,
      "winsorizedStats: need 0 <= loNum <= hiNum <= den")
    val keyCols = keys.map(col)
    val v = col(valueCol)
    val w = Window.partitionBy(keyCols: _*).orderBy(v, col(idCol))
    val cw = Window.partitionBy(keyCols: _*)
    // integer ceil-division: Column./ on longs is DOUBLE division, so
    // spell the rank with SQL's div
    def ceilRank(num: Long): Column =
      greatest(lit(1L), expr(s"(gn * $num + ${den - 1}) div $den"))
    val ranked = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("gn", count(lit(1)).over(cw))
    val bounds = ranked
      .filter(col("rn") === ceilRank(loNum) || col("rn") === ceilRank(hiNum))
      .groupBy(keyCols: _*)
      .agg(min(when(col("rn") === ceilRank(loNum), v)).as("lo"),
        min(when(col("rn") === ceilRank(hiNum), v)).as("hi"))
    val clipped = least(greatest(v, col("lo")), col("hi"))
    df.join(bounds, keys)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(clipped).as("w_total"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"))
      .withColumn("w_avg6",
        round(col("w_total").cast("double") / col("n"), 6))
  }

  /** Exact rolling LOWER median of `valueCol` over the trailing
    * `nRows`-row window per key (ordered by `orderCol`): the element at
    * 1-based position ceil(n/2) of the sorted window — integer-exact
    * with no even-count averaging, so the result is engine-identical.
    * Partial windows at the partition head use however many rows exist
    * (min_periods = 1 semantics).
    *
    * Scale shape: one key exchange + one in-partition sort serve the
    * window; each row sorts its own <= nRows element array (constant
    * work per row — meant for small smoothing windows, not unbounded
    * frames). The robust alternative to a rolling MEAN, which a single
    * corrupt spike owns.
    */
  def rollingLowerMedian(df: DataFrame, keys: Seq[String],
                         orderCol: String, valueCol: String,
                         nRows: Int): DataFrame = {
    require(nRows >= 1, "rollingLowerMedian: nRows must be >= 1")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-(nRows - 1), Window.currentRow)
    df.withColumn("_arr", sort_array(collect_list(col(valueCol)).over(w)))
      .withColumn(s"med$nRows",
        element_at(col("_arr"),
          expr("(size(_arr) + 1) div 2").cast("int")))
      .drop("_arr")
  }

  /** Exact integer EWMA (α = 1/2) over a trailing `window`-row
    * lookback: weight of the j-th most recent value is 2^(window−1−j),
    * truncated at the series head with the normalizer reduced to the
    * weights actually present — so `ewma_micro = ws·1e6 div wt` is
    * EXACT integer arithmetic end to end (the q147 micro-unit
    * discipline for the one division). An UNBOUNDED α = 1/2 EWMA needs
    * 2^n weights — overflow by row ~60 — so the bounded lookback is
    * not a shortcut, it is the only exact distributed form; the tail
    * it drops is < 2^−window of the mass.
    *
    * One exchange on the partition keys; the `window` lag terms stay
    * inside a single codegen'd window stage (the q176 rolling-hash
    * pattern at feature width).
    */
  def ewmaFeatures(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                   valueCol: String, window: Int = 16): DataFrame = {
    require(window >= 2 && window <= 32,
      s"window must be in [2,32], got $window")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val terms = (0 until window).map { j =>
      val wj = 1L << (window - 1 - j)
      val x = lag(col(valueCol), j).over(w)
      (coalesce(x * lit(wj), lit(0L)),
        when(x.isNotNull, lit(wj)).otherwise(lit(0L)))
    }
    df.withColumn("ws", terms.map(_._1).reduce(_ + _).cast("long"))
      .withColumn("wt", terms.map(_._2).reduce(_ + _).cast("long"))
      .withColumn("ewma_micro",
        expr("(ws * 1000000) div wt"))
  }

  /** Exact per-group percentile report (disc semantics: the value at
    * 1-based rank ceil(p·n) under the deterministic (value, id) order)
    * for a fixed percentile list — the p50/p95/p99 latency report,
    * integer-exact like every rank in this file. One window pass over
    * the group exchange; all percentiles extract from the same ranked
    * frame in one aggregate.
    */
  def groupPercentiles(df: DataFrame, keys: Seq[String], valueCol: String,
                       idCol: String, ps: Seq[(Int, Int)]): DataFrame = {
    require(ps.nonEmpty &&
      ps.forall { case (n, d) => n >= 0 && d > 0 && n <= d },
      "groupPercentiles: percentiles must be rationals in [0, 1]")
    val keyCols = keys.map(col)
    val v = col(valueCol)
    val w = Window.partitionBy(keyCols: _*).orderBy(v, col(idCol))
    val cw = Window.partitionBy(keyCols: _*)
    def rank(num: Int, den: Int): Column =
      greatest(lit(1L), expr(s"(__gn * $num + ${den - 1}) div $den"))
    val ranked = df
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__gn", count(lit(1)).over(cw))
    val isNeeded = ps.map { case (n, d) => col("__rn") === rank(n, d) }
      .reduce(_ || _)
    ranked.filter(isNeeded)
      .groupBy(keyCols: _*)
      .agg(max(col("__gn")).as("n"),
        ps.map { case (n, d) =>
          min(when(col("__rn") === rank(n, d), v))
            .as(s"p${n * 100 / d}")
        }: _*)
  }

  /** Null imputation by the group's lower median — the feature-prep
    * fill that a corrupt spike cannot drag (mean imputation moves with
    * any single outlier). The median is computed over the group's
    * NON-NULL values at the deterministic ceil(n/2) rank under
    * (value, id); rows in groups with no observed value stay null and
    * carry `was_imputed = false` alongside a null fill — silently
    * inventing a value for an unobserved group is the bug, not the
    * feature.
    *
    * One window pass over non-null rows + a key-sized join back (AQE
    * strategy), the [[madOutliers]] shape at fill time.
    */
  def imputeLowerMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                        idCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val v = col(valueCol)
    val nn = df.filter(v.isNotNull)
    val w = Window.partitionBy(keyCols: _*).orderBy(v, col(idCol))
    val cw = Window.partitionBy(keyCols: _*)
    val med = nn
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__gn", count(lit(1)).over(cw))
      .filter(col("__rn") === expr("(__gn + 1) div 2"))
      .select(keyCols :+ v.as("__med"): _*)
    df.join(med, keys, "left")
      .withColumn("imputed", coalesce(v, col("__med")))
      .withColumn("was_imputed", v.isNull && col("__med").isNotNull)
      .drop("__med")
  }

  /** Per-group OLS trend (slope of y on x) from exact integer moments —
    * the q131 correlation discipline applied to trend detection: one
    * partial-agg pass collects (n, Σx, Σy, Σxy, Σx²) as exact longs,
    * and the slope
    *   β = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    * is emitted in micro units via ONE integral division with both
    * operands in DECIMAL(38,0) (no long overflow at any group size, no
    * float accumulation — DuckDB twin uses HUGEINT). Zero-variance-x
    * groups (all observations the same instant) emit null slope.
    *
    * One shuffle on the group key, map-side combined; nothing else.
    */
  def groupTrend(df: DataFrame, keys: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
      .withColumn("slope_micro",
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
          expr("""CAST((CAST(n AS DECIMAL(38,0)) * sxy
                   - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
                 div (CAST(n AS DECIMAL(38,0)) * sxx
                   - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""")))
  }

  /** Robust (median/IQR) feature scaling per group — the outlier-proof
    * alternative to mean/σ standardization for feature preparation: a
    * corrupt spike moves a mean-scaled feature's entire column, but the
    * median and the quartile span only move when a quarter of the data
    * does.
    *
    * Exactness: `med`/`q1`/`q3` are the values at 1-based ranks
    * ceil(n/2), ceil(n/4), ceil(3n/4) of the deterministic (value, id)
    * total order (percentile_disc semantics, the q134 rank discipline);
    * `scaled_micro = (v − med)·1e6 div iqr` is one integer division —
    * Spark's `div` and DuckDB's `//` both truncate toward zero, so
    * negative deviations agree bit-for-bit. Zero-IQR groups (over half
    * the span identical) scale to 0 — flat features carry no signal.
    *
    * Scale shape: one window pass over the group exchange computes all
    * three ranks; the per-group bound frame is key-sized and joins back
    * under AQE's strategy choice.
    */
  def robustScale(df: DataFrame, keys: Seq[String], valueCol: String,
                  idCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val v = col(valueCol)
    val w = Window.partitionBy(keyCols: _*).orderBy(v, col(idCol))
    val cw = Window.partitionBy(keyCols: _*)
    val ranked = df
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__gn", count(lit(1)).over(cw))
    def rank(num: Int, den: Int): Column =
      expr(s"(__gn * $num + ${den - 1}) div $den")
    val bounds = ranked
      .filter(col("__rn") === rank(1, 2) || col("__rn") === rank(1, 4) ||
        col("__rn") === rank(3, 4))
      .groupBy(keyCols: _*)
      .agg(min(when(col("__rn") === rank(1, 2), v)).as("med"),
        min(when(col("__rn") === rank(1, 4), v)).as("q1"),
        min(when(col("__rn") === rank(3, 4), v)).as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    df.join(bounds, keys)
      .withColumn("scaled_micro",
        when(col("iqr") > 0,
          expr(s"(($valueCol - med) * 1000000) div iqr"))
          .otherwise(lit(0L)))
  }

  /** Median-absolute-deviation outlier report per group — the robust
    * companion to [[outlierCounts]]'s z-sigma rule: a handful of extreme
    * values inflate σ and hide themselves, while the MAD boundary moves
    * only when HALF the group moves.
    *
    * Exactness contract: `med` is the group's LOWER median — the value at
    * 1-based rank ceil(n/2) of the deterministic (value, id) total order
    * — and `mad` the lower median of |x − med| under the (deviation, id)
    * order; both are exact integers, and the flag
    * `|x − med| · kDen > kNum · mad` is a pure long comparison. No
    * averaging, no sqrt, no float boundary anywhere — the q133/q134
    * discipline.
    *
    * Scale shape: two window passes and two key-sized join-backs, all
    * keyed on the same group columns, so one hash exchange feeds the
    * whole chain; the median frames are key-sized and their join strategy
    * is left to AQE. MAD = 0 groups (over half the values identical) flag
    * every row off the spike — the correct degenerate reading.
    */
  def madOutliers(df: DataFrame, keys: Seq[String], valueCol: String,
                  idCol: String, kNum: Long = 3, kDen: Long = 1)
  : DataFrame = {
    require(kNum > 0 && kDen > 0, "madOutliers: kNum/kDen must be positive")
    val keyCols = keys.map(col)
    val v = col(valueCol)
    def lowerMedian(in: DataFrame, orderCol: Column, out: String)
    : DataFrame = {
      val w = Window.partitionBy(keyCols: _*).orderBy(orderCol, col(idCol))
      val cw = Window.partitionBy(keyCols: _*)
      in.withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__gn", count(lit(1)).over(cw))
        .filter(col("__rn") === expr("(__gn + 1) div 2"))
        .select(keyCols :+ orderCol.as(out): _*)
    }
    val med = lowerMedian(df, v, "med")
    val withMed = df.join(med, keys)
      .withColumn("dev", abs(v - col("med")))
    val mad = lowerMedian(withMed, col("dev"), "mad")
    withMed.join(mad, keys)
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("dev") * kDen > lit(kNum) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        sum(when(col("dev") * kDen > lit(kNum) * col("mad"), v))
          .as("outlier_total"))
  }

  /** Single least-squares changepoint over a bucketed integer series —
    * "which day did the metric regime shift": per bucket t (1..T in
    * `bucketCol` order), totals S_t sum in ONE distributed aggregate;
    * the best two-segment split maximizes the between-segment score
    *
    *   F(k) = (L_k·T − k·L_T)² / (k·(T−k)·T)   (L_k = Σ_{t≤k} S_t)
    *
    * which is binary-segmentation's variance-reduction objective up to
    * the constant within-variance term. The numerator is an exact
    * DECIMAL integer; only the final per-row division is a double —
    * one fixed expression tree per candidate k, so both engines order
    * candidates identically (ties break on the bucket).
    *
    * Scale shape: the corpus collapses to the bucket domain first; the
    * prefix-sum window and the argmax rank run over that domain frame.
    * Returns one row: the split bucket, segment means (round 6), and
    * the score (round 6).
    */
  def changepoint(df: DataFrame, bucketCol: String, valueCol: String)
  : DataFrame = {
    val daily = graft.CacheScope.track(df.groupBy(col(bucketCol).as("b"))
      .agg(sum(col(valueCol)).as("s"))
      .persist()) // prefix sums + totals both read the bucket domain
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idx = Window.orderBy("b")
    val cum = daily.select(col("b"),
      sum("s").over(w).as("lk"),
      row_number().over(idx).cast("long").as("k"))
    val tot = daily.agg(count(lit(1)).as("t"), sum("s").as("lt"))
    val scored = cum.crossJoin(broadcast(tot))
      .filter(col("k") < col("t")) // a split needs a non-empty right side
      .withColumn("a", expr(
        "CAST(lk AS DECIMAL(38,0)) * t - CAST(k AS DECIMAL(38,0)) * lt"))
      .withColumn("score", col("a").cast("double") * col("a").cast("double")
        / (col("k") * (col("t") - col("k")) * col("t")).cast("double"))
    scored
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("b"))))
      .filter(col("rk") === 1)
      .select(col("b").as("split_bucket"), col("t"), col("k").as("k_left"),
        round(col("lk") / col("k"), 6).as("mean_before"),
        round((col("lt") - col("lk")) / (col("t") - col("k")), 6)
          .as("mean_after"),
        round(col("score"), 6).as("score"))
  }

  /** Theil-Sen robust trend over a bucketed integer series — the
    * breakdown-resistant alternative to [[groupTrend]]'s least squares
    * (a third of the buckets can be corrupt before the estimate moves):
    * the slope is the LOWER MEDIAN of all pairwise slopes
    * (yⱼ−yᵢ)/(xⱼ−xᵢ), i<j, under the deterministic (slope, x1, x2)
    * total order. Every pairwise slope is one division of exact
    * integers (identical doubles in both engines, so the median RANK
    * lands on the same pair), and the emitted `slope_micro` is the
    * exact integer division (yⱼ−yᵢ)·10⁶ div (xⱼ−xᵢ) of that pair — no
    * float in the reported figure.
    *
    * Scale shape: the corpus collapses to the bucket domain first; the
    * pairwise non-equi self-join is O(T²) over the DOMAIN (not rows) —
    * `maxBuckets` guards the quadratic blowup explicitly.
    */
  def theilSen(df: DataFrame, bucketCol: String, valueCol: String,
               maxBuckets: Int = 4096): DataFrame = {
    val daily = graft.CacheScope.track(df.groupBy(col(bucketCol).as("b"))
      .agg(sum(col(valueCol)).as("s"))
      .persist()) // guard count + both self-join sides read the domain
    val t = daily.count()
    require(t >= 2, "need at least 2 buckets")
    require(t <= maxBuckets,
      s"$t buckets exceed maxBuckets=$maxBuckets — the pairwise join " +
        "is quadratic in the bucket domain; coarsen the bucketing")
    val pairs = daily.as("a")
      .join(daily.as("bb"), col("bb.b") > col("a.b"))
      .select(col("a.b").as("x1"), col("bb.b").as("x2"),
        col("a.s").as("y1"), col("bb.s").as("y2"))
      .withColumn("slope",
        (col("y2") - col("y1")) / (col("x2") - col("x1")))
    pairs
      .withColumn("np", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("slope"), col("x1"), col("x2"))))
      .filter(col("rk") === expr("(np + 1) div 2")) // lower median
      .select(col("np").as("n_pairs"),
        expr("(y2 - y1) * 1000000 div (x2 - x1)").as("slope_micro"),
        round(col("slope"), 6).as("slope"))
  }

  /** Exact autocorrelation function of a bucketed integer series at
    * lags 1..maxLag — the seasonality/persistence diagnostic behind
    * q193's trend and q236's changepoint: Pearson r between the series
    * and its lag-k shift (positions, not calendar gaps: the series is
    * re-indexed densely so missing buckets don't silently misalign),
    * with every sum carried in DECIMAL(38,0) so the correlation
    * numerator/denominators are exact integers and the single double
    * division + sqrt is the same fixed tree in both engines.
    * Zero-variance windows (flat series) emit null, not a 0/0 NaN.
    *
    * Scale shape: the corpus collapses to the bucket domain first; the
    * lag self-join and per-lag aggregate run over that domain frame
    * (maxLag·T pair rows).
    */
  def autocorrelation(df: DataFrame, bucketCol: String, valueCol: String,
                      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64,
      s"maxLag must be in [1,64], got $maxLag")
    val idx = graft.CacheScope.track(df.groupBy(col(bucketCol).as("b"))
      .agg(sum(col(valueCol)).as("s"))
      .select(
        row_number().over(Window.orderBy("b")).cast("long").as("t"),
        col("s"))
      .persist()) // both lag-join sides read the indexed domain
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val lags = df.sparkSession.range(1, maxLag + 1).toDF("lag")
    val pairs = idx.as("a").crossJoin(broadcast(lags))
      .join(idx.as("bb"), col("bb.t") === col("a.t") + col("lag"))
      .select(col("lag"), col("a.s").as("x"), col("bb.s").as("y"))
    val m = pairs.groupBy("lag").agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x")) * dec(col("y"))).as("sxy"),
      sum(dec(col("x")) * dec(col("x"))).as("sxx"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val vx = (dec(col("n")) * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val vy = (dec(col("n")) * col("syy") - col("sy") * col("sy"))
      .cast("double")
    m.select(col("lag"), col("n"),
      when(vx * vy > 0,
        round((dec(col("n")) * col("sxy") - col("sx") * col("sy"))
          .cast("double") / sqrt(vx * vy), 6)).as("acf"))
  }
}
