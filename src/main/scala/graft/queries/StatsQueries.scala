package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Analytics + statistics: funnels, cohorts, attribution,
  * robust stats, experiment tests, anonymity, data quality.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object StatsQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Funnel analysis (Funnel.earliestCompletion): greedy earliest
    // view -> click -> purchase per user, later stages within 24 h of
    // the first view (a window spanning all three outcomes at gate
    // scale). Timestamps compared as integer microseconds — exact on
    // both engines.
    "q123_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), expr("ts div 1000").as("ts_us"))
      graft.operators.Funnel.earliestCompletion(ev, "user_id",
        "event_type", "ts_us", Seq("view", "click", "purchase"),
        window = Some(24L * 3600L * 1000000L))
    }),

    // Cohort retention matrix (Cohort.retention): users bucketed by
    // first-PURCHASE day (pure integer division of epoch-us — no
    // calendar seam; purchase-only activity gives a real decay curve),
    // distinct-active counts per (cohort, offset) plus cohort sizes.
    "q125_cohort" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000 div 86400000000").as("dy"))
      graft.operators.Cohort.retention(ev, "user_id", "dy")
    }),

    // Time-weighted average (the TSDB aggregate): each purchase value
    // holds until the user's next purchase; twa = sum(value * hold) /
    // total span. Integer-cents x integer-microsecond numerators stay
    // exact; the only division is the final one, rounded identically.
    // One user exchange: the lead window and the aggregate share it.
    "q130_time_weighted" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .withColumn("next_ts", lead("ts_us", 1).over(w))
        .filter(col("next_ts").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_holds"),
          sum((col("next_ts") - col("ts_us")) * col("cents"))
            .as("weighted_sum"),
          sum(col("next_ts") - col("ts_us")).as("span_us"))
        .withColumn("twa_cents",
          round(col("weighted_sum").cast("double") / col("span_us"), 6))
    }),

    // Moment-based Pearson correlation: quantity vs whole-dollar price
    // per return flag. The five moments are EXACT integer sums (one
    // partial-agg pass, order-free); the correlation assembles from
    // them in one deterministic double expression — each product /
    // sqrt / division is a single correctly-rounded IEEE op, identical
    // in any engine — rather than an incremental covariance update
    // whose accumulation order differs. (Whole dollars keep sum(y*y)
    // inside long range at any group size the fixture reaches.)
    "q131_corr" -> ((s, d) => {
      def D(c: org.apache.spark.sql.Column) = c.cast("double")
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice"), 0).cast("long").as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("corr6", round(
          (D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
            (sqrt(D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))) *
              sqrt(D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy")))),
          6))
    }),

    // Exact z-score outlier counts per user (z > 2 on purchase cents):
    // the flag is decided in cross-multiplied LONG arithmetic —
    // (n·x − sx)²·zDen² > zNum²·(n·sxx − sx²) — so the flagged set is
    // bit-identical in any engine; no sqrt, no float boundary.
    "q133_outliers" -> ((s, d) =>
      graft.operators.RobustStats.outlierCounts(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        Seq("user_id"), "cents", zNum = 2, zDen = 1)),

    // Winsorized mean per event_type: clip to the exact [p05, p95]
    // percentile_disc bounds (rank ceil(p·n) under the total
    // (cents, event_id) order) before averaging — the heavy-tail guard.
    "q134_winsorize" -> ((s, d) =>
      graft.operators.RobustStats.winsorizedStats(
        Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        Seq("event_type"), "cents", "event_id", 5, 95, 100)),

    // Golden-record survivorship: each column independently takes its
    // latest non-null value under the total (ts, event_id) order — the
    // master-data collapse where the winning ROW may not exist. One
    // struct-max hash aggregate, no window, no self-join.
    "q136_golden" -> ((s, d) =>
      graft.operators.MergeOps.goldenRecord(
        Tables.events(s, d).select(col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_id"),
          when(col("event_type") === "purchase",
            round(col("value") * 100, 0).cast("long")).as("purchase_cents"),
          when(col("event_type") === "view",
            get_json_object(col("props"), "$.k").cast("long")).as("view_k"),
          when(col("event_type") === "error", col("event_id"))
            .as("error_event")),
        "user_id", "ts_us", "event_id",
        Seq("purchase_cents", "view_k", "error_event")))
  ,

    // Exact rolling LOWER median (7 observed days) of per-user daily
    // purchase cents: element at ceil(n/2) of the sorted trailing
    // window — no even-count averaging, integer-exact cross-engine.
    "q138_rolling_median" -> ((s, d) =>
      graft.operators.RobustStats.rollingLowerMedian(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            expr("ts div 86400000000000").as("day"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .groupBy("user_id", "day")
          .agg(sum("cents").as("cents")),
        Seq("user_id"), "day", "cents", 7)),

    // Last-touch attribution: each purchase credits the latest
    // click/view by the same user at-or-before it within 7 days
    // (AsofJoin.lastValue with tolerance — the bounded-staleness ASOF);
    // revenue then aggregates per touch type, un-attributed purchases
    // under 'none'. Touches are deduped per (user, ts) by max event_id
    // first (the ASOF right-side uniqueness contract).
    "q140_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val touches = ev
        .filter(col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts_us")
        .agg(max(struct(col("event_id"), col("event_type"))).as("m"))
        .select(col("user_id"), col("ts_us"),
          col("m.event_type").as("touch_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts_us", "event_id", "cents")
      graft.operators.AsofJoin.lastValue(
        purchases, touches, Seq("user_id"), "ts_us", Seq("touch_type"),
        tolerance = Some(7L * 86400L * 1000000L))
        .groupBy(coalesce(col("touch_type"), lit("none")).as("touch_type"))
        .agg(count(lit(1)).as("n_purchases"),
          sum("cents").as("cents_total"))
    }),

    // Declarative data-quality expectations: seven rules over ONE scan
    // of events (pairs of observed/verdict aggregates in a single agg
    // row, exploded to report rows) plus a referential-integrity check
    // over the anti-join frame. Reports instead of aborting — the
    // quarantine-a-batch admission gate; the report itself is the
    // oracled result.
    "q141_expectations" -> ((s, d) => {
      import graft.operators.Expectations
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), expr("ts div 86400000000000").as("day"),
        col("value"), round(col("value") * 100, 0).cast("long").as("cents"))
      val nNullV = sum(when(col("value").isNull, 1L).otherwise(0L))
      val nRange =
        sum(when(col("cents") < 1 || col("cents") > 50000, 1L).otherwise(0L))
      val nDom = sum(when(!col("event_type").isin(
        "click", "view", "purchase", "signup", "error"), 1L).otherwise(0L))
      val base = Expectations.evaluate(e, Seq(
        ("row_count_positive", count(lit(1)), count(lit(1)) > 0),
        ("event_id_unique", count(lit(1)) - countDistinct(col("event_id")),
          count(lit(1)) === countDistinct(col("event_id"))),
        ("value_nonnull", nNullV, nNullV === 0),
        ("value_in_range", nRange, nRange === 0),
        ("type_domain", nDom, nDom === 0),
        ("type_cardinality", countDistinct(col("event_type")),
          countDistinct(col("event_type")) === 5),
        ("day_span_month", max("day") - min("day"),
          max("day") - min("day") === 29)))
      val orphans = e.join(
        Tables.customer(s, d).select(col("c_custkey")),
        col("user_id") === col("c_custkey"), "left_anti")
      base.unionByName(Expectations.evaluate(orphans, Seq(
        ("user_ref_integrity", count(lit(1)), count(lit(1)) === 0))))
    }),

    // Calendar completeness: per-day counts joined against the FULL
    // min..max day range (absent days surface as n=0 — a groupBy alone
    // can never show them); a day passes at >= half the mean daily
    // count, cross-multiplied in integers.
    "q142_completeness" -> ((s, d) =>
      graft.operators.Expectations.dailyCompleteness(
        Tables.events(s, d),
        expr("ts div 86400000000000"), fracNum = 1, fracDen = 2)),

    // Edit-distance-1 fuzzy join (EditDistance.fuzzyPairs): deletion-
    // neighborhood blocking (FastSS/SymSpell) over a noisy-name
    // universe — part names with a digit suffix plus three planted
    // typo classes (delete 3rd char / substitute 4th / insert after
    // 4th), derived by identical integer-cased string arithmetic on
    // both engines. Candidates are linear in vocabulary bytes; the
    // oracle is the quadratic all-pairs under the sound ±1 length
    // band that distance <= 1 implies.
    "q168_fuzzy_join" -> ((s, d) => {
      val base = concat(col("p_name"), lit(" "),
        (col("p_partkey") % 10).cast("string"))
      val m = col("p_partkey") % 11
      val noisy = when(m === 0,
          concat(base.substr(lit(1), lit(2)), base.substr(lit(4), lit(1000))))
        .when(m === 1,
          concat(base.substr(lit(1), lit(3)), lit("x"),
            base.substr(lit(5), lit(1000))))
        .when(m === 2,
          concat(base.substr(lit(1), lit(4)), lit("q"),
            base.substr(lit(5), lit(1000))))
        .otherwise(base)
      graft.operators.EditDistance.fuzzyPairs(
        Tables.part(s, d).select(noisy.as("noisy")), "noisy")
    }),

    // k-anonymity ladder (Anonymize.kAnonymityLevels): level 0 =
    // (nation, segment, 500-wide balance bucket), level 1 = (nation,
    // 2000-wide bucket), else suppressed; k = 4, local recode (level-1
    // counts only the rows level 0 rejected, so the count IS the
    // published group size). The input pre-partitions on the shared
    // `nation` prefix so both window passes reuse one exchange. All
    // three outcomes live at both scales (29/1441/30 rows at sf0.01).
    "q169_kanonymity" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("b0", floor(col("c_acctbal") / 500))
        .withColumn("b1", floor(col("c_acctbal") / 2000))
        .repartition(col("c_nationkey"))
      graft.operators.Anonymize.kAnonymityLevels(c, k = 4,
        Seq(Seq(col("c_nationkey"), col("c_mktsegment"), col("b0")),
          Seq(col("c_nationkey"), col("b1"))))
        .select(col("c_custkey"), col("gen_level"),
          when(col("gen_level") < 2, col("c_nationkey").cast("long"))
            .as("qi_nation"),
          when(col("gen_level") === 0, col("c_mktsegment"))
            .as("qi_segment"),
          when(col("gen_level") === 0, col("b0") * 500)
            .when(col("gen_level") === 1, col("b1") * 2000)
            .as("qi_bal_lo"),
          when(col("gen_level") === 0, 500L)
            .when(col("gen_level") === 1, 2000L)
            .cast("long").as("qi_bal_w"))
    }),

    // Exact integer EWMA features (RobustStats.ewmaFeatures): α = 1/2
    // over a trailing 16-row lookback per user — dyadic weights make
    // the weighted sum exact in longs, head truncation renormalizes
    // against the weights actually present, and the single division is
    // micro-scaled integer div. One user exchange; 16 lag terms inside
    // one codegen'd window stage.
    "q177_ewma" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.RobustStats.ewmaFeatures(
        e, Seq("user_id"), Seq(col("ts"), col("event_id")), "cents")
        .select("user_id", "event_id", "cents", "ws", "wt", "ewma_micro")
    }),

    // MAD outlier report (RobustStats.madOutliers): per-user purchase
    // cents, lower-median + MAD under deterministic (value, id) ranks,
    // flag |x − med| > 2·mad — all exact longs (k = 2: a uniform value
    // distribution has max dev ≈ 2·MAD, so the 3σ-style k = 3 would
    // flag nothing anywhere; k = 2 splits the tail — 142/8 users with
    // and without outliers at sf0.01).
    "q180_mad" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.RobustStats.madOutliers(
        e, Seq("user_id"), "cents", "event_id", kNum = 2, kDen = 1)
    }),

    // l-diversity (Anonymize.lDiversity) over a k-anonymous release: the
    // q169 ladder WITHOUT segment in the QI (segment is the sensitive
    // attribute here), published groups must carry >= 3 distinct
    // segments or the homogeneity attack reads them off. One group
    // aggregate over the published frame; the ladder reuses the shared
    // `nation` prefix exchange.
    "q182_ldiversity" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("b0", floor(col("c_acctbal") / 500))
        .withColumn("b1", floor(col("c_acctbal") / 2000))
        .repartition(col("c_nationkey"))
      val pub = graft.operators.Anonymize.kAnonymityLevels(c, k = 4,
        Seq(Seq(col("c_nationkey"), col("b0")),
          Seq(col("c_nationkey"), col("b1"))))
        .filter(col("gen_level") < 2)
        .select(col("gen_level"),
          col("c_nationkey").cast("long").as("qi_nation"),
          when(col("gen_level") === 0, col("b0") * 500)
            .otherwise(col("b1") * 2000).cast("long").as("qi_bal_lo"),
          when(col("gen_level") === 0, 500L).otherwise(2000L)
            .cast("long").as("qi_bal_w"),
          col("c_mktsegment"))
      graft.operators.Anonymize.lDiversity(pub,
        Seq(col("gen_level"), col("qi_nation"), col("qi_bal_lo"),
          col("qi_bal_w")),
        col("c_mktsegment"), l = 3)
    }),

    // Robust feature scaling (RobustStats.robustScale): per-DIMENSION
    // median/IQR scaling of the embedding components (quantized to
    // exact longs, the q145 discipline), scaled_micro = (q−med)·1e6 div
    // iqr — integer-exact including negative deviations (Spark div and
    // DuckDB // both truncate toward zero). One window pass per dim
    // exchange; bounds key-sized.
    "q185_robust_scale" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("long").as("dim"),
          round((col("col").cast("double") + lit(1.0)) * 1000000)
            .cast("long").as("q"))
      graft.operators.RobustStats.robustScale(
        e, Seq("dim"), "q", "vec_id")
        .select("dim", "vec_id", "q", "med", "q1", "q3", "iqr",
          "scaled_micro")
    }),

    // Window-function breadth over the per-customer order sequence:
    // percent_rank / cume_dist / ntile / nth_value / frame-bounded
    // last_value in ONE window pass (all six share the customer
    // exchange and sort). The unique (date, key) order makes rank =
    // row_number, so the rank ratios are the exact same small-integer
    // divisions in both engines.
    "q189_window_breadth" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        last_value(col("o_totalprice")).over(wAll).as("last_price"))
    }),

    // 2-D skyline per brand (Skyline.skyline2D): the Pareto frontier
    // of (price minimized, size maximized) within each brand — two
    // window maxima over one group exchange, no pair join. Exact
    // integer dominance; duplicate points stay on the frontier.
    "q192_skyline" -> ((s, d) =>
      graft.operators.Skyline.skyline2D(
        Tables.part(s, d).select(col("p_partkey"), col("p_brand"),
          round(col("p_retailprice") * 100, 0).cast("long")
            .as("price_cents"),
          col("p_size").cast("long").as("size")),
        Seq(col("p_brand")), "price_cents", "size")),

    // Per-user purchase trend (RobustStats.groupTrend): OLS slope of
    // cents on day index from five exact integer moments, one
    // DECIMAL(38,0) integral division to micro units (the q131
    // discipline for regression). Day index is corpus-relative via a
    // broadcast scalar (J5), so x stays small and both engines cut
    // identically.
    "q193_trend" -> ((s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val m = p.agg(min("day").as("day0"))
      val px = p.crossJoin(broadcast(m))
        .select(col("user_id"), (col("day") - col("day0")).as("x"),
          col("cents").as("y"))
      graft.operators.RobustStats.groupTrend(px, Seq("user_id"), "x", "y")
    }),

    // VARIANT ingestion (Spark 4's semi-structured type): parse_json →
    // try_variant_get typed extraction, then the q115 aggregate — the
    // modern path for schema-on-read JSON columns (shredded storage,
    // no inference scan, malformed rows null out instead of failing).
    "q194_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          try_variant_get(parse_json(col("props")), "$.k", "int")
            .as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          count_distinct(col("k")).as("n_k"))),

    // Explicit GROUPING SETS — the arbitrary-sets member of the q46
    // rollup / q127 cube family: per-status, per-priority, and grand
    // totals in ONE pass (no self-union re-scan), grouping_id
    // disambiguating real nulls from subtotal rows.
    "q195_grouping_sets" -> ((s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
            Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"), col("total"))),

    // Activity bitmaps (Cohort.activityBitmap): 60 days of per-user
    // activity packed into ONE long by a partial-aggregatable bit_or —
    // active days, week-over-week retention, and weekday mix all
    // answer by shift/AND/popcount on 8 bytes per user, never
    // re-touching the event table. Day index is corpus-relative via
    // the broadcast scalar (J5).
    "q199_activity_bitmap" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val m = e.agg(min("day").as("day0"))
      val idx = e.crossJoin(broadcast(m))
        .select(col("user_id"), (col("day") - col("day0")).as("day"))
      graft.operators.Cohort.activityBitmap(idx, "user_id", "day")
        .withColumnRenamed("user", "user_id")
    }),

    // RFM segmentation (Cohort.rfmSegments): recency/frequency/monetary
    // quintile scores via the closed-form ntile (quantileBins — no
    // global window), combined into the 3-digit segment code. One user
    // aggregate + three bounded index passes.
    "q204_rfm" -> ((s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Cohort.rfmSegments(p, "user_id", "day", "cents")
        .withColumnRenamed("user", "user_id")
    }),

    // Day-of-week seasonality profile (Cohort.weekdayProfile): per-dow
    // purchase volume and the exact deviation-from-mean in bps decided
    // in DECIMAL(38,0) cross-multiplication. Two tiny aggregates.
    "q205_dow_profile" -> ((s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Cohort.weekdayProfile(p, "day", "cents")
    }),

    // Curation scorecard: token-length band + stopword rate + q179's
    // top-2-gram repetition, fused into one per-doc verdict via the
    // streaming-safe rowGate (reasons in declaration order) — the
    // single-pass quality gate a curation pipeline actually ships.
    "q208_scorecard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rep = graft.operators.Frequency.gopherRepetition(
        docs, "doc_id", "text", dupN = 3).select("doc_id", "top2_bps")
      val base = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.stopwordCount(col("text")).cast("long").as("sw"))
      val joined = base.join(rep, "doc_id")
        .withColumn("stop_bps", expr("sw * 10000 div n_tokens"))
        .drop("sw")
      graft.operators.Expectations.rowGate(joined, Seq(
        "len_range" -> (col("n_tokens") >= 25 && col("n_tokens") <= 70),
        "stopword" -> (col("stop_bps") <= 800),
        "repetition" -> (col("top2_bps") <= 2000)))
    }),

    // Timestamp delta encoding (Packing.deltaEncode): each user's
    // event-second series as base + comma-joined deltas with the
    // span = sum(deltas) reconstruction certificate — the time-series
    // storage layout, assembled by one collect-sort aggregate.
    "q210_delta_encode" -> ((s, d) =>
      graft.operators.Packing.deltaEncode(
        Tables.events(s, d)
          .select(col("user_id"), expr("ts div 1000000000").as("sec")),
        Seq("user_id"), "sec")),

    // Linear multi-touch attribution (AsofJoin.linearAttribution):
    // q140's window, equal-split credits in EXACT micro units — div
    // per touch, remainder to the latest touch, so per-type totals
    // conserve each purchase to the micro (the integer promise float
    // splitting cannot make). No-touch purchases credit 'none' whole.
    "q215_linear_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val touches = ev
        .filter(col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts_us")
        .agg(max(struct(col("event_id"), col("event_type"))).as("m"))
        .select(col("user_id"), col("ts_us"),
          col("m.event_type").as("touch_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts_us", "event_id", "cents")
      graft.operators.AsofJoin.linearAttribution(purchases, touches,
        Seq("user_id"), "ts_us", "touch_type", "cents",
        toleranceUs = 7L * 86400L * 1000000L)
    }),

    // Peak concurrency (the sweep-line classic): 30-min-gap sessions
    // per user, ±1 boundary deltas, EXACT running concurrency via the
    // range-partitioned globalCumSum (no single-partition window), the
    // earliest instant attaining the maximum. One row out.
    "q217_peak_concurrency" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("ts div 1000000000").as("sec"))
      val w = Window.partitionBy("user_id").orderBy("sec")
      val sess = e.withColumn("prev", lag(col("sec"), 1).over(w))
        .withColumn("new_s",
          (col("prev").isNull || col("sec") - col("prev") > 1800)
            .cast("long"))
        .withColumn("sid", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("sec").as("start"), max("sec").as("end"))
      val deltas = sess.select(col("start").as("sec"), lit(1L).as("d"))
        .unionAll(sess.select((col("end") + 1).as("sec"),
          lit(-1L).as("d")))
        .groupBy("sec").agg(sum("d").as("d"))
      // globalCumSum is an EXCLUSIVE prefix (offset semantics, its
      // q76 contract) — concurrency AT the instant includes the
      // instant's own delta, so add it back
      val cum = graft.operators.Packing.globalCumSum(
          deltas, "conc0", col("d"), col("sec"))
        .withColumn("conc", col("conc0") + col("d"))
      val peak = cum.agg(max("conc").as("peak"))
      cum.crossJoin(broadcast(peak)).filter(col("conc") === col("peak"))
        .agg(min("sec").as("at_sec"), max(col("peak")).as("peak"))
    }),

    // Conversion-latency percentiles: q123's completed funnels, time
    // from first view to purchase, exact p50/p95 seconds per
    // first-touch-day cohort (keyed percentile windows — never a
    // global one). The SLA report on top of the funnel operator.
    "q218_funnel_latency" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), expr("ts div 1000").as("ts_us"))
      val f = graft.operators.Funnel.earliestCompletion(ev, "user_id",
        "event_type", "ts_us", Seq("view", "click", "purchase"),
        window = Some(24L * 3600L * 1000000L))
      val lat = f.filter(col("n_stages") === 3)
        .select(col("user_id"),
          expr("t0 div 86400000000").as("day"),
          expr("(t2 - t0) div 1000000").as("lat"))
      graft.operators.RobustStats.groupPercentiles(
        lat, Seq("day"), "lat", "user_id", Seq((1, 2), (19, 20)))
    }),

    // Per-column null-rate profile (Expectations.nullProfile): ONE
    // scan, paired conditional aggregates exploded to report rows;
    // deterministic null injection keeps zero / low / high arms live.
    "q223_null_profile" -> ((s, d) =>
      graft.operators.Expectations.nullProfile(
        Tables.events(s, d).select(col("event_type"),
          when(pmod(col("event_id"), lit(7L)) === 0, lit(null))
            .otherwise(col("value")).as("value_n"),
          when(pmod(col("event_id"), lit(11L)) === 0, lit(null))
            .otherwise(col("props")).as("props_n")),
        Seq("event_type", "value_n", "props_n"))),

    // Key-skew report (Salting.skewReport): the diagnosis before a
    // salt factor — token frequencies are the canonical hot-key case
    // (stopwords own the corpus). TakeOrdered top-10, never a global
    // key funnel.
    "q224_skew_report" -> ((s, d) =>
      graft.operators.Salting.skewReport(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(length(col("token")) > 0),
        "token", k = 10)),

    // Contingency cross-tab with exact per-cell chi-square micro
    // contributions (Frequency.contingencyChi2): event type x day of
    // week — the global association report behind q149's per-token cut.
    "q225_crosstab_chi2" -> ((s, d) =>
      graft.operators.Frequency.contingencyChi2(
        Tables.events(s, d).select(col("event_type"),
          pmod(expr("ts div 86400000000000"), lit(7L)).as("dow")),
        "event_type", "dow")),

    // Exact two-proportion A/B test (Experiment.twoProportionTest):
    // z² >= 1.96² decided by DECIMAL cross-multiplication — no sqrt,
    // no float. Three user cohorts: va = even users (random half),
    // vb/vc = odd users split by engagement (< / >= 67 events), with
    // conversion = 14+ purchases; engagement correlates with
    // conversion, so (vb, vc) is significant at every scale, while
    // (va, vd) — two random halves of the even users — draws from ONE
    // distribution and can never become significant at any sample
    // size: both verdict arms live at every sf by construction.
    "q226_ab_test" -> ((s, d) => {
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("ne"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .select(
          when(pmod(col("user_id"), lit(4L)) === 0, lit("va"))
            .when(pmod(col("user_id"), lit(4L)) === 2, lit("vd"))
            .when(col("ne") < 67, lit("vb"))
            .otherwise(lit("vc")).as("variant"),
          (col("np") >= 14).as("converted"))
      graft.operators.Experiment.twoProportionTest(
        u, "variant", col("converted"))
    }),

    // Binned quantile normalization (Distribution.quantileNormalize):
    // per-source ntile(10) over (n_chars, doc_id), normalized value =
    // global bin mean — the unequal-group-size-safe discretized form of
    // microarray quantile norm. Windows run per source; the bin
    // reference is a 10-row broadcast.
    "q228_quantile_norm" -> ((s, d) =>
      graft.operators.Distribution.quantileNormalize(
        Tables.documents(s, d), "source", "doc_id", "n_chars", bins = 10)),

    // Mutual information lang<->source (Distribution.mutualInformation):
    // population MI in nats + marginal entropies + arithmetic-mean NMI,
    // all p·ln(p) terms over exact integer-count rationals, domain-sized
    // frames only after the first aggregate.
    "q229_mutual_info" -> ((s, d) =>
      graft.operators.Distribution.mutualInformation(
        Tables.documents(s, d), "lang", "source")),

    // Exact two-sample Kolmogorov-Smirnov (Distribution.ksTest):
    // purchase vs click value distributions in integer cents; D's
    // numerator max|c1·n2−c2·n1| is exact, the α=0.05 cut is the
    // squared/cross-multiplied DECIMAL(38,0) decision (c² = 1.844164).
    "q230_ks_test" -> ((s, d) =>
      graft.operators.Distribution.ksTest(
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
            col("event_type")),
        "cents", col("event_type") === "purchase")),

    // Source-concentration per lang (Distribution.concentration): Gini
    // via the exact rank identity + Herfindahl index over n_chars mass
    // — integer sums, two rationals, round 6.
    "q231_concentration" -> ((s, d) =>
      graft.operators.Distribution.concentration(
        Tables.documents(s, d), "lang", "source", "n_chars")),

    // IPF raking of the lang×source table to uniform marginals
    // (Distribution.ipfBalance, 3 alternating scalings; oracle unrolls
    // the same rounds as CTEs). Corpus scanned once; loop is O(cells).
    "q234_ipf_balance" -> ((s, d) =>
      graft.operators.Distribution.ipfBalance(
        Tables.documents(s, d), "lang", "source", iters = 3)),

    // Least-squares changepoint on the daily purchase series
    // (RobustStats.changepoint): variance-reduction argmax over the
    // day domain, exact DECIMAL numerator, one double division per
    // candidate split — engine-identical candidate order.
    "q236_changepoint" -> ((s, d) =>
      graft.operators.RobustStats.changepoint(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(expr("ts div 86400000000000").as("day"),
            expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents")),
        "day", "cents")),

    // Kaplan-Meier retention (Survival.kaplanMeier): duration = days
    // from a user's first event to its first high-value purchase
    // (death, value > 200 — ~20% of users, both arms live at every sf)
    // or to its last event (right-censored). Exact integer d/n per
    // death time; survival via exp(Σ ln) over the duration domain.
    "q237_kaplan_meier" -> ((s, d) => {
      val day = expr("ts div 86400000000000")
      val ev = Tables.events(s, d)
      val fe = ev.groupBy("user_id")
        .agg(min(day).as("f"), max(day).as("l"))
      val dth = ev
        .filter(col("event_type") === "purchase" && col("value") > 200)
        .groupBy("user_id").agg(min(day).as("dday"))
      val lives = fe.join(dth, Seq("user_id"), "left")
        .select(
          when(col("dday").isNotNull, col("dday") - col("f"))
            .otherwise(col("l") - col("f")).as("dur"),
          col("dday").isNotNull.as("died"))
      graft.operators.Survival.kaplanMeier(lives, "dur", "died")
    }),

    // Benford first-digit audit (Expectations.benfordAudit) over the
    // purchase cents column: observed leading-digit counts vs
    // log10(1+1/d) with exact chi-square contributions — the
    // fabricated-data / unit-mix-up screen.
    "q239_benford" -> ((s, d) =>
      graft.operators.Expectations.benfordAudit(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(expr("CAST(round(value * 100, 0) AS BIGINT)")
            .as("cents")),
        "cents")),

    // Autocorrelation of the daily purchase series at lags 1..7
    // (RobustStats.autocorrelation): DECIMAL-exact Pearson sums over
    // the densely re-indexed day domain, one double division per lag.
    "q240_acf" -> ((s, d) =>
      graft.operators.RobustStats.autocorrelation(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(expr("ts div 86400000000000").as("day"),
            expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents")),
        "day", "cents", maxLag = 7)),

    // Theil-Sen robust trend of the daily purchase series
    // (RobustStats.theilSen): lower median of all pairwise slopes under
    // the deterministic (slope, x1, x2) order; the reported figure is
    // the chosen pair's EXACT micro-slope integer division.
    "q241_theil_sen" -> ((s, d) =>
      graft.operators.RobustStats.theilSen(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(expr("ts div 86400000000000").as("day"),
            expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents")),
        "day", "cents")),

    // Exact Mann-Whitney U purchase vs click (Distribution.mannWhitney):
    // doubled tie-averaged rank sums are integers, the tie-corrected
    // normal cut is one DECIMAL(38,0) inequality — the rank-based
    // sibling of q230's KS.
    "q242_mann_whitney" -> ((s, d) =>
      graft.operators.Distribution.mannWhitney(
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
            col("event_type")),
        "cents", col("event_type") === "purchase")),
  )

  val oracles: Map[String, String] = Map(

    // The same greedy-earliest chain: each stage a conditional min after
    // an equi-join on the previous stage's time, stalls kept by the
    // final left joins.
    "q123_funnel" ->
      (s"""WITH $sqlFunnelCtes
        |SELECT f0.user_id, f0.t0, f1.t1, f2.t2,
        |  1 + CAST(f1.t1 IS NOT NULL AS BIGINT)
        |    + CAST(f2.t2 IS NOT NULL AS BIGINT) AS n_stages
        |FROM f0 LEFT JOIN f1 USING (user_id)
        |  LEFT JOIN f2 USING (user_id)""").stripMargin,

    // The identical integer-week retention matrix.
    "q125_cohort" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 86400000000 AS bucket
        |  FROM events WHERE event_type = 'purchase'),
        |fst AS (SELECT u, min(bucket) AS cohort FROM active GROUP BY u),
        |sizes AS (SELECT cohort, count(*) AS cohort_size FROM fst
        |          GROUP BY cohort)
        |SELECT f.cohort, a.bucket - f.cohort AS bucket_offset,
        |  count(DISTINCT a.u) AS n_active, s.cohort_size
        |FROM active a JOIN fst f USING (u)
        |JOIN sizes s ON s.cohort = f.cohort
        |GROUP BY f.cohort, a.bucket - f.cohort, s.cohort_size""".stripMargin,

    // Identical hold-until-next integer arithmetic; one final division.
    "q130_time_weighted" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (
        |  SELECT user_id, ts_us, cents,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |      AS next_ts
        |  FROM p)
        |SELECT user_id, count(*) AS n_holds,
        |  CAST(sum((next_ts - ts_us) * cents) AS BIGINT) AS weighted_sum,
        |  CAST(sum(next_ts - ts_us) AS BIGINT) AS span_us,
        |  round(CAST(sum((next_ts - ts_us) * cents) AS DOUBLE)
        |    / sum(next_ts - ts_us), 6) AS twa_cents
        |FROM h WHERE next_ts IS NOT NULL
        |GROUP BY user_id""".stripMargin,

    // The same exact integer moments assembled with the same one-shot
    // double expression (each op correctly rounded once — engine-exact).
    "q131_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM (SELECT l_returnflag,
        |      CAST(l_quantity AS BIGINT) AS x,
        |      CAST(round(l_extendedprice, 0) AS BIGINT) AS y
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr6
        |FROM m""".stripMargin,

    // Identical cross-multiplied integer flag — no sqrt on either side.
    "q133_outliers" ->
      """WITH p AS (
        |  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT user_id, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sx,
        |    CAST(sum(cents * cents) AS BIGINT) AS sxx
        |  FROM p GROUP BY user_id),
        |f AS (
        |  SELECT p.user_id, cents, n,
        |    CASE WHEN (n * cents - sx) * (n * cents - sx)
        |        > 4 * (n * sxx - sx * sx) THEN 1 ELSE 0 END AS flag
        |  FROM p JOIN m USING (user_id))
        |SELECT user_id, max(n) AS n,
        |  CAST(sum(flag) AS BIGINT) AS n_outliers,
        |  CAST(sum(CASE WHEN flag = 1 THEN cents END) AS BIGINT)
        |    AS outlier_total
        |FROM f GROUP BY user_id""".stripMargin,

    // Same exact ranks (ceil(p*n) as integer div), same clip, same
    // one-division average.
    "q134_winsorize" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS gn
        |  FROM e),
        |b AS (
        |  SELECT event_type,
        |    min(CASE WHEN rn = greatest(1, (gn * 5 + 99) // 100)
        |      THEN cents END) AS lo,
        |    min(CASE WHEN rn = greatest(1, (gn * 95 + 99) // 100)
        |      THEN cents END) AS hi
        |  FROM r GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n, max(lo) AS lo, max(hi) AS hi,
        |  CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT) AS w_total,
        |  CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  round(CAST(sum(least(greatest(cents, lo), hi)) AS DOUBLE)
        |    / count(*), 6) AS w_avg6
        |FROM e JOIN b USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    // Latest-non-null per column under the same (ts_us, event_id) total
    // order, via IGNORE NULLS frame-end window (the q111 device).
    "q136_golden" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100, 0) AS BIGINT) END
        |      AS purchase_cents,
        |    CASE WHEN event_type = 'view'
        |      THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS view_k,
        |    CASE WHEN event_type = 'error' THEN event_id END AS error_event
        |  FROM events)
        |SELECT DISTINCT user_id,
        |  last_value(purchase_cents IGNORE NULLS) OVER w AS purchase_cents,
        |  last_value(view_k IGNORE NULLS) OVER w AS view_k,
        |  last_value(error_event IGNORE NULLS) OVER w AS error_event
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin,

    // The at-or-before + 7-day bound re-expressed as a range join with
    // arg_max (latest-touch pick over unique (user, ts) touches);
    // touch dedup mirrors the struct-max (event_id first).
    "q140_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |t0 AS (
        |  SELECT user_id, ts_us, event_id, event_type FROM ev
        |  WHERE event_type IN ('click', 'view')),
        |t AS (
        |  SELECT user_id, ts_us, arg_max(event_type, event_id)
        |    AS touch_type
        |  FROM t0 GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, ts_us, event_id, cents FROM ev
        |  WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT p.event_id AS pid, any_value(p.cents) AS cents,
        |    arg_max(t.touch_type, t.ts_us) AS touch_type
        |  FROM p LEFT JOIN t ON t.user_id = p.user_id
        |    AND t.ts_us <= p.ts_us
        |    AND p.ts_us - t.ts_us <= 604800000000
        |  GROUP BY p.event_id)
        |SELECT coalesce(touch_type, 'none') AS touch_type,
        |  count(*) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS cents_total
        |FROM m GROUP BY 1""".stripMargin,

    // The same seven single-scan rules + the anti-join referential
    // check, as a UNION ALL of scalar report rows.
    "q141_expectations" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_ns(ts) // 86400000000000 AS d, value,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT count(*) AS n, count(DISTINCT event_id) AS nid,
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nnull,
        |    CAST(sum(CASE WHEN cents < 1 OR cents > 50000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nrange,
        |    CAST(sum(CASE WHEN event_type NOT IN
        |      ('click', 'view', 'purchase', 'signup', 'error')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ndom,
        |    count(DISTINCT event_type) AS ntypes,
        |    max(d) - min(d) AS dspan
        |  FROM e),
        |o AS (
        |  SELECT count(*) AS orphans FROM e
        |  LEFT JOIN customer c ON e.user_id = c.c_custkey
        |  WHERE c.c_custkey IS NULL)
        |SELECT 'row_count_positive' AS check_name, n AS observed,
        |  CAST(n > 0 AS BIGINT) AS passed FROM m
        |UNION ALL SELECT 'event_id_unique', n - nid,
        |  CAST(n = nid AS BIGINT) FROM m
        |UNION ALL SELECT 'value_nonnull', nnull,
        |  CAST(nnull = 0 AS BIGINT) FROM m
        |UNION ALL SELECT 'value_in_range', nrange,
        |  CAST(nrange = 0 AS BIGINT) FROM m
        |UNION ALL SELECT 'type_domain', ndom,
        |  CAST(ndom = 0 AS BIGINT) FROM m
        |UNION ALL SELECT 'type_cardinality', ntypes,
        |  CAST(ntypes = 5 AS BIGINT) FROM m
        |UNION ALL SELECT 'day_span_month', dspan,
        |  CAST(dspan = 29 AS BIGINT) FROM m
        |UNION ALL SELECT 'user_ref_integrity', orphans,
        |  CAST(orphans = 0 AS BIGINT) FROM o""".stripMargin,

    // Quadratic all-pairs under the SOUND ±1 length band (Levenshtein
    // distance <= 1 implies |len(a)-len(b)| <= 1) — no blocking
    // assumption shared with the Spark side's deletion-neighborhood
    // join; identical noisy-name derivation.
    "q168_fuzzy_join" ->
      """WITH b AS (
        |  SELECT p_name || ' ' || CAST(p_partkey % 10 AS VARCHAR) AS base,
        |    p_partkey % 11 AS m FROM part),
        |u AS (SELECT DISTINCT CASE
        |    WHEN m = 0 THEN substr(base, 1, 2) || substr(base, 4, 1000)
        |    WHEN m = 1 THEN substr(base, 1, 3) || 'x' || substr(base, 5, 1000)
        |    WHEN m = 2 THEN substr(base, 1, 4) || 'q' || substr(base, 5, 1000)
        |    ELSE base END AS s FROM b)
        |SELECT a.s AS name_a, b2.s AS name_b,
        |  CAST(levenshtein(a.s, b2.s) AS BIGINT) AS dist
        |FROM u a JOIN u b2
        |  ON a.s < b2.s AND abs(len(a.s) - len(b2.s)) <= 1
        |WHERE levenshtein(a.s, b2.s) <= 1""".stripMargin,

    // The same local-recode ladder as two window passes: level-1
    // counts only the rows level 0 rejected (FILTER c0 < k), so the
    // count is the published group size.
    "q169_kanonymity" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 500) AS BIGINT) AS b0,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS b1
        |  FROM customer),
        |l0 AS (SELECT *, count(*) OVER
        |  (PARTITION BY c_nationkey, c_mktsegment, b0) AS c0 FROM c),
        |l1 AS (SELECT *, count(*) FILTER (WHERE c0 < 4) OVER
        |  (PARTITION BY c_nationkey, b1) AS c1 FROM l0),
        |lv AS (SELECT *, CASE WHEN c0 >= 4 THEN 0
        |  WHEN c1 >= 4 THEN 1 ELSE 2 END AS gen_level FROM l1)
        |SELECT c_custkey, CAST(gen_level AS BIGINT) AS gen_level,
        |  CASE WHEN gen_level < 2 THEN CAST(c_nationkey AS BIGINT) END
        |    AS qi_nation,
        |  CASE WHEN gen_level = 0 THEN c_mktsegment END AS qi_segment,
        |  CASE WHEN gen_level = 0 THEN b0 * 500
        |    WHEN gen_level = 1 THEN b1 * 2000 END AS qi_bal_lo,
        |  CAST(CASE WHEN gen_level = 0 THEN 500
        |    WHEN gen_level = 1 THEN 2000 END AS BIGINT) AS qi_bal_w
        |FROM lv""".stripMargin,

    // The identical 16-term dyadic lag sum (terms generated, not
    // hand-kept) and the one micro-scaled integer division.
    "q177_ewma" -> {
      val ws = (0 until 16).map { j =>
        s"coalesce(lag(cents, $j) OVER w * ${1L << (15 - j)}, 0)"
      }.mkString("\n      + ")
      val wt = (0 until 16).map { j =>
        s"CASE WHEN lag(cents, $j) OVER w IS NOT NULL THEN ${1L << (15 - j)} ELSE 0 END"
      }.mkString("\n      + ")
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) AS tsn,
         |    CAST(round(value * 100, 0) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |r AS (
         |  SELECT user_id, event_id, cents,
         |    CAST($ws AS BIGINT) AS ws,
         |    CAST($wt AS BIGINT) AS wt
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id))
         |SELECT user_id, event_id, cents, ws, wt,
         |  (ws * 1000000) // wt AS ewma_micro
         |FROM r""".stripMargin
    },

    // The identical two lower-median rank extractions ((gn+1)//2 under
    // (value, id) / (dev, id) orders) and the cross-multiplied flag.
    "q180_mad" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |r1 AS (
        |  SELECT *, row_number() OVER
        |      (PARTITION BY user_id ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS gn FROM e),
        |m AS (SELECT user_id, cents AS med FROM r1 WHERE rn = (gn + 1) // 2),
        |dv AS (
        |  SELECT e.user_id, e.event_id, e.cents, m.med,
        |    abs(e.cents - m.med) AS dev
        |  FROM e JOIN m USING (user_id)),
        |r2 AS (
        |  SELECT *, row_number() OVER
        |      (PARTITION BY user_id ORDER BY dev, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS gn FROM dv),
        |md AS (SELECT user_id, dev AS mad FROM r2 WHERE rn = (gn + 1) // 2)
        |SELECT d.user_id, count(*) AS n, max(d.med) AS med,
        |  max(md.mad) AS mad,
        |  CAST(sum(CASE WHEN d.dev > 2 * md.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  CAST(sum(CASE WHEN d.dev > 2 * md.mad THEN d.cents END)
        |    AS BIGINT) AS outlier_total
        |FROM dv d JOIN md USING (user_id)
        |GROUP BY d.user_id""".stripMargin,

    // The q169 local-recode ladder (segment NOT in the QI), published
    // levels only, then exact distinct-sensitive per group.
    "q182_ldiversity" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 500) AS BIGINT) AS b0,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS b1
        |  FROM customer),
        |l0 AS (SELECT *, count(*) OVER
        |  (PARTITION BY c_nationkey, b0) AS c0 FROM c),
        |l1 AS (SELECT *, count(*) FILTER (WHERE c0 < 4) OVER
        |  (PARTITION BY c_nationkey, b1) AS c1 FROM l0),
        |lv AS (SELECT *, CASE WHEN c0 >= 4 THEN 0
        |  WHEN c1 >= 4 THEN 1 ELSE 2 END AS gen_level FROM l1),
        |pub AS (
        |  SELECT CAST(gen_level AS BIGINT) AS gen_level,
        |    CAST(c_nationkey AS BIGINT) AS qi_nation,
        |    CASE WHEN gen_level = 0 THEN b0 * 500
        |      ELSE b1 * 2000 END AS qi_bal_lo,
        |    CAST(CASE WHEN gen_level = 0 THEN 500 ELSE 2000 END AS BIGINT)
        |      AS qi_bal_w,
        |    c_mktsegment
        |  FROM lv WHERE gen_level < 2)
        |SELECT gen_level, qi_nation, qi_bal_lo, qi_bal_w,
        |  count(*) AS n,
        |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
        |  count(DISTINCT c_mktsegment) >= 3 AS diverse
        |FROM pub GROUP BY 1, 2, 3, 4""".stripMargin,

    // The identical quantization, three disc-rank extractions, and the
    // toward-zero integer division.
    "q185_robust_scale" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(round((CAST(embedding[i] AS DOUBLE) + 1.0) * 1000000, 0)
        |      AS BIGINT) AS q
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)),
        |r AS (
        |  SELECT *, row_number() OVER
        |      (PARTITION BY dim ORDER BY q, vec_id) AS rn,
        |    count(*) OVER (PARTITION BY dim) AS gn FROM x),
        |b AS (
        |  SELECT dim,
        |    min(q) FILTER (rn = (gn + 1) // 2) AS med,
        |    min(q) FILTER (rn = (gn + 3) // 4) AS q1,
        |    min(q) FILTER (rn = (3 * gn + 3) // 4) AS q3
        |  FROM r
        |  WHERE rn = (gn + 1) // 2 OR rn = (gn + 3) // 4
        |    OR rn = (3 * gn + 3) // 4
        |  GROUP BY 1)
        |SELECT x.dim, x.vec_id, x.q, b.med, b.q1, b.q3,
        |  b.q3 - b.q1 AS iqr,
        |  CASE WHEN b.q3 - b.q1 > 0
        |    THEN ((x.q - b.med) * 1000000) // (b.q3 - b.q1)
        |    ELSE 0 END AS scaled_micro
        |FROM x JOIN b USING (dim)""".stripMargin,

    // The identical six window functions; rank = row_number under the
    // unique (date, key) order, so every ratio is the same
    // small-integer division.
    "q189_window_breadth" ->
      """SELECT o_orderkey, o_custkey,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  last_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)""".stripMargin,

    // The identical two-window dominance test (strict-x range frame +
    // same-x partition max).
    "q192_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand,
        |    CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part)
        |SELECT p_partkey, p_brand, price_cents, size,
        |  NOT (coalesce(max(size) OVER (PARTITION BY p_brand
        |      ORDER BY price_cents
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      >= size, FALSE)
        |    OR coalesce(max(size) OVER (PARTITION BY p_brand, price_cents)
        |      > size, FALSE)) AS on_frontier
        |FROM p""".stripMargin,

    // The identical five integer moments and HUGEINT integral division
    // to micro units; zero-variance x emits null.
    "q193_trend" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |d0 AS (SELECT min(day) AS day0 FROM p),
        |x AS (SELECT user_id, day - d0.day0 AS x, cents AS y FROM p, d0),
        |m AS (
        |  SELECT user_id, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM x GROUP BY 1)
        |SELECT user_id, n, sx, sy, sxy, sxx,
        |  CASE WHEN n * sxx - sx * sx > 0 THEN
        |    CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
        |      * 1000000 // (CAST(n AS HUGEINT) * sxx
        |      - CAST(sx AS HUGEINT) * sx) AS BIGINT)
        |  END AS slope_micro
        |FROM m""".stripMargin,

    // Same aggregate as q115 — VARIANT extraction must agree with the
    // schema'd from_json path bit for bit.
    "q194_variant" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS INT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  count(DISTINCT k) AS n_k
        |FROM e GROUP BY event_type""".stripMargin,

    // generate_series twin of the sequence() day range; identical
    // integer cross-multiplied completeness verdict.
    "q142_completeness" ->
      """WITH c AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |span AS (
        |  SELECT min(day) AS d0, max(day) AS d1, sum(n) AS total,
        |    max(day) - min(day) + 1 AS n_days
        |  FROM c),
        |days AS (
        |  SELECT unnest(generate_series(d0, d1)) AS day, n_days, total
        |  FROM span)
        |SELECT days.day, coalesce(c.n, 0) AS n,
        |  CAST(coalesce(c.n, 0) * n_days * 2 >= total * 1 AS BIGINT)
        |    AS complete
        |FROM days LEFT JOIN c ON c.day = days.day""".stripMargin,

    // Same trailing-window list, same sort, same ceil(n/2) pick.
    "q138_rolling_median" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, day, cents,
        |    list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM daily)
        |SELECT user_id, day, cents,
        |  arr[(len(arr) + 1) // 2] AS med7
        |FROM r""".stripMargin,

    // The identical three grouping sets; gid = 2*GROUPING(status) +
    // GROUPING(priority), the q127 mapping.
    "q195_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(2 * GROUPING(o_orderstatus)
        |    + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |""".stripMargin,

    // The identical bit_or fold and popcount projections; the weekday
    // mask is the same plan-time constant.
    "q199_activity_bitmap" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |d0 AS (SELECT min(day) AS day0 FROM e),
        |idx AS (
        |  SELECT user_id, day - d0.day0 AS day FROM e, d0
        |  WHERE day - d0.day0 >= 0 AND day - d0.day0 < 60),
        |b AS (
        |  SELECT user_id,
        |    bit_or(CAST(1 AS BIGINT) << CAST(day AS INT)) AS bmp
        |  FROM idx GROUP BY 1)
        |SELECT user_id, bmp,
        |  CAST(bit_count(bmp) AS BIGINT) AS n_active_days,
        |  CAST(bit_count(bmp & (bmp >> 7)) AS BIGINT)
        |    AS wow_retained_days,
        |  CAST(bit_count(bmp & 1098452772105736095) AS BIGINT)
        |    AS n_weekdays
        |FROM b""".stripMargin,

    // ntile twins under the same (metric, user) total order; the bin
    // arithmetic is quantileBins' closed form of exactly ntile.
    "q204_rfm" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (
        |  SELECT user_id, max(day) AS last_day, count(*) AS f,
        |    CAST(sum(cents) AS BIGINT) AS m
        |  FROM p GROUP BY 1),
        |mx AS (SELECT max(last_day) AS cm FROM b),
        |w AS (SELECT user_id, mx.cm - last_day AS r, f, m FROM b, mx),
        |sc AS (
        |  SELECT user_id, r, f, m,
        |    CAST(ntile(5) OVER (ORDER BY r, user_id) AS BIGINT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY f, user_id) AS BIGINT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY m, user_id) AS BIGINT) AS m_score
        |  FROM w)
        |SELECT user_id, r, f, m, r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS segment
        |FROM sc""".stripMargin,

    // The identical per-dow aggregates and HUGEINT deviation cut.
    "q205_dow_profile" ->
      """WITH p AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT day % 7 AS dow, count(*) AS n,
        |        CAST(sum(cents) AS BIGINT) AS total
        |      FROM p GROUP BY 1),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS n_all,
        |        CAST(sum(total) AS BIGINT) AS t_all FROM d)
        |SELECT dow, n, total, total * 1000000 // n AS avg_micro,
        |  CAST((CAST(total AS HUGEINT) * a.n_all
        |    - CAST(a.t_all AS HUGEINT) * n) * 10000
        |    // (CAST(a.t_all AS HUGEINT) * n) AS BIGINT) AS dev_bps
        |FROM d, a""".stripMargin,

    // Token band + the q72 stopword occurrence idiom + q179's width-2
    // arg-max fragment, fused to the identical reasons string.
    "q208_scorecard" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(string_split(' ' || text || ' ', ' the ')) - 1
        |      + len(string_split(' ' || text || ' ', ' a ')) - 1
        |      AS BIGINT) AS sw,
        |    string_split(text, ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    array_to_string(toks[pos:pos + 1], ' ') AS gram
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(1, len(toks) + 1)) AS pos FROM base)
        |  WHERE pos + 1 <= len(toks)),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
        |t2 AS (
        |  SELECT doc_id, cnt * len(gram) AS chars FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY cnt DESC, gram DESC) AS rk FROM c)
        |  WHERE rk = 1),
        |j AS (
        |  SELECT b.doc_id, b.n_tokens,
        |    sw * 10000 // b.n_tokens AS stop_bps,
        |    coalesce(t2.chars, 0) * 10000 // b.n_chars AS top2_bps
        |  FROM base b LEFT JOIN t2 ON t2.doc_id = b.doc_id),
        |r AS (
        |  SELECT *, concat_ws(',',
        |    CASE WHEN NOT coalesce(n_tokens BETWEEN 25 AND 70, FALSE)
        |      THEN 'len_range' END,
        |    CASE WHEN NOT coalesce(stop_bps <= 800, FALSE)
        |      THEN 'stopword' END,
        |    CASE WHEN NOT coalesce(top2_bps <= 2000, FALSE)
        |      THEN 'repetition' END) AS reasons
        |  FROM j)
        |SELECT doc_id, n_tokens, top2_bps, stop_bps, reasons,
        |  reasons <> '' AS quarantined
        |FROM r""".stripMargin,

    // The identical sorted-multiset delta walk and span certificate.
    "q210_delta_encode" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 AS sec FROM events),
        |g AS (SELECT user_id, list_sort(list(sec)) AS vs
        |      FROM e GROUP BY 1)
        |SELECT user_id, vs[1] AS base, CAST(len(vs) AS BIGINT) AS n,
        |  vs[-1] - vs[1] AS span,
        |  array_to_string(list_transform(range(2, len(vs) + 1),
        |    i -> vs[i] - vs[i - 1]), ',') AS deltas
        |FROM g""".stripMargin,

    // The same range join, per-purchase count + latest rank, and the
    // div/mod conservation split.
    "q215_linear_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |t0 AS (
        |  SELECT user_id, ts_us, event_id, event_type FROM ev
        |  WHERE event_type IN ('click', 'view')),
        |t AS (
        |  SELECT user_id, ts_us, arg_max(event_type, event_id)
        |    AS touch_type
        |  FROM t0 GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, ts_us, event_id, cents FROM ev
        |  WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.event_id AS pid, p.cents, t.ts_us AS tts,
        |    t.touch_type
        |  FROM p LEFT JOIN t ON t.user_id = p.user_id
        |    AND t.ts_us <= p.ts_us
        |    AND p.ts_us - t.ts_us <= 604800000000),
        |c AS (
        |  SELECT *, count(touch_type) OVER (PARTITION BY pid) AS n,
        |    row_number() OVER (PARTITION BY pid ORDER BY tts DESC) AS rk
        |  FROM j),
        |cr AS (
        |  SELECT coalesce(touch_type, 'none') AS touch_type,
        |    CASE WHEN n = 0 THEN cents * 1000000
        |      ELSE cents * 1000000 // n
        |        + CASE WHEN rk = 1 THEN cents * 1000000 % n ELSE 0 END
        |    END AS credit
        |  FROM c)
        |SELECT touch_type, count(*) AS n_credits,
        |  CAST(sum(credit) AS BIGINT) AS credit_micro_total
        |FROM cr GROUP BY 1""".stripMargin,

    // The identical session sweep-line and earliest-peak pick.
    "q217_peak_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000000000 AS sec FROM events),
        |r AS (SELECT *, lag(sec) OVER (PARTITION BY user_id
        |        ORDER BY sec) AS prev FROM e),
        |s AS (SELECT *, sum(CASE WHEN prev IS NULL OR sec - prev > 1800
        |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |        ORDER BY sec ROWS UNBOUNDED PRECEDING) AS sid FROM r),
        |iv AS (SELECT user_id, sid, min(sec) AS st, max(sec) AS en
        |       FROM s GROUP BY 1, 2),
        |d AS (SELECT st AS sec, 1 AS d FROM iv
        |      UNION ALL SELECT en + 1, -1 FROM iv),
        |g AS (SELECT sec, sum(d) AS d FROM d GROUP BY 1),
        |cum AS (SELECT sec, sum(d) OVER
        |        (ORDER BY sec ROWS UNBOUNDED PRECEDING) AS conc FROM g),
        |p AS (SELECT max(conc) AS peak FROM cum)
        |SELECT CAST(min(sec) AS BIGINT) AS at_sec,
        |  CAST(max(p.peak) AS BIGINT) AS peak
        |FROM cum, p WHERE cum.conc = p.peak""".stripMargin,

    // q123's stage CTEs + the q212 disc-rank extraction per cohort day.
    "q218_funnel_latency" ->
      (s"""WITH $sqlFunnelCtes,
        |c AS (SELECT f0.user_id, f0.t0, f2.t2
        |      FROM f0 JOIN f1 USING (user_id) JOIN f2 USING (user_id)),
        |l AS (SELECT user_id, t0 // 86400000000 AS day,
        |        (t2 - t0) // 1000000 AS lat FROM c),
        |r AS (SELECT *, row_number() OVER (PARTITION BY day
        |        ORDER BY lat, user_id) AS rn,
        |      count(*) OVER (PARTITION BY day) AS gn FROM l)
        |SELECT day, max(gn) AS n,
        |  min(lat) FILTER (rn = greatest(1, (gn + 1) // 2)) AS p50,
        |  min(lat) FILTER (rn = greatest(1, (gn * 19 + 19) // 20)) AS p95
        |FROM r
        |WHERE rn = greatest(1, (gn + 1) // 2)
        |  OR rn = greatest(1, (gn * 19 + 19) // 20)
        |GROUP BY 1""").stripMargin,

    // The identical single-scan conditional aggregates.
    "q223_null_profile" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
        |      AS value_n,
        |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END
        |      AS props_n
        |  FROM events),
        |a AS (
        |  SELECT count(*) AS n_total,
        |    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS z1,
        |    CAST(sum(CASE WHEN value_n IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS z2,
        |    CAST(sum(CASE WHEN props_n IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS z3
        |  FROM e)
        |SELECT 'event_type' AS column, n_total, z1 AS n_null,
        |  z1 * 10000 // n_total AS null_bps FROM a
        |UNION ALL SELECT 'value_n', n_total, z2,
        |  z2 * 10000 // n_total FROM a
        |UNION ALL SELECT 'props_n', n_total, z3,
        |  z3 * 10000 // n_total FROM a""".stripMargin,

    // The identical counts, top-k cut, and skew-milli arithmetic.
    "q224_skew_report" ->
      """WITH t AS (
        |  SELECT tok AS key FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |c AS (SELECT key, count(*) AS n FROM t GROUP BY 1),
        |st AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |        count(*) AS n_keys, max(n) AS max_n FROM c),
        |top AS (SELECT key, n,
        |          CAST(row_number() OVER (ORDER BY n DESC, key ASC)
        |            AS BIGINT) AS rank
        |        FROM c QUALIFY rank <= 10)
        |SELECT rank, key, n, n * 10000 // st.total AS share_bps,
        |  st.max_n * st.n_keys * 1000 // st.total AS skew_milli
        |FROM top, st""".stripMargin,

    // The identical margins-from-cells and DECIMAL chi-square floor.
    "q225_crosstab_chi2" ->
      """WITH e AS (
        |  SELECT event_type AS a,
        |    (epoch_ns(ts) // 86400000000000) % 7 AS b
        |  FROM events),
        |cells AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r_a FROM cells
        |       GROUP BY 1),
        |cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c_b FROM cells
        |       GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cells)
        |SELECT cells.a, cells.b, cells.o, ra.r_a, cb.c_b, tot.n_total,
        |  CAST((CAST(cells.o AS HUGEINT) * tot.n_total
        |      - CAST(ra.r_a AS HUGEINT) * cb.c_b)
        |    * (CAST(cells.o AS HUGEINT) * tot.n_total
        |      - CAST(ra.r_a AS HUGEINT) * cb.c_b) * 1000000
        |    // (CAST(tot.n_total AS HUGEINT) * ra.r_a * cb.c_b)
        |    AS BIGINT) AS chi2_micro
        |FROM cells JOIN ra USING (a) JOIN cb USING (b), tot""".stripMargin,

    // The identical cohort aggregates and the squared-z DECIMAL cut.
    "q226_ab_test" ->
      """WITH u AS (
        |  SELECT user_id, count(*) AS ne,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS np
        |  FROM events GROUP BY 1),
        |v AS (
        |  SELECT CASE WHEN user_id % 4 = 0 THEN 'va'
        |      WHEN user_id % 4 = 2 THEN 'vd'
        |      WHEN ne < 67 THEN 'vb' ELSE 'vc' END AS variant,
        |    CAST(np >= 14 AS INT) AS conv
        |  FROM u),
        |p AS (SELECT variant, count(*) AS n,
        |        CAST(sum(conv) AS BIGINT) AS x FROM v GROUP BY 1)
        |SELECT a.variant AS variant_a, b.variant AS variant_b,
        |  a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b,
        |  a.x * 10000 // a.n AS rate_a_bps,
        |  b.x * 10000 // b.n AS rate_b_bps,
        |  a.x * 10000 // a.n - b.x * 10000 // b.n AS diff_bps,
        |  a.x + b.x > 0 AND a.x + b.x < a.n + b.n
        |    AND (CAST(a.x AS HUGEINT) * b.n - CAST(b.x AS HUGEINT) * a.n)
        |      * (CAST(a.x AS HUGEINT) * b.n - CAST(b.x AS HUGEINT) * a.n)
        |      * (a.n + b.n) * 625
        |      >= CAST(2401 AS HUGEINT) * a.n * b.n * (a.x + b.x)
        |        * (a.n + b.n - (a.x + b.x))
        |    AS significant
        |FROM p a JOIN p b ON a.variant < b.variant""".stripMargin,

    // q228: same ntile binning (ties broken by doc_id in both engines),
    // bin means are exact-integer-sum / count divisions
    "q228_quantile_norm" ->
      """WITH b AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(ntile(10) OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS bin
        |  FROM documents),
        |ref AS (SELECT bin, round(CAST(sum(n_chars) AS BIGINT)
        |    / CAST(count(*) AS DOUBLE), 6) AS norm_value
        |  FROM b GROUP BY 1)
        |SELECT b.doc_id, b.source, b.bin, ref.norm_value
        |FROM b JOIN ref USING (bin)""".stripMargin,

    // q229: every ln() argument is a ratio of exact BIGINT products, so
    // both engines evaluate identical doubles; only the ~|cells| summation
    // order differs, far inside round(…,6)
    "q229_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang AS a, source AS b, count(*) AS nab
        |  FROM documents GROUP BY 1, 2),
        |att AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na FROM cells GROUP BY 1),
        |btt AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(nab) AS BIGINT) AS n FROM cells),
        |raw AS (SELECT
        |  (SELECT sum((nab / CAST(n AS DOUBLE))
        |     * ln((nab * n) / CAST(na * nb AS DOUBLE)))
        |   FROM cells JOIN att USING (a) JOIN btt USING (b), t) AS mi,
        |  (SELECT sum((na / CAST(n AS DOUBLE)) * -ln(na / CAST(n AS DOUBLE)))
        |   FROM att, t) AS h_a,
        |  (SELECT sum((nb / CAST(n AS DOUBLE)) * -ln(nb / CAST(n AS DOUBLE)))
        |   FROM btt, t) AS h_b)
        |SELECT round(mi, 6) AS mi_nats, round(h_a, 6) AS h_a,
        |  round(h_b, 6) AS h_b,
        |  round(mi / ((h_a + h_b) / 2), 6) AS nmi FROM raw""".stripMargin,

    // q230: integer-exact KS — cumulative counts over the DISTINCT cent
    // domain, D's numerator and the squared α-cut in HUGEINT (Spark:
    // DECIMAL(38,0)), division of exact integers for the statistic
    "q230_ks_test" ->
      """WITH s AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i1
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |g AS (SELECT c, CAST(sum(i1) AS BIGINT) AS a,
        |    CAST(count(*) - sum(i1) AS BIGINT) AS b FROM s GROUP BY 1),
        |cum AS (SELECT sum(a) OVER (ORDER BY c) AS c1,
        |    sum(b) OVER (ORDER BY c) AS c2 FROM g),
        |t AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |    CAST(sum(b) AS BIGINT) AS n2 FROM g)
        |SELECT t.n1, t.n2,
        |  CAST(max(abs(c1 * t.n2 - c2 * t.n1)) AS BIGINT) AS d_num,
        |  round(CAST(max(abs(c1 * t.n2 - c2 * t.n1)) AS BIGINT)
        |    / CAST(t.n1 * t.n2 AS DOUBLE), 6) AS ks_stat,
        |  CAST(max(abs(c1 * t.n2 - c2 * t.n1)) AS HUGEINT)
        |      * CAST(max(abs(c1 * t.n2 - c2 * t.n1)) AS HUGEINT) * 1000000
        |    > CAST(1844164 AS HUGEINT) * (t.n1 + t.n2) * t.n1 * t.n2
        |    AS significant
        |FROM cum, t GROUP BY t.n1, t.n2""".stripMargin,

    // q231: Gini by the exact rank identity (rank ties broken by source
    // in both engines), HHI from integer weight sums
    "q231_concentration" ->
      """WITH g AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS w
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY w, source) AS BIGINT) AS i FROM g),
        |a AS (SELECT lang, count(*) AS n_units,
        |    CAST(sum(w) AS BIGINT) AS total_w,
        |    CAST(sum(i * w) AS BIGINT) AS siw,
        |    CAST(sum(w * w) AS BIGINT) AS sww FROM r GROUP BY 1)
        |SELECT lang, n_units, total_w,
        |  round((2 * siw - (n_units + 1) * total_w)
        |    / CAST(n_units * total_w AS DOUBLE), 6) AS gini,
        |  round(sww / (CAST(total_w AS DOUBLE) * total_w), 6) AS hhi
        |FROM a""".stripMargin,

    // q234: the same 3 alternating IPF scalings unrolled as CTEs; the
    // only FP divergence is marginal-sum order over ≤|cells| doubles
    "q234_ipf_balance" ->
      """WITH cells AS (SELECT lang AS r, source AS c, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    count(DISTINCT r) AS nr, count(DISTINCT c) AS nc FROM cells),
        |w0 AS (SELECT r, c, n, CAST(n AS DOUBLE) AS w FROM cells),
        |a1 AS (SELECT r, c, n, w * ((t.nn / CAST(t.nr AS DOUBLE))
        |    / sum(w) OVER (PARTITION BY r)) AS w FROM w0, t),
        |b1 AS (SELECT r, c, n, w * ((t.nn / CAST(t.nc AS DOUBLE))
        |    / sum(w) OVER (PARTITION BY c)) AS w FROM a1, t),
        |a2 AS (SELECT r, c, n, w * ((t.nn / CAST(t.nr AS DOUBLE))
        |    / sum(w) OVER (PARTITION BY r)) AS w FROM b1, t),
        |b2 AS (SELECT r, c, n, w * ((t.nn / CAST(t.nc AS DOUBLE))
        |    / sum(w) OVER (PARTITION BY c)) AS w FROM a2, t),
        |a3 AS (SELECT r, c, n, w * ((t.nn / CAST(t.nr AS DOUBLE))
        |    / sum(w) OVER (PARTITION BY r)) AS w FROM b2, t),
        |b3 AS (SELECT r, c, n, w * ((t.nn / CAST(t.nc AS DOUBLE))
        |    / sum(w) OVER (PARTITION BY c)) AS w FROM a3, t)
        |SELECT r AS lang, c AS source, CAST(n AS BIGINT) AS n,
        |  round(w, 6) AS weight FROM b3""".stripMargin,

    // q236: daily exact-cent totals -> prefix sums over the day domain,
    // HUGEINT split numerator (Spark: DECIMAL(38,0)), one double
    // division per candidate, argmax by (score DESC, day)
    "q236_changepoint" ->
      """WITH daily AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS b,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |cum AS (SELECT b, CAST(sum(s) OVER (ORDER BY b) AS BIGINT) AS lk,
        |    CAST(row_number() OVER (ORDER BY b) AS BIGINT) AS k
        |  FROM daily),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(s) AS BIGINT) AS lt FROM daily),
        |sc AS (SELECT b, k, lk, tt.t, tt.lt,
        |    CAST(CAST(lk AS HUGEINT) * tt.t
        |      - CAST(k AS HUGEINT) * tt.lt AS DOUBLE) AS ad
        |  FROM cum, tt WHERE k < tt.t),
        |scored AS (SELECT *,
        |    ad * ad / CAST(k * (t - k) * t AS DOUBLE) AS score FROM sc)
        |SELECT b AS split_bucket, t, k AS k_left,
        |  round(lk / CAST(k AS DOUBLE), 6) AS mean_before,
        |  round((lt - lk) / CAST(t - k AS DOUBLE), 6) AS mean_after,
        |  round(score, 6) AS score
        |FROM scored
        |QUALIFY row_number() OVER (ORDER BY score DESC, b) = 1""".stripMargin,

    // q237: identical rationals into ln, identical running-sum order
    // over the duration domain; the extinct flag (d = n_at_risk) pins
    // 0.0 structurally so ln(0) is unreachable in both engines
    "q237_kaplan_meier" ->
      """WITH fe AS (SELECT user_id,
        |    CAST(min(epoch_ns(ts) // 86400000000000) AS BIGINT) AS f,
        |    CAST(max(epoch_ns(ts) // 86400000000000) AS BIGINT) AS l
        |  FROM events GROUP BY 1),
        |dth AS (SELECT user_id,
        |    CAST(min(epoch_ns(ts) // 86400000000000) AS BIGINT) AS dday
        |  FROM events WHERE event_type = 'purchase' AND value > 200
        |  GROUP BY 1),
        |lives AS (SELECT fe.user_id,
        |    CASE WHEN dday IS NOT NULL THEN dday - f ELSE l - f END AS dur,
        |    dday IS NOT NULL AS died
        |  FROM fe LEFT JOIN dth USING (user_id)),
        |d AS (SELECT dur AS t,
        |    CAST(sum(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS ct FROM lives GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM d),
        |r AS (SELECT t, d,
        |    tot.n - coalesce(sum(ct) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_at_risk
        |  FROM d, tot),
        |s AS (SELECT t, d, n_at_risk,
        |    CASE WHEN max(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END)
        |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) = 1
        |      THEN 0.0
        |      ELSE exp(sum(CASE WHEN d > 0 AND d < n_at_risk
        |          THEN ln(1 - d / CAST(n_at_risk AS DOUBLE)) ELSE 0.0 END)
        |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW))
        |      END AS surv
        |  FROM r)
        |SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, d,
        |  round(surv, 6) AS survival
        |FROM s WHERE d > 0""".stripMargin,

    // q239: same fixed tree per digit row — log10 over the identical
    // rational, (obs − n·p)²/(n·p) in doubles, round 6
    "q239_benford" ->
      """WITH v AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit, CAST(count(*) AS BIGINT) AS obs
        |  FROM v WHERE cents > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM d)
        |SELECT digit, obs, round(log10(1 + 1.0 / digit), 6) AS exp_share,
        |  round((obs - t.n * log10(1 + 1.0 / digit))
        |      * (obs - t.n * log10(1 + 1.0 / digit))
        |    / (t.n * log10(1 + 1.0 / digit)), 6) AS chi2_term
        |FROM d, t""".stripMargin,

    // q240: HUGEINT-exact Pearson sums over the densely re-indexed day
    // domain; zero-variance lags null out instead of dividing by zero
    "q240_acf" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS b,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |idx AS (SELECT CAST(row_number() OVER (ORDER BY b) AS BIGINT) AS t,
        |    s FROM daily),
        |lags AS (SELECT unnest(range(1, 8)) AS lag),
        |p AS (SELECT l.lag, a.s AS x, b2.s AS y
        |  FROM lags l JOIN idx a ON true JOIN idx b2 ON b2.t = a.t + l.lag),
        |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |  FROM p GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        |  CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
        |      * CAST(n * syy - sy * sy AS DOUBLE) > 0
        |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |    END AS acf
        |FROM m""".stripMargin,

    // q241: identical pairwise-slope doubles -> identical median rank;
    // the emitted micro-slope is the chosen pair's exact integer div
    "q241_theil_sen" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS b,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |p AS (SELECT a.b AS x1, b2.b AS x2, a.s AS y1, b2.s AS y2,
        |    (b2.s - a.s) / CAST(b2.b - a.b AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b2 ON b2.b > a.b),
        |r AS (SELECT *, CAST(count(*) OVER () AS BIGINT) AS np,
        |    row_number() OVER (ORDER BY slope, x1, x2) AS rk FROM p)
        |SELECT np AS n_pairs,
        |  CAST((y2 - y1) * 1000000 // (x2 - x1) AS BIGINT) AS slope_micro,
        |  round(slope, 6) AS slope
        |FROM r WHERE rk = (np + 1) // 2""".stripMargin,

    // q242: doubled tie-averaged rank sums are exact integers; the
    // tie-corrected normal cut is one HUGEINT inequality (Spark:
    // DECIMAL(38,0))
    "q242_mann_whitney" ->
      """WITH s AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS i1
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |g AS (SELECT c, CAST(sum(i1) AS BIGINT) AS a,
        |    CAST(count(*) - sum(i1) AS BIGINT) AS b FROM s GROUP BY 1),
        |r AS (SELECT *, a + b AS cnt,
        |    CAST(coalesce(sum(a + b) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cumb
        |  FROM g),
        |m AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |    CAST(sum(b) AS BIGINT) AS n2,
        |    CAST(sum(a * (2 * cumb + cnt + 1)) AS BIGINT) AS r1d,
        |    CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tsum FROM r),
        |f AS (SELECT n1, n2, r1d - n1 * (n1 + 1) AS u1d, tsum,
        |    n1 + n2 AS nn FROM m)
        |SELECT n1, n2, u1d / 2 AS u,
        |  round((u1d - n1 * n2) / CAST(n1 * n2 AS DOUBLE), 6)
        |    AS rank_biserial,
        |  CAST(u1d - n1 * n2 AS HUGEINT) * (u1d - n1 * n2) * 3 * nn
        |      * (nn - 1) * 625
        |    >= CAST(2401 AS HUGEINT) * n1 * n2
        |      * (CAST(nn + 1 AS HUGEINT) * nn * (nn - 1) - tsum)
        |    AS significant
        |FROM f""".stripMargin,
  )
}
