package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Core relational surface: scans, aggregates, joins,
  * windows, grouping sets, samplers, sketches.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object RelationalQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S2/P1/P4: pruned scan + filter + projection
    "q01_scan_filter" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 5)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),

    // A1/A5: hash aggregate, partial+final
    "q02_agg_group" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))),

    // A2: exact group median
    "q03_median" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          median(col("l_quantity")).as("med_qty"),
          median(col("l_discount")).as("med_disc"))),

    // A3: group min/max on timestamps
    "q04_minmax" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))),

    // A4: exact count-distinct
    "q05_count_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))),

    // J3: enrich join (dim side broadcast) + aggregate
    "q06_join_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))),

    // J2: anti-join (NOT EXISTS)
    "q07_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // P6/P7: conditional expression buckets
    "q08_case_buckets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          when(col("l_quantity") <= 10, lit("small"))
            .when(col("l_quantity") <= 30, lit("mid"))
            .otherwise(lit("large")).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))),

    // W9: deterministic top-1 per group (row_number, NOT dropDuplicates)
    "q09_top1_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // R4: pivot long->wide (explicit values; conditional agg in oracle)
    "q14_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"),
          col("view").as("n_view"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("error").as("n_error"))),

    // R1/R5/R6: explode embedding vectors with position
    "q20_explode" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          col("col").cast("double").as("val"))),

    // W6: rolling 7-day range-frame aggregates per user, with the
    // reference's min_periods null-out (rolling_sum_by semantics)
    "q26_rolling" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-7L * 86400L * 1000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .withColumn("cnt_7d", count(lit(1)).over(w))
        .withColumn("sum_7d",
          when(col("cnt_7d") >= 3, sum("cents").over(w)))
        .select("user_id", "event_id", "cnt_7d", "sum_7d")
    }),

    // Set op: union of two scans (the multi-day file-glob analog)
    "q28_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT")
        .unionByName(o.filter(col("o_totalprice") > 400000))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
    }),

    // P12: pre-flight validation as data (bounds + per-user ts ordering)
    "q33_validate" -> ((s, d) => {
      val p = Tables.pings(s, d)
      p.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("latitude") <= -90 || col("latitude") >= 90, 1L)
          .otherwise(0L)).as("bad_lat"),
        sum(when(col("longitude") <= -180 || col("longitude") >= 180, 1L)
          .otherwise(0L)).as("bad_lon"),
        sum(when(col("timestamp").isNull, 1L).otherwise(0L)).as("null_ts"))
    }),

    // F8/F10: calendar part extraction on a timestamp column
    "q35_date_parts" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          (weekday(col("o_orderdate")) + lit(1)).as("iso_dow"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))),

    // P8: scalable global row index (range partition + offsets, no
    // single-partition window)
    "q36_global_index" -> ((s, d) =>
      graft.operators.Indexing.globalRowIndex(
        Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        "idx", col("o_orderkey"))),

    // SQL surface: the same ANSI text runs on Spark SQL and the oracle
    "q39_sql" -> ((s, d) =>
      Graft.sql(s, d, sqlQ39)),

    // A6/R5: collect-to-list aggregate (order-canonicalized, serialized
    // to a string so the compare is representation-stable)
    "q41_collect_list" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000)
        .groupBy("l_orderkey")
        .agg(
          concat_ws(",", sort_array(collect_list(
            col("l_linenumber").cast("string")))).as("lines"),
          size(collect_list(col("l_quantity"))).cast("long").as("n_vals"))),

    // J1: left join as filter+mark (join a qualifying set, coalesce the
    // miss to a sentinel — the reference's event-invalidation idiom)
    "q43_left_mark" -> ((s, d) => {
      val bigCust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("spend") > 300000)
        .select(col("o_custkey").as("c_custkey"), lit(1L).as("is_big"))
      Tables.customer(s, d)
        .join(broadcast(bigCust), Seq("c_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("is_big"), lit(-1L)).as("big_flag"))
    }),

    // R2/J2: distinct-on-subset + semi join
    "q44_distinct_semi" -> ((s, d) => {
      val purchasers = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select("user_id")
      Tables.events(s, d)
        .join(purchasers, Seq("user_id"), "left_semi")
        .select("user_id", "event_type")
        .dropDuplicates("user_id", "event_type")
    }),

    // Grouping sets: rollup subtotals + grand total in one pass (partial
    // aggregation handles all levels map-side; one shuffle)
    "q46_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))),

    // Exact heavy hitters: top-20 corpus tokens, deterministic tie-break
    "q49_heavy_hitters" -> ((s, d) =>
      graft.operators.Frequency.topK(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok")),
        col("tok"), 20)),

    // Deterministic hash train/test split: stateless per-row filter,
    // engine-neutral (MD5 of the key) so the split is auditable outside
    // Spark — oracle checks it bit-for-bit in DuckDB
    "q52_hash_split" -> ((s, d) =>
      graft.operators.Sampling.hashSplit(
        Tables.documents(s, d).select("doc_id"), "doc_id", 64)),

    // Deterministic stratified sample: stable "random" 5 docs per
    // (lang, source) stratum via hash rank
    "q53_stratified_take" -> ((s, d) =>
      graft.operators.Sampling.stratifiedTake(
        Tables.documents(s, d).select("doc_id", "lang", "source"),
        Seq("lang", "source"), "doc_id", 5)),

    // Equal-frequency quantile binning WITHOUT a global window: range
    // exchange + distributed index + ntile closed form
    "q54_quantile_bins" -> ((s, d) =>
      graft.operators.Sampling.quantileBins(
        Tables.events(s, d).select("event_id", "value"),
        "value", "event_id", 8)),

    // Deterministic ~10% corpus sample (26/256 hash buckets): pure
    // filter, no shuffle, scan-prunable
    "q55_hash_sample" -> ((s, d) =>
      graft.operators.Sampling.hashSample(
        Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id", 26)),

    // Weighted sampling WITHOUT replacement (Sampling.weightedTake,
    // Efraimidis-Spirakis): priority u^(1/w) with a 24-bit md5-uniform
    // u, top-20 per lang weighted by n_chars — longer docs
    // proportionally likelier, reproducible from any engine (the
    // oracle rebuilds the identical u from the same md5 hex digits).
    "q232_weighted_sample" -> ((s, d) =>
      graft.operators.Sampling.weightedTake(
        Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
        Seq("lang"), "doc_id", "n_chars", k = 20)),

    // Bloom-pruned semi join: dim keys -> 2^20-bit filter built by a
    // bit_or aggregation, fact side pre-filtered by a pure-expression
    // membership test before its shuffle; exact via the follow-up semi
    // join, so the oracle is the plain IN-subquery
    "q59_bloom_semi" -> ((s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_totalprice") > 150000.0)
        .select("o_orderkey")
      graft.operators.BloomPrune.semiJoin(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag"),
        dim, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    }),

    // Skew-safe two-stage aggregation: 3 hot keys spread over 16 salted
    // sub-keys each; result exactly equals the unsalted plan
    "q60_salted_stats" -> ((s, d) =>
      graft.operators.Salting.saltedStats(
        Tables.lineitem(s, d), Seq("l_returnflag"),
        col("l_extendedprice"), col("l_orderkey"), 16)),

    // Sketch accuracy report: HLL distinct + KLL-style quantile vs their
    // exact twins, per group. Rows-only (sketch values are
    // implementation-defined); error bounds pinned by SketchSpec.
    //
    // The exact count-distinct runs in its OWN aggregate: mixing it with
    // the sketch aggs makes Catalyst's one-distinct rewrite evaluate the
    // percentile/HLL buffers per (group, custkey) — ~100k heavyweight
    // buffers (an rsd-0.01 HLL is ~16 KiB) built and merged instead of
    // one per group (measured 21 s vs 1.4 s at sf0.1). The 5-row join is
    // free; at 100 TB the same split keeps sketch state O(groups).
    "q61_sketch_stats" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val exact = orders.groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("exact_d"))
      val sketch = orders.groupBy("o_orderpriority")
        .agg(
          approx_count_distinct(col("o_custkey"), 0.01).as("approx_d"),
          expr("percentile(o_totalprice, 0.5)").as("exact_med"),
          // exact quantiles at 0.5 ± 2x the approx sketch's rank error
          // (accuracy 1000 -> eps 0.001): the certified interval for
          // approx_med, emitted so a rows-only gate still checks the
          // guarantee per row. 2x, not 1x: the estimate's RANK honors
          // eps (measured 0.4990-0.4998 at sf0.01) but an exact
          // percentile at 0.499 interpolates between discrete ranks, and
          // that convention slack can exclude a rank-conforming value at
          // the exact edge; doubling the interval absorbs it while still
          // failing on any real sketch regression
          expr("percentile(o_totalprice, 0.498)").as("med_lo"),
          expr("percentile(o_totalprice, 0.502)").as("med_hi"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
            .as("approx_med"))
      exact.join(sketch, "o_orderpriority")
        .withColumn("d_rel_err",
          round(abs(col("approx_d") - col("exact_d")) /
            col("exact_d"), 4))
        // rsd 0.01 -> 5-sigma acceptance: a deterministic-seeded HLL at
        // this rsd sits far inside 5% on every fixture; flag, don't hide
        .withColumn("d_in_bounds",
          (col("d_rel_err") <= 0.05).cast("long"))
        .withColumn("med_in_bounds",
          (col("approx_med").between(col("med_lo"), col("med_hi")))
            .cast("long"))
        // hash only the engine-portable columns (r8 verdict ask #2): the
        // exact twins + the in_bounds verdicts (oracle pins them 1); the
        // sketch estimates themselves are engine-specific state. The
        // interpolated quantiles round to 6 decimals AFTER the bounds
        // check (the repo's derived-double convention): hashing raw
        // interpolation arithmetic would bet on Spark percentile() and
        // DuckDB quantile_cont() agreeing bit-for-bit across versions
        .select(col("o_orderpriority"), col("exact_d"),
          round(col("exact_med"), 6).as("exact_med"),
          round(col("med_lo"), 6).as("med_lo"),
          round(col("med_hi"), 6).as("med_hi"),
          col("d_in_bounds"), col("med_in_bounds"))
    }),

    // Count-min-sketch estimates vs exact counts for the top-20 corpus
    // tokens. The hashed dump keeps the portable columns — token, exact
    // count, and the in_bounds verdict (never-undercount + eps*N, pinned
    // literal-1 by the oracle); the raw CMS estimate is engine-specific
    // and stays out of the hash (FrequencySpec pins the bound itself).
    "q65_cms_estimates" -> ((s, d) =>
      graft.operators.Frequency.cmsTopK(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok")),
        col("tok"), 20)
        .select("value", "n_exact", "in_bounds")),

    // Salted skew join as a full query: the hot fact keys spread over 8
    // sub-keys, the dim side replicated 8x; result exactly equals the
    // plain join, which is the oracle
    "q66_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val fact = ev.select(col("user_id"), col("event_id"), col("value"))
      val dim = ev.select(col("user_id")).distinct()
        .withColumn("label",
          substring(md5(col("user_id").cast("string")), 1, 4))
      graft.operators.Salting
        .saltedJoin(fact, dim, "user_id", col("event_id"), 8)
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
    }),

    // Per-source quality calibration: decile of doc length WITHIN each
    // source (global thresholds over-prune weak domains). One range
    // exchange + broadcast per-group offsets — never a one-task-per-
    // source window.
    "q88_group_quantiles" -> ((s, d) =>
      graft.operators.Sampling.quantileBinsByGroup(
        Tables.documents(s, d).select("doc_id", "source", "n_chars"),
        "source", "n_chars", "doc_id", 10)
        .select("doc_id", "source", "bin")),

    // Mergeable-sketch persistence: per-(event_type, day) Datasketches
    // HLL sketches written to parquet, read back, union-merged to
    // per-type distinct-user estimates (Frequency.hllSketchByBucket /
    // hllMergeEstimate) — the incremental count-distinct artifact a
    // 100 TB fact table needs (merge kilobyte sketches, never re-scan).
    // Rows-only (sketch estimates are implementation-defined) but
    // self-certifying: every row carries the exact distinct count and
    // in_bounds = |approx - exact| within the lgK=12 error budget.
    "q114_sketch_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          date_format(timestamp_seconds(expr("ts div 1000000000")),
            "yyyy-MM-dd").as("day"))
      val dir = graft.sources.Staging.once(s"q114:$d") { out =>
        graft.operators.Frequency.hllSketchByBucket(
          ev, Seq("event_type"), col("day"), col("user_id"))
          .write.mode("overwrite").parquet(out)
      }
      val est = graft.operators.Frequency.hllMergeEstimate(
        s.read.parquet(dir), Seq("event_type"))
      val exact = Tables.events(s, d).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      est.join(exact, "event_type")
        // portable hash columns only: the estimate is engine state; the
        // oracle recomputes the exact twin + counts and pins in_bounds=1
        .select(col("event_type"),
          col("exact_distinct"), col("n_rows"), col("n_sketches"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            greatest(lit(1.0), lit(0.05) * col("exact_distinct")))
            .cast("long").as("in_bounds"))
    }),

    // Semi-structured ingest: events.props is a JSON string column;
    // from_json with an EXPLICIT schema (inference is a second scan and
    // a non-contract at 100 TB) extracts k, then per-type stats. The
    // json path stays a per-row codegen'd expression — no UDF.
    "q115_json_extract" -> ((s, d) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), schema).getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          countDistinct(col("k")).as("n_k"))
    }),

    // Unpivot (wide -> long, the inverse of R4's pivot): four lineitem
    // measures stacked into (measure, val) rows, then per
    // (returnflag, measure) aggregates. Spark's unpivot is a zero-shuffle
    // per-row expansion (a Generate, not a join); exact integer cents.
    "q116_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("n"),
          sum(round(col("val") * 100, 0).cast("long")).as("sum_cents"))),

    // CUBE with grouping_id: all four aggregation levels of
    // (status, priority) in one pass (map-side partials expand the
    // grouping sets — no re-scan per level), with the integer
    // grouping_id disambiguating real nulls from subtotal rows. q46's
    // rollup twin completes the grouping-sets surface.
    "q127_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n"), col("total"))),

    // HLL audience overlap (Frequency.hllIntersectEstimate):
    // inclusion-exclusion over mergeable per-event-type user sketches +
    // the exact twin and a per-row error certificate — rows-only (HLL
    // estimates are engine-specific) but self-certifying, the q114
    // discipline for sketch artifacts. Every user touches every type
    // in this fixture, so memberships are carved per (user, type-len)
    // to make the ten pairwise overlaps genuinely differ.
    "q196_hll_intersect" -> ((s, d) =>
      graft.operators.Frequency.hllIntersectEstimate(
        Tables.events(s, d)
          .filter(pmod(col("user_id") + length(col("event_type")),
            lit(4L)) =!= 0),
        "event_type", "user_id")
        // portable hash columns: exact pair overlap/union twins + the
        // in_bounds verdict (oracle pins 1); approx_overlap is HLL state
        .select(col("label_a"), col("label_b"), col("exact_a"),
          col("exact_b"), col("exact_overlap"), col("exact_union"),
          col("in_bounds").cast("long").as("in_bounds"))),

    // Robust null imputation (RobustStats.imputeLowerMedian):
    // deterministic null injection (every 7th event, plus every 50th
    // user entirely) filled with the user's lower median of observed
    // cents; all-null users STAY null with was_imputed = false — the
    // unobserved-group contract.
    "q198_impute" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          when(pmod(col("event_id"), lit(7L)) === 0 ||
            pmod(col("user_id"), lit(50L)) === 0, lit(null))
            .otherwise(round(col("value") * 100, 0).cast("long"))
            .as("cents_raw"))
      graft.operators.RobustStats.imputeLowerMedian(
        e, Seq("user_id"), "cents_raw", "event_id")
        .select("user_id", "event_id", "cents_raw", "imputed",
          "was_imputed")
    }),

    // TPC-H Q5-shaped six-table star join: lineitem ⋈ orders ⋈
    // customer ⋈ supplier (the LOCAL condition c_nation = s_nation) ⋈
    // nation ⋈ region, revenue per (region, nation, year) in exact
    // integer cents·percent units — Catalyst's join-reorder/broadcast
    // showcase gate; dims broadcast, the fact table shuffles once per
    // join key.
    "q201_tpch_like" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_suppkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        round(col("l_discount") * 100, 0).cast("long").as("disc"))
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), year(col("o_orderdate")).cast("long").as("yr"))
      val c = Tables.customer(s, d).select(col("c_custkey"),
        col("c_nationkey"))
      val su = Tables.supplier(s, d).select(col("s_suppkey"),
        col("s_nationkey"))
      val n = Tables.nation(s, d).select(col("n_nationkey"),
        col("n_name"), col("n_regionkey"))
      val r = Tables.region(s, d).select(col("r_regionkey"),
        col("r_name"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"),
          col("yr"))
        .agg(count(lit(1)).as("n_items"),
          sum(expr("cents * (100 - disc)")).as("rev_c100"))
    }),

    // Rolling distinct-cardinality (the engagement-diversity window):
    // distinct event types per user over a trailing 3-day RANGE frame,
    // computed exactly at day grain (per-day type sets collected once,
    // flattened across the range) — one user exchange serves both the
    // day-grain contraction and the window.
    "q202_rolling_distinct" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables.events(s, d)
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"), col("event_type"))
        .distinct()
      val dayGrain = t.repartition(col("user_id"))
        .groupBy("user_id", "day")
        .agg(collect_set(col("event_type")).as("types"))
      val w = Window.partitionBy("user_id").orderBy(col("day"))
        .rangeBetween(-3, Window.currentRow)
      dayGrain.select(col("user_id"), col("day"),
        size(array_distinct(flatten(collect_list(col("types")).over(w))))
          .cast("long").as("n_types_3d"))
    }),

    // Exact group percentile report (RobustStats.groupPercentiles):
    // p50/p95/p99 of purchase cents per event type at deterministic
    // disc ranks — the latency-report shape, integer-exact.
    "q212_group_percentiles" -> ((s, d) =>
      graft.operators.RobustStats.groupPercentiles(
        Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        Seq("event_type"), "cents", "event_id",
        Seq((1, 2), (19, 20), (99, 100)))),

    // Set-operation breadth: INTERSECT / EXCEPT (distinct) on viewer-
    // vs-purchaser audiences and INTERSECT ALL / EXCEPT ALL (multiset)
    // on (user, day) activity — Spark's intersect/except/intersectAll/
    // exceptAll against the SQL-standard twins.
    "q213_set_ops" -> ((s, d) => {
      // the q196 membership carve: every user touches every type in
      // this fixture, so the distinct EXCEPT arm would be empty without
      // per-(user, type-len) carving
      val e = Tables.events(s, d)
        .filter(pmod(col("user_id") + length(col("event_type")),
          lit(5L)) =!= 0)
      def aud(t: String) = e.filter(col("event_type") === t)
        .select(col("user_id")).distinct()
      def days(t: String) = e.filter(col("event_type") === t)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val nullDay = lit(null).cast("long")
      aud("view").intersect(aud("purchase"))
        .select(lit("intersect").as("op"), col("user_id"),
          nullDay.as("day"))
        .unionAll(aud("view").except(aud("purchase"))
          .select(lit("except").as("op"), col("user_id"),
            nullDay.as("day")))
        .unionAll(days("view").intersectAll(days("purchase"))
          .select(lit("intersect_all").as("op"), col("user_id"),
            col("day")))
        .unionAll(days("view").exceptAll(days("purchase"))
          .select(lit("except_all").as("op"), col("user_id"), col("day")))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity < 5""".stripMargin,

    "q02_agg_group" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_median" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty,
        |  median(l_discount) AS med_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q04_minmax" ->
      """SELECT l_linestatus, min(l_shipdate) AS min_ship,
        |  max(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q05_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q06_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q08_case_buckets" ->
      """SELECT CASE WHEN l_quantity <= 10 THEN 'small'
        |  WHEN l_quantity <= 30 THEN 'mid' ELSE 'large' END AS bucket,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q09_top1_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "q14_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |FROM events GROUP BY user_id""".stripMargin,

    "q20_explode" ->
      """SELECT vec_id, CAST(u.pos AS BIGINT) AS pos, CAST(u.val AS DOUBLE) AS val
        |FROM (SELECT vec_id,
        |  unnest(list_transform(embedding, (x, i) -> {'pos': i - 1, 'val': x})) AS u
        |  FROM embeddings)""".stripMargin,

    "q26_rolling" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events)
        |SELECT user_id, event_id,
        |  count(*) OVER w AS cnt_7d,
        |  CASE WHEN count(*) OVER w >= 3
        |    THEN CAST(sum(cents) OVER w AS BIGINT) END AS sum_7d
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q28_union" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM (
        |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_totalprice > 400000)
        |GROUP BY o_orderstatus""".stripMargin,

    "q33_validate" -> (s"WITH ${Tables.pingsSql}\n" +
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN latitude <= -90 OR latitude >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS bad_lat,
        |  CAST(sum(CASE WHEN longitude <= -180 OR longitude >= 180 THEN 1 ELSE 0 END) AS BIGINT) AS bad_lon,
        |  CAST(sum(CASE WHEN "timestamp" IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts
        |FROM pings""".stripMargin),

    "q35_date_parts" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow,
        |  strftime(o_orderdate, '%Y-%m-%d') AS ds
        |FROM orders""".stripMargin,

    "q36_global_index" ->
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER (ORDER BY o_orderkey) - 1 AS idx
        |FROM orders""".stripMargin,

    "q39_sql" -> sqlQ39,

    "q41_collect_list" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ','
        |    ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines,
        |  CAST(len(list(l_quantity)) AS BIGINT) AS n_vals
        |FROM lineitem WHERE l_orderkey < 1000
        |GROUP BY l_orderkey""".stripMargin,

    "q43_left_mark" ->
      """SELECT c_custkey, coalesce(is_big, -1) AS big_flag
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey AS k, CAST(1 AS BIGINT) AS is_big
        |  FROM orders GROUP BY o_custkey
        |  HAVING round(sum(o_totalprice), 2) > 300000
        |) ON c_custkey = k""".stripMargin,

    "q44_distinct_semi" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |WHERE EXISTS (SELECT 1 FROM events e2
        |  WHERE e2.user_id = events.user_id
        |    AND e2.event_type = 'purchase')""".stripMargin,

    "q46_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q49_heavy_hitters" ->
      """SELECT value, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS value FROM documents)
        |GROUP BY value ORDER BY n DESC, value ASC LIMIT 20""".stripMargin,

    "q52_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |    THEN 'test' ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    "q53_stratified_take" ->
      """SELECT doc_id, lang, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang, source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5""".stripMargin,

    "q54_quantile_bins" ->
      """SELECT event_id, value,
        |  CAST(ntile(8) OVER (ORDER BY value, event_id) AS BIGINT) AS bin
        |FROM events""".stripMargin,

    "q55_hash_sample" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'""".stripMargin,

    // q232: the 24-bit uniform is rebuilt digit-by-digit from the same
    // md5 hex prefix (Spark: conv(…,16,10)); pow/div of identical
    // doubles order identically, ties break on doc_id
    "q232_weighted_sample" ->
      """WITH h AS (SELECT doc_id, lang, n_chars,
        |    md5(CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents WHERE n_chars > 0),
        |u AS (SELECT doc_id, lang, n_chars,
        |   ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 1048576.0 +
        |    (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 65536 +
        |    (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 4096 +
        |    (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 256 +
        |    (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 16 +
        |    (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) + 0.5)
        |     / 16777216.0 AS uu
        |  FROM h)
        |SELECT doc_id, lang, n_chars FROM u
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY pow(uu, 1.0 / n_chars) DESC, doc_id) <= 20""".stripMargin,

    "q59_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
        |GROUP BY l_returnflag""".stripMargin,

    "q60_salted_stats" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total,
        |  round(sum(l_extendedprice) / count(*), 6) AS avg
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // Sketch gate, portable columns only: exact twins recomputed here,
    // in_bounds pinned literal-1 (the engine computes it from the HLL /
    // KLL estimates; a sketch regression flips it and the hash fails).
    "q61_sketch_stats" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS exact_d,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS exact_med,
        |  round(quantile_cont(o_totalprice, 0.498), 6) AS med_lo,
        |  round(quantile_cont(o_totalprice, 0.502), 6) AS med_hi,
        |  CAST(1 AS BIGINT) AS d_in_bounds,
        |  CAST(1 AS BIGINT) AS med_in_bounds
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // CMS gate, portable columns: exact top-20 twin under the same
    // (count desc, value asc) total order; in_bounds pinned literal-1
    // (never-undercount + eps*N — the engine computes it per row).
    "q65_cms_estimates" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS value
        |  FROM documents),
        |c AS (SELECT value, count(*) AS n_exact FROM t GROUP BY value)
        |SELECT value, n_exact, CAST(1 AS BIGINT) AS in_bounds
        |FROM c ORDER BY n_exact DESC, value ASC LIMIT 20""".stripMargin,

    "q66_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id,
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS label
        |  FROM (SELECT DISTINCT user_id FROM events))
        |SELECT d.label, count(*) AS n, round(sum(e.value), 2) AS total
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY d.label""".stripMargin,

    // HLL-merge gate, portable columns: exact-distinct twin + the sketch
    // row count (one per (type, day) bucket) recompute here; in_bounds
    // (|approx − exact| within 5%) pinned literal-1.
    "q114_sketch_merge" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_distinct,
        |  count(*) AS n_rows,
        |  count(DISTINCT epoch_ns(ts) // 86400000000000) AS n_sketches,
        |  CAST(1 AS BIGINT) AS in_bounds
        |FROM events GROUP BY event_type""".stripMargin,

    // GROUPING() bits composed in Spark's grouping_id order
    // (first listed column = most significant bit).
    "q127_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(2 * GROUPING(o_orderstatus)
        |    + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q115_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS INT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  count(DISTINCT k) AS n_k
        |FROM e GROUP BY event_type""".stripMargin,

    // HLL-intersect gate, portable columns: the exact pairwise
    // overlap/union twins recompute here (distinct equi-join under the
    // same label_a < label_b order); in_bounds pinned literal-1.
    "q196_hll_intersect" ->
      """WITH f AS (
        |  SELECT event_type AS label, user_id AS v FROM events
        |  WHERE (user_id + length(event_type)) % 4 <> 0),
        |n AS (
        |  SELECT label, count(DISTINCT v) AS exact_n FROM f GROUP BY label),
        |dv AS (SELECT DISTINCT label, v FROM f),
        |ov AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |    count(*) AS cnt
        |  FROM dv a JOIN dv b ON a.v = b.v AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  a.exact_n AS exact_a, b.exact_n AS exact_b,
        |  CAST(coalesce(ov.cnt, 0) AS BIGINT) AS exact_overlap,
        |  CAST(a.exact_n + b.exact_n - coalesce(ov.cnt, 0) AS BIGINT)
        |    AS exact_union,
        |  CAST(1 AS BIGINT) AS in_bounds
        |FROM n a JOIN n b ON a.label < b.label
        |LEFT JOIN ov ON ov.label_a = a.label AND ov.label_b = b.label
        |""".stripMargin,

    // The identical injection, per-user lower-median of the observed
    // values, left-join fill; all-null users keep null.
    "q198_impute" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_id % 7 = 0 OR user_id % 50 = 0 THEN NULL
        |      ELSE CAST(round(value * 100, 0) AS BIGINT) END AS cents_raw
        |  FROM events WHERE event_type = 'purchase'),
        |nn AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY cents_raw, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS gn
        |  FROM e WHERE cents_raw IS NOT NULL),
        |m AS (SELECT user_id, cents_raw AS med FROM nn
        |      WHERE rn = (gn + 1) // 2)
        |SELECT e.user_id, e.event_id, e.cents_raw,
        |  coalesce(e.cents_raw, m.med) AS imputed,
        |  e.cents_raw IS NULL AND m.med IS NOT NULL AS was_imputed
        |FROM e LEFT JOIN m USING (user_id)""".stripMargin,

    // The identical six-table join and exact cents·percent revenue.
    "q201_tpch_like" ->
      """SELECT r_name AS region, n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
        |    AS BIGINT) AS rev_c100
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |GROUP BY 1, 2, 3""".stripMargin,

    // Windowed DISTINCT over the same 3-day RANGE frame at type grain,
    // collapsed to day grain.
    "q202_rolling_distinct" ->
      """WITH t AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day, event_type
        |  FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    count(DISTINCT event_type) OVER (PARTITION BY user_id
        |      ORDER BY day RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)
        |      AS n
        |  FROM t)
        |SELECT DISTINCT user_id, day, CAST(n AS BIGINT) AS n_types_3d
        |FROM r""".stripMargin,

    // The identical three disc-rank extractions in one pass.
    "q212_group_percentiles" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS gn FROM e)
        |SELECT event_type, max(gn) AS n,
        |  min(cents) FILTER (rn = greatest(1, (gn + 1) // 2)) AS p50,
        |  min(cents) FILTER (rn = greatest(1, (gn * 19 + 19) // 20))
        |    AS p95,
        |  min(cents) FILTER (rn = greatest(1, (gn * 99 + 99) // 100))
        |    AS p99
        |FROM r
        |WHERE rn = greatest(1, (gn + 1) // 2)
        |  OR rn = greatest(1, (gn * 19 + 19) // 20)
        |  OR rn = greatest(1, (gn * 99 + 99) // 100)
        |GROUP BY 1""".stripMargin,

    // The SQL-standard set operations, distinct and multiset forms.
    "q213_set_ops" ->
      """WITH ec AS (
        |  SELECT * FROM events
        |  WHERE (user_id + len(event_type)) % 5 <> 0),
        |v AS (SELECT DISTINCT user_id FROM ec
        |      WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id FROM ec
        |      WHERE event_type = 'purchase'),
        |vd AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |       FROM ec WHERE event_type = 'view'),
        |pd AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |       FROM ec WHERE event_type = 'purchase')
        |SELECT 'intersect' AS op, user_id, CAST(NULL AS BIGINT) AS day
        |FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'except', user_id, CAST(NULL AS BIGINT)
        |FROM (SELECT user_id FROM v EXCEPT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'intersect_all', user_id, day
        |FROM (SELECT * FROM vd INTERSECT ALL SELECT * FROM pd)
        |UNION ALL
        |SELECT 'except_all', user_id, day
        |FROM (SELECT * FROM vd EXCEPT ALL SELECT * FROM pd)""".stripMargin,

    "q116_unpivot" ->
      """WITH longf AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val
        |  FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_extendedprice',
        |    l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount
        |  FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, measure, count(*) AS n,
        |  CAST(sum(CAST(round(val * 100, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM longf GROUP BY 1, 2""".stripMargin,

    "q88_group_quantiles" ->
      """SELECT doc_id, source,
        |  CAST(ntile(10) OVER (PARTITION BY source
        |    ORDER BY n_chars, doc_id) AS BIGINT) AS bin
        |FROM documents""".stripMargin,
  )
}
