package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the pipeline admission gate
  * (beyond the reference's surface — first-class per the build brief).
  *
  * A 100 TB ingest needs its quality checks to run as ONE pass over the
  * batch, not one job per rule: every check here is a pair of aggregate
  * expressions (observed metric, boolean verdict) evaluated together in
  * a single partial-aggregable `agg` row, then exploded to one
  * (check, observed, passed) row per rule. Adding a rule adds two
  * columns to the same scan, not a scan.
  *
  * Contrast with [[graft.sources.Ingest]]'s fail-fast assertions (P12):
  * those abort the job on violation; this REPORTS, so a scheduler can
  * quarantine a bad batch and keep the pipeline moving — and the report
  * itself is oracle-checkable data.
  */
object Expectations {

  /** Evaluate `checks` = (name, observed aggregate, passed aggregate
    * predicate) over one scan of `df`. Observed values are cast to long
    * (the exactness contract: counts, violation counts, extrema of
    * integer-derived columns); verdicts to 0/1.
    */
  def evaluate(df: DataFrame, checks: Seq[(String, Column, Column)])
  : DataFrame = {
    require(checks.nonEmpty, "evaluate: need at least one check")
    val aggs = checks.zipWithIndex.flatMap { case ((_, obs, pass), i) =>
      Seq(obs.cast("long").as(s"_o$i"), pass.cast("long").as(s"_p$i"))
    }
    // "check_name", not "check": CHECK is reserved in most SQL dialects
    // and the report is meant to be queried downstream
    val stacked = checks.zipWithIndex.map { case ((nm, _, _), i) =>
      struct(lit(nm).as("check_name"), col(s"_o$i").as("observed"),
        col(s"_p$i").as("passed"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(stacked: _*)).as("c"))
      .select(col("c.check_name").as("check_name"),
        col("c.observed").as("observed"), col("c.passed").as("passed"))
  }

  /** Row-level expectation router — the STREAMING-safe complement of
    * [[evaluate]] (whose aggregates need the whole batch): each check is
    * a per-row validity predicate; failing rows carry the
    * comma-joined names of every failed check in `reasons` and
    * `quarantined = true`, so a sink can split good rows from the
    * dead-letter stream with one filter. Pure projection — no state, no
    * watermark, safe under any output mode, and the identical Column
    * expressions run in batch for the oracle.
    *
    * A NULL verdict counts as FAILED (three-valued logic: a check that
    * cannot evaluate has not passed). Reason order = declaration order;
    * `concat_ws` skips the null slots of passing checks.
    */
  def rowGate(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "rowGate: need at least one check")
    val reasons = concat_ws(",", checks.map { case (nm, valid) =>
      when(!coalesce(valid, lit(false)), lit(nm))
    }: _*)
    df.withColumn("reasons", reasons)
      .withColumn("quarantined", col("reasons") =!= "")
  }

  /** Calendar completeness: per-day row counts joined against the FULL
    * day range between the batch's min and max day (a `sequence()`
    * explode off one scalar row — absent days surface as 0, which a
    * plain groupBy can never show). A day passes when its count
    * reaches `fracNum/fracDen` of the batch's mean daily count,
    * cross-multiplied in integers: n · nDays · fracDen >= total · fracNum.
    */
  def dailyCompleteness(df: DataFrame, dayCol: Column,
                        fracNum: Long, fracDen: Long): DataFrame = {
    val counts = df.select(dayCol.cast("long").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val span = counts.agg(min("day").as("d0"), max("day").as("d1"),
      sum("n").as("total"))
    val days = span.select(
      explode(sequence(col("d0"), col("d1"))).as("day"),
      (col("d1") - col("d0") + 1).as("n_days"), col("total"))
    days.join(counts, Seq("day"), "left_outer")
      .select(col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(col("n"), lit(0L)) * col("n_days") * fracDen >=
          col("total") * fracNum).cast("long").as("complete"))
  }

  /** Distribution-drift report between two snapshots of the same keyed
    * feed (yesterday's batch vs today's, pipeline v1 vs v2): per group,
    * both sides' row counts, distinct-entity counts and value sums, and
    * an integer-decided drift flag — |n_a − n_b| · den > n_a · num
    * (relative change beyond num/den), cross-multiplied so no float
    * boundary exists. Groups present on only one side surface with
    * zeros on the other (full-outer), which is itself the loudest drift
    * signal.
    *
    * One aggregate per side on the group key + one key-sized full-outer
    * join — both partial-aggregatable; nothing scans twice.
    */
  def driftReport(a: DataFrame, b: DataFrame, groupCol: String,
                  entityCol: String, valueCol: Column,
                  num: Long, den: Long): DataFrame = {
    def agg(df: DataFrame, tag: String) = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as(s"n_$tag"),
        countDistinct(col(entityCol)).as(s"entities_$tag"),
        sum(valueCol).cast("long").as(s"sum_$tag"))
    agg(a, "a").join(agg(b, "b"), Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("entities_a"), lit(0L)).as("entities_a"),
        coalesce(col("entities_b"), lit(0L)).as("entities_b"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"),
        coalesce(col("sum_b"), lit(0L)).as("sum_b"))
      .withColumn("drifted",
        (abs(col("n_a") - col("n_b")) * den > col("n_a") * num)
          .cast("long"))
  }

  /** Dataset card: the per-(source, lang) corpus profile a training-data
    * release ships — document/token/char volumes, length extremes, and
    * the normalized-exact duplicate rate (the q56 normalization, counted
    * as distinct 16-byte md5 keys so the agg state never holds text).
    * dup_bp is the duplicate rate in integer basis points
    * (floor((n_docs − n_unique) · 10000 / n_docs)): the one ratio is
    * integer division, engine-exact, no float.
    *
    * One pass, one partial-aggregatable shuffle on the group key;
    * count_distinct's expand dedups (group, md5) map-side first, so the
    * duplicate counter ships distinct keys, not documents.
    */
  def corpusCard(docs: DataFrame, groupCols: Seq[String],
                 textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    docs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        min(length(col(textCol)).cast("long")).as("min_chars"),
        max(length(col(textCol)).cast("long")).as("max_chars"),
        countDistinct(md5(norm.cast("binary"))).as("n_unique"))
      .withColumn("dup_bp",
        expr("(n_docs - n_unique) * 10000L div n_docs"))
  }

  /** Portable table content checksum — the cross-engine reconciliation
    * artifact: md5 each row's canonical string form, sum the two 32-bit
    * halves in DECIMAL(38,0) (order-free, mergeable, overflow-proof at
    * any row count) and publish them modulo 2^61 as longs, plus the
    * row count. Two systems holding the same logical table produce the
    * same (n_rows, sum_h1, sum_h2) triple regardless of partitioning,
    * file layout, or row order — the cheap answer to "did the
    * migration copy everything".
    *
    * Caller contract: `cols` must be integer- or string-derived (float
    * formatting differs across engines). One partial-agg scan, three
    * numbers out.
    */
  /** Per-column null-rate profile — the first data-profiling pass on
    * any new feed: ONE scan builds (n_null, n_total) for every listed
    * column as paired conditional aggregates in a single agg row, then
    * explodes to one report row per column with the exact rate in bps.
    * No per-column re-scan, no driver loop over columns.
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullProfile: need at least one column")
    val aggs = count(lit(1)).as("__n") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"__null_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.map(c =>
      struct(lit(c).as("column"), col(s"__null_$c").as("n_null")))
    one.select(col("__n").as("n_total"),
        explode(array(pairs: _*)).as("p"))
      .select(col("p.column").as("column"), col("n_total"),
        col("p.n_null").as("n_null"),
        expr("p.n_null * 10000 div n_total").as("null_bps"))
  }

  def contentChecksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    val row = md5(concat_ws("|", cols.map(_.cast("string")): _*)
      .cast("binary"))
    val h1 = conv(substring(row, 1, 8), 16, 10).cast("long")
    val h2 = conv(substring(row, 9, 8), 16, 10).cast("long")
    val m = "2305843009213693952" // 2^61
    df.agg(count(lit(1)).as("n_rows"),
        sum(h1.cast("decimal(38,0)")).as("__s1"),
        sum(h2.cast("decimal(38,0)")).as("__s2"))
      .select(col("n_rows"),
        expr(s"CAST(__s1 % $m AS BIGINT)").as("sum_h1"),
        expr(s"CAST(__s2 % $m AS BIGINT)").as("sum_h2"))
  }

  /** Benford first-digit audit over a positive integer column — the
    * classic fabricated-data / unit-mix-up screen: naturally occurring
    * multi-scale amounts follow P(d) = log10(1 + 1/d); capped,
    * truncated, or synthesized columns don't. Emits one row per leading
    * digit with the observed count, the Benford share, and the exact
    * chi-square contribution (obs − n·p)²/(n·p) — every term one fixed
    * expression tree over the integer counts, engine-identical before
    * the round(…,6). One digit-keyed aggregate; the digit frame (≤9
    * rows) crosses a one-row total.
    */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val d = graft.CacheScope.track(df.filter(col(valueCol) > 0)
      .select(substring(col(valueCol).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
      .persist()) // the total and the report both read the digit frame
    val tot = d.agg(sum("obs").as("n"))
    val e = log10(lit(1) + lit(1.0) / col("digit"))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("obs"),
        round(e, 6).as("exp_share"),
        round((col("obs") - col("n") * e) * (col("obs") - col("n") * e)
          / (col("n") * e), 6).as("chi2_term"))
  }
}
