package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data curation
  * (beyond the reference's surface — first-class per the build brief).
  *
  * Everything here is HASH-derived, never RNG-derived: `rand()` draws a
  * per-task stream, so a retried/recomputed partition samples DIFFERENT
  * rows — silent non-determinism under fault recovery, the cardinal sin of
  * a train/test split (test-set leakage on re-run). An MD5 over the row's
  * own key gives every row a stable pseudo-random rank that survives
  * retries, repartitioning, engine version bumps, and even engine SWAPS
  * (MD5-of-UTF-8 is engine-neutral — these ops are oracle-checked
  * bit-for-bit against DuckDB, so a user can split in Spark and audit the
  * split in any other engine).
  *
  * Scale shapes: split/sample are stateless per-row filters (no shuffle,
  * full codegen, pushdown-friendly). stratifiedTake is one hash exchange
  * on the strata + in-partition rank — the canonical per-group top-N; the
  * hash rank makes the "random" N per group reproducible.
  */
object Sampling {

  /** Stable hex rank in [00..ff] from the key's MD5 — uniform over 256
    * buckets, deterministic across engines.
    */
  private def hexBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  /** Deterministic train/test split: rows whose key-hash falls below the
    * threshold go to "test", the rest to "train". testBuckets of 256 ≈ the
    * test fraction (e.g. 64 → 25%). Adding rows to the table never moves
    * an EXISTING row across the split — the property that keeps a frozen
    * eval set frozen as the corpus grows.
    */
  def hashSplit(df: DataFrame, keyCol: String, testBuckets: Int)
  : DataFrame = {
    require(testBuckets > 0 && testBuckets < 256,
      s"testBuckets must be in (0, 256), got $testBuckets")
    val threshold = f"$testBuckets%02x"
    df.withColumn("split",
      when(hexBucket(col(keyCol)) < lit(threshold), lit("test"))
        .otherwise(lit("train")))
  }

  /** Deterministic ~fraction sample: keep rows in the first `buckets` of
    * 256 hash buckets. A pure filter — at 100 TB this prunes at scan time
    * (the predicate is pushed into the parquet reader's row-group stats
    * evaluation where possible) and never shuffles.
    */
  def hashSample(df: DataFrame, keyCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && buckets <= 256,
      s"buckets must be in (0, 256], got $buckets")
    // 256 must short-circuit: f"%02x" renders it as the 3-char "100",
    // and the 2-char bucket compares lexicographically ("1a" > "100"),
    // which would silently keep only the ~16/256 buckets starting "0"
    if (buckets == 256) df
    else df.filter(hexBucket(col(keyCol)) < lit(f"$buckets%02x"))
  }

  /** Deterministic stratified take: exactly min(n, |stratum|) rows per
    * stratum, chosen by hash rank (stable "random" rows), ties broken by
    * the key itself so the result is a function of the data alone.
    */
  def stratifiedTake(df: DataFrame, strataCols: Seq[String], keyCol: String,
                     n: Int): DataFrame =
    // the hash-RANDOM ordering of the one shared rank-cap implementation
    // (keeps the WindowGroupLimit plan property pinned in one place)
    topKPerGroup(df, strataCols, n,
      md5(col(keyCol).cast("string").cast("binary")), col(keyCol))

  /** Deterministic weighted corpus mixing — the "75% web, 25% books"
    * pretraining-mix step. Each source corpus is hash-sampled at
    * `buckets`/256 (256 = keep all) and tagged with its name in
    * `mix_source`; the per-source SALT (name prefixed into the hash)
    * makes selections independent across corpora even when keys
    * collide, and the whole mix is a union of pure stateless filters —
    * no shuffle, pushdown-friendly, reproducible from any engine.
    */
  def weightedMix(sources: Seq[(String, DataFrame, Int)], keyCol: String)
  : DataFrame = {
    require(sources.nonEmpty, "at least one source corpus")
    sources.foreach { case (n, _, b) =>
      require(b > 0 && b <= 256, s"source '$n': buckets must be in (0, 256], got $b")
    }
    sources.map { case (name, df, buckets) =>
      val salted = concat(lit(name + ":"), col(keyCol).cast("string"))
      val kept =
        if (buckets == 256) df
        else df.filter(hexBucket(salted) < lit(f"$buckets%02x"))
      kept.withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Per-group top-k by an explicit ORDER — the "cap each source/domain
    * at its k best documents" curation primitive ([[stratifiedTake]] is
    * the hash-RANDOM variant; this one ranks by quality). `orderCols`
    * plus the group must be a total order (include a unique id as the
    * last key) or the kept set is recompute-order-dependent.
    *
    * One hash exchange on the strata + an in-partition rank — never a
    * global sort; the rank short-circuits per group, so memory is the
    * partition's rows, not k * |groups|.
    */
  def topKPerGroup(df: DataFrame, strataCols: Seq[String], k: Int,
                   orderCols: Column*): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(orderCols: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic weighted sampling WITHOUT replacement per group —
    * Efraimidis-Spirakis A-ES: each row draws priority u^(1/w) (u a
    * 24-bit hash-uniform bucket midpoint in (0,1) from the key's md5,
    * w = `weightCol`),
    * and the k highest priorities per group are exactly a weighted
    * sample without replacement. Hash-derived u makes the draw a pure
    * function of the data (reproducible from any engine — the oracle
    * rebuilds the same 24-bit integer from the same md5 hex), and rows
    * with w <= 0 are excluded by definition.
    *
    * Same rank-cap plan as every take here (topKPerGroup →
    * WindowGroupLimit): one exchange on the group key, per-partition
    * top-k short-circuit — never a global sort, never a driver loop.
    * Ties (identical priority) break on the key for determinism.
    */
  def weightedTake(df: DataFrame, groupCols: Seq[String], keyCol: String,
                   weightCol: String, k: Int): DataFrame = {
    // bucket MIDPOINT (h + 0.5)/2^24 keeps u in the open (0,1) A-ES
    // requires: u = 0 would zero the priority regardless of weight
    // (md5 prefix 000000, p = 2^-24 per key) and u = 1 would max it
    val u = (conv(substring(
        md5(col(keyCol).cast("string").cast("binary")), 1, 6), 16, 10)
      .cast("double") + lit(0.5)) / lit((1 << 24).toDouble)
    val priority = pow(u, lit(1.0) / col(weightCol))
    topKPerGroup(df.filter(col(weightCol) > 0), groupCols, k,
      priority.desc, col(keyCol))
  }

  /** Temperature-scaled source rebalancing — the multilingual sampling
    * rule of mT5/XLM-R (sample source s with p_s proportional to
    * c_s^tau, tau < 1, so head languages shrink and tail languages
    * survive), materialized as exact per-source quotas plus a
    * deterministic hash-ranked take. tau is restricted to 1/2^halvings
    * (0.5, 0.25, ...) ON PURPOSE: x^tau is then `halvings` nested
    * sqrt() calls, and IEEE-754 guarantees sqrt, *, / and floor are
    * correctly rounded — bit-identical on the JVM and in DuckDB —
    * whereas a general pow() is a libm call whose last ulp differs
    * across engines and would make quota boundaries
    * engine-dependent. Quota_s = floor(cap * w(c_s) / w(c_max)) with
    * w = sqrt^halvings: the largest source gets exactly `cap` rows,
    * every other source cap scaled by (c_s/c_max)^tau; a source smaller
    * than its quota is taken whole.
    *
    * Scale shape: per-source counts are one partial aggregate; the
    * quota frame is |sources| rows and broadcasts. The md5-ranked take
    * is one exchange on the source key; row_number short-circuits at
    * the quota, so per-partition state is the kept prefix. A single
    * 100 TB source makes that source's rank a hot partition — at that
    * scale pre-filter with the [[hashSample]] bucket trick to ~quota
    * expected rows first and rank only the survivors; the take stays
    * deterministic because both stages key on the same md5.
    *
    * Output: the kept rows as (keyCol, sourceCol, src_n, quota).
    */
  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
                     cap: Long, halvings: Int = 1): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(halvings >= 1 && halvings <= 8,
      s"halvings must be in [1, 8], got $halvings")
    def w(c: Column): Column =
      (1 to halvings).foldLeft(c.cast("double"))((x, _) => sqrt(x))
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("src_n"))
    val cmax = counts.agg(max("src_n").as("cmax"))
    val quotas = counts.crossJoin(broadcast(cmax))
      .select(col(sourceCol), col("src_n"),
        floor(lit(cap) * w(col("src_n")) / w(col("cmax"))).as("quota"))
    val rk = Window.partitionBy(sourceCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rk", row_number().over(rk))
      .join(broadcast(quotas), Seq(sourceCol))
      .filter(col("__rk") <= col("quota"))
      .select(col(keyCol), col(sourceCol), col("src_n"), col("quota"))
  }

  /** Token-budget corpus selection: deterministically shuffle the corpus
    * (seeded hash order — a stable "random" training order that survives
    * retries and engine swaps, same rationale as the split ops above) and
    * keep the prefix of documents whose running token total stays within
    * `budget`. The standard "give me ~N tokens of this corpus" curation
    * step when sizing a pretraining mix.
    *
    * The running total is [[Packing.globalCumSum]] — a range exchange on
    * the hash order plus an imperative per-partition pass — NOT a global
    * `sum() over (order by ...)` window, which would collapse 100 TB into
    * one partition. The budget filter is exclusive-at-the-boundary: a doc
    * whose own tokens cross the budget is dropped, as are all docs after
    * it in hash order (prefix truncation, not best-fit knapsack — the
    * result is a contiguous prefix of a deterministic permutation, so two
    * runs with growing budgets are nested).
    *
    * Output = input columns + `n_tokens` (the evaluated token count,
    * replacing any existing column of that name) and `cum_tokens`
    * (inclusive running total in selection order). `keyCol` must be
    * unique: it breaks hash ties, and a duplicate key would make the
    * tied rows' prefix sums recompute-order-dependent.
    */
  def tokenBudgetSelect(df: DataFrame, keyCol: String, tokensCol: Column,
                        budget: Long, seed: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val h = substring(
      md5(concat(lit(seed), col(keyCol).cast("string")).cast("binary")),
      1, 8)
    val withTok = df
      .withColumn("n_tokens", coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("__h", h)
    Packing
      .globalCumSum(withTok, "__pre", col("n_tokens"),
        col("__h"), col(keyCol))
      .withColumn("cum_tokens", col("__pre") + col("n_tokens"))
      .filter(col("cum_tokens") <= budget)
      .drop("__h", "__pre")
  }

  /** Equal-frequency quantile binning of a numeric column — ntile
    * semantics (bucket sizes differ by ≤1, larger buckets first),
    * deterministic under a total order (value, then key). The standard
    * feature-binning / difficulty-bucketing primitive for curriculum
    * sampling.
    *
    * NOT implemented as `ntile(k) over (order by ...)`: a global window
    * collapses every row into ONE partition — the same driver-sized
    * bottleneck P8 exists to avoid. Instead the rows get a distributed
    * global index (range partition + per-partition offsets,
    * [[Indexing.globalRowIndex]]) and the bucket comes from ntile's
    * closed form over (index, n, k): with q = n div k and r = n mod k,
    * buckets 1..r hold q+1 rows, buckets r+1..k hold q. Scales as a
    * range exchange + a stateless per-row expression.
    *
    * The sorted frame inside globalRowIndex is a lazy localCheckpoint
    * whose blocks free via the ContextCleaner — no caller-side cache
    * lifecycle (this doc predated the checkpoint switch).
    */
  /** Per-group quantile binning — quality calibration per source/domain
    * (a global threshold over-prunes weak domains and under-prunes strong
    * ones; rank within the domain instead). SQL-equivalent:
    * `ntile(k) OVER (PARTITION BY group ORDER BY value, key)`.
    *
    * The naive window form puts each GROUP in one task — at corpus scale
    * a dominant source is half the data and that task never finishes.
    * Instead: ONE range exchange over (group, value, key) gives a global
    * index ([[Indexing.globalRowIndex]]); the per-group ordinal is the
    * global index minus the group's minimum, where the per-group
    * (min, count) frame is one tiny row per group — broadcast joined —
    * and the bucket is ntile's closed form, a stateless projection.
    * Group count must be broadcast-small (sources/domains: yes).
    */
  def quantileBinsByGroup(df: DataFrame, groupCol: String, valueCol: String,
                          keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val indexed = Indexing.globalRowIndex(df, "__gidx",
      col(groupCol), col(valueCol), col(keyCol))
    val stats = indexed.groupBy(groupCol)
      .agg(min("__gidx").as("__base"), count(lit(1)).as("__n"))
    indexed.join(broadcast(stats), Seq(groupCol))
      .withColumn("__idx", col("__gidx") - col("__base"))
      .withColumn("bin", expr(
        s"""CASE WHEN __n < $k THEN __idx + 1
           |WHEN __idx < (__n % $k) * (__n DIV $k + 1)
           |  THEN __idx DIV (__n DIV $k + 1) + 1
           |ELSE (__idx - (__n % $k) * (__n DIV $k + 1)) DIV (__n DIV $k)
           |  + (__n % $k) + 1 END""".stripMargin).cast("long"))
      .drop("__gidx", "__base", "__n", "__idx")
  }

  def quantileBins(df: DataFrame, valueCol: String, keyCol: String, k: Int)
  : DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val indexed =
      Indexing.globalRowIndex(df, "__idx", col(valueCol), col(keyCol))
    val n = indexed.count() // reads globalRowIndex's checkpoint blocks
    val q = n / k
    val r = n % k
    val bin =
      if (q == 0) col("__idx") + 1L // n < k: row i alone in bucket i+1
      else
        when(col("__idx") < lit(r * (q + 1)),
          expr(s"__idx DIV ${q + 1}") + 1L)
          .otherwise(expr(s"(__idx - ${r * (q + 1)}) DIV $q") + lit(r + 1))
    indexed.withColumn("bin", bin.cast("long")).drop("__idx")
  }

  /** Deterministic contrastive negative sampling: k pseudo-random
    * negatives per anchor, reproducibly — the pairing a contrastive
    * trainer (CLIP/SimCSE-style in-batch or explicit negatives) needs to
    * be stable across reruns and engines so a resumed job never silently
    * re-pairs. Negative j of anchor a is the document at global index
    * `portableHash32("a:j") mod N` ([[Indexing.globalRowIndex]] by id —
    * no dense-id assumption), skipping self-pairs; `exclude` (canonical
    * (id_a, id_b) pairs, e.g. exact or LSH near-dups) anti-joins out
    * false negatives — a near-dup used as a negative actively teaches
    * the wrong geometry.
    *
    * Hash collisions across j are kept (the trainer sees k draws, not k
    * guaranteed-distinct docs) — dropping them would make row counts
    * depend on collision luck; excluded/self pairs are dropped, the
    * standard "fewer than k usable negatives" case.
    *
    * Scale shape: the candidate build is a per-row expression over
    * anchors x k (explode of a k-literal sequence, no shuffle beyond the
    * index join); resolving neg_idx -> id is one equi-join against the
    * (id, idx) frame, and the exclusion is a left-anti equi-join on the
    * canonical pair key. No windows, no driver state beyond
    * globalRowIndex's bounded per-partition counts.
    */
  def contrastiveNegatives(docs: DataFrame, idCol: String, k: Int,
                           exclude: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, "contrastiveNegatives: k must be >= 1")
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val idx = Indexing.globalRowIndex(ids, "idx", col("doc_id"))
    val nDocs = broadcast(idx.agg(count(lit(1)).as("n_docs")))
    val cand = idx.select(col("doc_id").as("anchor_id"))
      .crossJoin(nDocs)
      .select(col("anchor_id"), col("n_docs"),
        explode(sequence(lit(1L), lit(k.toLong))).as("j"))
      .withColumn("neg_idx",
        pmod(graft.functions.TextFunctions.portableHash32(
          concat(col("anchor_id").cast("string"), lit(":"),
            col("j").cast("string"))), col("n_docs")))
      .join(idx.select(col("idx").as("neg_idx"),
        col("doc_id").as("neg_id")), "neg_idx")
      .filter(col("neg_id") =!= col("anchor_id"))
      .select("anchor_id", "j", "neg_id")
    exclude match {
      case None => cand
      case Some(ex) =>
        cand.join(ex.select(col("id_a"), col("id_b")),
          least(col("anchor_id"), col("neg_id")) === col("id_a") &&
            greatest(col("anchor_id"), col("neg_id")) === col("id_b"),
          "left_anti")
    }
  }
}
