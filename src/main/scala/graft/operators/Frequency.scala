package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus frequency operators for training-data curation (beyond the
  * reference's surface — first-class per the build brief): exact heavy
  * hitters and TF/DF term statistics.
  *
  * Scale shapes:
  *  - topK: hash aggregate (map-side partial combine, one shuffle on the
  *    value) then a distributed TakeOrdered — each partition keeps its own
  *    top k and the driver merges k·P rows, never the full frequency
  *    table. A total order (count desc, value asc) makes the cut
  *    deterministic under ties.
  *  - termDocStats: ONE explode pass; tf = hash aggregate on
  *    (doc, term); df = hash aggregate of the tf rows on term (tf is
  *    already distinct per (doc, term), so `count(*)` per term IS the
  *    document frequency), joined back on term. Both df branches hang off
  *    the SAME tf exchange (ReuseExchange dedups it), so the token corpus
  *    is still scanned and exploded exactly once. The join-back beats the
  *    tempting `count(*) over (partition by term)` window: a window
  *    partitions the FULL tf table by raw term with no partial
  *    aggregation, so the hottest term ("the", in ~every doc) funnels
  *    ~n_docs rows into one reducer at 100 TB; the aggregate combines
  *    map-side and ships one row per (partition, term), and AQE handles
  *    any residual join skew.
  */
object Frequency {

  /** BPE merge-rule training: learn the first `rounds` byte-pair-encoding
    * merges from a space-tokenized corpus. Returns the merge TABLE
    * (round, sym_a, sym_b, merged, cnt) — like
    * [[Clustering.lloydCentroids]], training yields a small model
    * artifact, so the per-round winner (ONE row) is collected and
    * inlined as a literal into the next round's rewrite.
    *
    * Scale shape: the corpus is scanned ONCE (word → frequency — the
    * vocabulary contraction); every round after that is vocab-sized:
    * pair counts ride on distinct words weighted by frequency, the
    * winner is a TakeOrdered top-1 (never a single-partition sort), and
    * the merge is applied as a literal string rewrite on the persisted
    * vocab frame.
    *
    * Symbol sequences are represented as `·x·` wrapped tokens
    * ("hello" → "·h··e··l··l··o·"): each symbol owns BOTH its
    * delimiters, so replacing `·a··b·` with `·ab·` is exactly the
    * greedy leftmost non-overlapping BPE merge even for back-to-back
    * occurrences (`abab`) — a SHARED delimiter would swallow the next
    * occurrence's boundary. Precondition: tokens must not contain '·'
    * (U+00B7). Ties break (cnt desc, sym_a asc, sym_b asc).
    */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
                rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, rounds)
      .toDF("round", "sym_a", "sym_b", "merged", "cnt")
  }

  /** [[bpeMerges]] + [[bpeApply]] in one call: train `rounds` merges,
    * apply them to the SAME corpus, report per-doc unit counts.
    */
  def bpeTrainApply(docs: DataFrame, idCol: String, textCol: String,
                    rounds: Int): DataFrame =
    bpeApply(docs, idCol, textCol,
      trainMerges(docs, textCol, rounds).map(m => (m._2, m._3)))

  private def trainMerges(docs: DataFrame, textCol: String, rounds: Int)
  : Seq[(Long, String, String, String, Long)] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val vocab = graft.CacheScope.track(
      docs.select(explode(split(col(textCol), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .select(regexp_replace(col("w"), "(.)", "·$1·").as("seq"),
          col("freq"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var cur = vocab.toDF()
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val syms = expr("split(substring(seq, 2, char_length(seq) - 2), '··')")
      val top = cur
        .withColumn("__s", syms)
        .withColumn("__a", slice(col("__s"), lit(1), size(col("__s")) - 1))
        .withColumn("__b", slice(col("__s"), lit(2), size(col("__s")) - 1))
        .select(explode(arrays_zip(col("__a"), col("__b"))).as("p"),
          col("freq"))
        .groupBy(col("p.__a").as("sym_a"), col("p.__b").as("sym_b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("sym_a").asc, col("sym_b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, a + b, cnt))
        // symbols are corpus-derived text: quote them SQL-literally
        def q(s: String) = s.replace("'", "''")
        cur = cur.withColumn("seq",
          expr(s"replace(seq, '·${q(a)}··${q(b)}·', '·${q(a)}${q(b)}·')"))
        r += 1
      }
    }
    merges.toSeq
  }

  /** Apply learned BPE merges to every document and report the token
    * inventory before/after — the train → apply half of the tokenizer
    * loop ([[bpeMerges]] is train; this is the deploy path, the q162
    * model-application pattern for text).
    *
    * Every non-space character is `·x·` wrapped IN PLACE (spaces stay
    * bare, so a merge pattern `·a··b·` can never cross a token
    * boundary — `·a· ·b·` does not contain it), then the merge list is
    * applied as chained literal rewrites in training order. Symbol
    * counts come from arithmetic, not a second tokenize:
    * `n_units_after = n_tokens + occurrences("··")`, and occurrences =
    * (len − len(remove("··"))) / 2 — `··` can only appear at a symbol
    * boundary, never overlapping.
    */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    var seq: Column = regexp_replace(col(textCol), "(\\S)", "·$1·")
    merges.foreach { case (a, b) =>
      seq = call_function("replace", seq,
        lit(s"·${a}··${b}·"), lit(s"·${a}${b}·"))
    }
    val toks = size(split(col(textCol), " "))
    docs.select(col(idCol),
        toks.as("__nt"), seq.as("__s"),
        length(regexp_replace(col(textCol), " ", "")).cast("long")
          .as("n_units_before"))
      .select(col(idCol), col("n_units_before"),
        (col("__nt") +
          (length(col("__s")) -
            length(call_function("replace", col("__s"), lit("··"), lit("")))
          ) / 2).cast("long").as("n_units_after"))
  }

  /** Exact top-k values by frequency with deterministic tie-break. */
  def topK(df: DataFrame, valueCol: Column, k: Int): DataFrame =
    df.select(valueCol.as("value"))
      .groupBy("value")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(k)

  /** Per-(doc, term) term frequency + per-term document frequency over a
    * space-tokenized corpus. Output: (doc_id, token, tf, df) — exact
    * integers; downstream tf-idf weighting is one expression away and is
    * left to the caller so float policy stays theirs.
    */
  def termDocStats(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    // The tautological `tf > 0` (a group count is always >= 1) pins the tf
    // column in this branch: without it Catalyst prunes the count out of
    // the df-side aggregate, the two subtrees stop being identical, and
    // ReuseExchange no longer dedups them — the corpus would be scanned
    // and exploded TWICE. With it, both branches read the same shuffle
    // stage (verified: final AQE plan has one FileScan).
    val df = tf.where(col("tf") > 0)
      .groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(df, "token").select("doc_id", "token", "tf", "df")
  }

  /** TF-IDF weights on top of termDocStats: tfidf = tf · ln(N / df),
    * rounded to 6 decimals so cross-engine float comparison is exact.
    *
    * N (the corpus document count) arrives via a broadcast cross join of a
    * one-row aggregate — never a `count(*) over ()` window, which would
    * funnel every row through a single partition at scale. Everything else
    * rides the termDocStats shuffles; no extra pass over the corpus.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    termDocStats(docs, idCol, textCol)
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .drop("n_docs")
  }

  /** Corpus-derived unigram language-model quality score — the
    * perplexity-style filter large-scale text curation runs before
    * training (a document whose tokens are improbable under the corpus's
    * own unigram distribution is boilerplate, encoding noise, or another
    * language): per doc, the mean token log-probability
    * avg_logprob = (1/m) * sum_i ln(c_{t_i} / T) over the m token
    * instances, where c_t is the corpus count of token t and T the total
    * token count.
    *
    * Engine-exact without any fold-order contract: each token's
    * ln(count) is rounded ONCE to micro-nats (round(ln(c)*1e6) as a
    * long — the q58 round-before-compare idiom), after which the per-doc
    * sum is exact INTEGER arithmetic, associative under any partitioning
    * or engine. The only emitted float is one one-shot division, rounded
    * once (the q131 discipline):
    * avg_logprob = round((sum_micro - m*round(ln(T)*1e6)) / (m*1e6), 6).
    *
    * Scale shape: one explode pass builds (doc, token, tf); the vocab
    * aggregate and the score join share the token key; T and the vocab's
    * ln table never materialize beyond the aggregate; the per-doc sum is
    * a partial-aggregatable long. No windows, no driver state, no HOFs.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy("token")
      .agg(sum("tf").as("c"))
      .withColumn("l_micro",
        round(log(col("c").cast("double")) * 1e6, 0).cast("long"))
    val total = vocab
      .agg(sum("c").as("t_tokens"))
      .withColumn("lt_micro",
        round(log(col("t_tokens").cast("double")) * 1e6, 0).cast("long"))
    tf.join(vocab, "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("l_micro")).as("sum_micro"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"),
        (col("sum_micro") - col("n_tokens") * col("lt_micro"))
          .as("lp_micro"),
        round((col("sum_micro") - col("n_tokens") * col("lt_micro"))
          .cast("double") / (col("n_tokens").cast("double") * 1e6), 6)
          .as("avg_logprob"))
  }

  /** Bigram conditional language-model score — [[unigramLogProb]]'s
    * next-token upgrade (the KenLM-style fluency filter at order 2):
    * per doc, the mean conditional log-probability
    * avg_logprob = (1/m) · Σ ln(c_ab / c_a•) over the doc's m bigram
    * occurrences, where c_ab is the corpus count of bigram (a, b) and
    * c_a• = Σ_b c_ab the count of bigrams starting with a — so the
    * conditionals per prefix sum to exactly 1. Word salad scores far
    * below fluent text even when every unigram is common — the signal
    * order-1 cannot see.
    *
    * Engine-exact by the q147 discipline: each count's ln is rounded
    * ONCE to micro-nats, per-doc sums are exact longs under any
    * partitioning, and the single emitted float is one rounded division.
    * Docs with < 2 tokens have no bigrams and drop out (the q120
    * short-doc rule).
    *
    * Scale shape: one bigram explode pass; the conditional micro-nat
    * table is assembled on the vocab contraction (bigram counts → prefix
    * counts → ONE vocab-sized join), so the doc-volume path joins once
    * on the bigram key and partially aggregates per doc. No windows.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val tf = graft.functions.TextFunctions
      .explodedShingles(docs, idCol, textCol, 2)
      .groupBy("id", "shingle")
      .agg(count(lit(1)).as("tf"))
    val bg = tf.groupBy("shingle").agg(sum("tf").as("c_ab"))
      .withColumn("a", element_at(split(col("shingle"), " "), 1))
    val pre = bg.groupBy("a").agg(sum("c_ab").as("c_a"))
      .withColumn("la_micro",
        round(log(col("c_a").cast("double")) * 1e6, 0).cast("long"))
    val cond = bg.join(pre, "a")
      .withColumn("l_micro",
        round(log(col("c_ab").cast("double")) * 1e6, 0).cast("long"))
      .select(col("shingle"),
        (col("l_micro") - col("la_micro")).as("cond_micro"))
    tf.join(cond, "shingle")
      .groupBy("id")
      .agg(sum("tf").as("n_bigrams"),
        sum(col("tf") * col("cond_micro")).as("lp_micro"))
      .select(col("id").as("doc_id"), col("n_bigrams"), col("lp_micro"),
        round(col("lp_micro").cast("double")
          / (col("n_bigrams").cast("double") * 1e6), 6).as("avg_logprob"))
  }

  /** Chi-square token-vs-label association — the feature-selection /
    * domain-drift scan curation pipelines run to find which tokens
    * characterize which source (Yang & Pedersen, ICML'97 feature
    * selection): per (token, label), the 2x2 document-presence
    * contingency table and its chi-square statistic.
    *
    * All four cells derive from three integer aggregates (n11 per
    * (token, label), df per token, label sizes + N via broadcast one-row
    * frames): n10 = df−n11, n01 = n_l−n11, n00 = N−df−n_l+n11. The
    * statistic is assembled in ONE fixed-order double expression
    * (difference exact in longs first, then three multiplies and one
    * division, rounded once — the q131 discipline), so the emitted value
    * is bit-identical cross-engine. Degenerate margins (a token in every
    * document, a label covering every document) are filtered, not
    * divided by zero; `minDf` bounds the emitted vocabulary.
    *
    * Scale shape: one explode + (doc, token, label) distinct — the only
    * pass that sees token volume; n11 and df ride the same token-keyed
    * contraction; label sizes and N broadcast. No windows.
    */
  def chi2Association(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, minDf: Long): DataFrame = {
    val pres = docs
      .select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("token"))
      .distinct()
    val n11 = pres.groupBy("token", "label")
      .agg(count(lit(1)).as("n11"))
    val dfTok = n11.groupBy("token").agg(sum("n11").as("df"))
    val nLab = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_label"))
    val nTot = docs.agg(count(lit(1)).as("n_docs"))
    val d = col("n11") * col("n00") - col("n10") * col("n01")
    n11.join(dfTok, "token")
      .join(broadcast(nLab), "label")
      .crossJoin(broadcast(nTot))
      .withColumn("n10", col("df") - col("n11"))
      .withColumn("n01", col("n_label") - col("n11"))
      .withColumn("n00",
        col("n_docs") - col("df") - col("n_label") + col("n11"))
      .filter(col("df") >= minDf && col("df") < col("n_docs") &&
        col("n_label") < col("n_docs"))
      .withColumn("chi2",
        round(col("n_docs").cast("double")
          * d.cast("double") * d.cast("double")
          / (col("df").cast("double")
            * (col("n_docs") - col("df")).cast("double")
            * col("n_label").cast("double")
            * (col("n_docs") - col("n_label")).cast("double")), 6))
      .select("token", "label", "n11", "n10", "n01", "n00", "chi2")
  }

  /** BM25 retrieval scoring (Robertson/Spärck Jones, with Lucene's
    * always-positive `ln(1 + (N-df+0.5)/(df+0.5))` idf): rank the corpus
    * against a term set — the search/retrieval primitive next to
    * [[tfidf]]'s weighting.
    *
    * Per-(doc, term) scores are one-shot double expressions with a FIXED
    * operator order (mirrored token-for-token by the q150 oracle) and are
    * rounded ONCE to micro-units; the per-doc combination is then exact
    * long addition — no float fold-order contract (the q147 idiom).
    *
    * Scale shape: doc length comes from `size(split(...))` — no explode;
    * the explode pass is filtered to the query terms BEFORE its
    * aggregate, so only matching tokens survive into the shuffle; df and
    * the corpus stats are broadcast one-row/terms-sized frames; the
    * global top-k is orderBy+limit (TakeOrdered — per-partition heaps,
    * no global sort shuffle).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfT = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("df")).cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)))
    val w = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) *
        (col("dl").cast("double") * col("n_docs").cast("double")
          / col("sum_dl").cast("double"))))
    val scored = tf.join(broadcast(dfT), "token")
      .crossJoin(broadcast(stats))
      .withColumn("s", round(idf * w * lit(1e6), 0).cast("long"))
      .groupBy("doc_id")
      .agg(sum("s").as("score_micro"), count(lit(1)).as("n_terms"))
    val top = scored.orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(k)
    top.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score_micro").desc, col("doc_id").asc))
        .cast("long"))
  }

  /** Count-min-sketch frequency estimates for the exact top-k values:
    * one distributed sketch pass (Spark's CountMinSketch aggregate —
    * counter-matrix merge is commutative addition, so the result is
    * deterministic under any partitioning) plus the exact [[topK]], then
    * the k point queries answer driver-side from the ~(2/eps)·d-counter
    * sketch. The sketch never undercounts; overshoot is ≤ eps·N with
    * probability 1−(1−confidence). At 100 TB the sketch is the only
    * whole-corpus frequency artifact that fits in memory — `topK`
    * verifies its accuracy on the heaviest (worst-case-collision) keys.
    *
    * Output: (value, n_exact, n_est, in_bounds) — in_bounds certifies
    * the CMS guarantee per row (never undercounts, overcount <= eps*N),
    * so a rows-only gate still checks the sketch contract.
    */
  def cmsTopK(df: DataFrame, valueCol: Column, k: Int,
              eps: Double = 1e-4, confidence: Double = 0.99,
              seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(valueCol.cast("string").as("value"))
    val sketch = values.stat.countMinSketch(
      col("value"), eps, confidence, seed)
    // total item count for the CMS bound: est ∈ [exact, exact + eps·N]
    // with prob ≥ confidence. Emitting the bound as a column makes every
    // row self-certifying — a rows-only gate still checks the guarantee.
    val total = sketch.totalCount()
    topK(values, col("value"), k).collect()
      .map { r =>
        val exact = r.getLong(1)
        val est = sketch.estimateCount(r.getString(0))
        val ok = est >= exact && est <= exact + (eps * total).ceil.toLong
        (r.getString(0), exact, est, if (ok) 1L else 0L)
      }
      .toSeq.toDF("value", "n_exact", "n_est", "in_bounds")
  }

  /** Per-(group, bucket) Datasketches-HLL sketch BYTES — the mergeable
    * count-distinct artifact. Unlike `approx_count_distinct` (whose HLL
    * state dies with the query), these rows persist to parquet and
    * re-aggregate: the 100 TB pattern is one sketch row per
    * (dimension, day-partition), so "distinct users over any date range /
    * dimension rollup" is answered by merging kilobyte sketches instead
    * of re-scanning the fact table. Binary layout is Apache Datasketches
    * (Spark's hll_sketch_agg), stable across Spark versions and readable
    * by the Datasketches libs in other engines.
    */
  def hllSketchByBucket(df: DataFrame, groupCols: Seq[String],
                        bucketCol: Column, valueCol: Column,
                        lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col) :+ bucketCol.as("bucket"): _*)
      .agg(hll_sketch_agg(valueCol, lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Merge persisted per-bucket sketches to per-group distinct estimates
    * (hll_union_agg + hll_sketch_estimate): one partial-agg shuffle over
    * sketch rows — the fact table is never touched. `allowDifferentLgK`
    * is on so sketches built at different precisions (schema evolution
    * across historical partitions) still union.
    */
  def hllMergeEstimate(sketches: DataFrame, groupCols: Seq[String])
  : DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_estimate(
          hll_union_agg(col("sketch"), lit(true))).as("approx_distinct"),
        sum("n_rows").as("n_rows"),
        count(lit(1)).as("n_sketches"))

  /** Contingency table with per-cell chi-square contributions, exact:
    * for cell (a, b) with observed o, row margin r_a, column margin
    * c_b, grand total N, the contribution (o − r·c/N)²/(r·c/N)
    * rationalizes to (o·N − r·c)² / (N·r·c) — emitted as a floor'd
    * micro value with every product in DECIMAL(38,0). The global
    * association report behind q149's per-token cut, as a full
    * cross-tab.
    *
    * One (a, b) count aggregate; margins are two tiny re-aggregates of
    * the CELL frame (never a fact re-scan), joined back at
    * margin-cardinality size.
    */
  def contingencyChi2(df: DataFrame, aCol: String, bCol: String)
  : DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum("o").as("r_a"))
    val cb = cells.groupBy("b").agg(sum("o").as("c_b"))
    val tot = cells.agg(sum("o").as("n_total"))
    cells.join(ra, "a").join(cb, "b")
      .crossJoin(broadcast(tot))
      .withColumn("chi2_micro",
        expr("""CAST((CAST(o AS DECIMAL(38,0)) * n_total
                 - CAST(r_a AS DECIMAL(38,0)) * c_b)
               * (CAST(o AS DECIMAL(38,0)) * n_total
                 - CAST(r_a AS DECIMAL(38,0)) * c_b) * 1000000
               div (CAST(n_total AS DECIMAL(38,0)) * r_a * c_b)
               AS BIGINT)"""))
      .select("a", "b", "o", "r_a", "c_b", "n_total", "chi2_micro")
  }

  /** Per-document token-distribution (Shannon) entropy in micro-nats —
    * the vocabulary-flatness quality signal (near-zero entropy = one
    * token dominating, the repetition failure q179 sees from the other
    * side). The q147/q163 float discipline: each ln(n/c) is rounded
    * ONCE to micro-nats, the weighted sum is exact longs, and the only
    * division is a single integer div by n — engine-reproducible
    * because the one transcendental per distinct count is immediately
    * pinned to a grid.
    *
    * One explode + (doc, token) count, then a doc-keyed aggregate —
    * both share the doc exchange.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val counts = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .repartition(col("doc_id"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    counts
      .withColumn("__n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("__term",
        col("c") * round(log(col("__n").cast("double") /
          col("c").cast("double")) * 1e6, 0).cast("long"))
      .groupBy("doc_id")
      .agg(max(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        expr("CAST(sum(__term) div max(__n) AS BIGINT)")
          .as("entropy_micro_nats"))
  }

  /** Simpson diversity per group, EXACT: the probability that two
    * draws without replacement share a category is Σc(c−1)/(n(n−1)) —
    * a pure rational, published in basis points with no float anywhere
    * (the entropy signal's integer-only sibling; use it when the
    * certificate must be bit-portable). `diversity_bps` = 10000 −
    * concentration. Groups with n < 2 emit nulls (undefined, not
    * zero). Two aggregates sharing one group exchange.
    */
  def simpsonDiversity(df: DataFrame, keys: Seq[String], catCol: String)
  : DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols :+ col(catCol).as("__cat"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keyCols: _*)
      .agg(sum("__c").as("n"),
        count(lit(1)).as("n_categories"),
        sum(expr("__c * (__c - 1)")).as("__pairs"))
      .withColumn("concentration_bps",
        when(col("n") >= 2,
          expr("__pairs * 10000 div (n * (n - 1))")))
      .withColumn("diversity_bps",
        when(col("n") >= 2, lit(10000L) - col("concentration_bps")))
      .drop("__pairs")
  }

  /** Autocomplete prefix index: for every token prefix of length
    * 1..maxPrefix, the top-`k` completions by corpus frequency
    * ((count desc, token asc) total order — engine-deterministic) with
    * their counts and ranks. The type-ahead artifact: one lookup row
    * per (prefix, rank).
    *
    * Scale shape: ONE token-count aggregate (map-side combined over
    * the explode), then prefixes explode off the VOCABULARY contraction
    * — maxPrefix rows per distinct token, never per occurrence; the
    * per-prefix top-k window is keyed on the prefix (fan-in bounded by
    * vocabulary, not corpus).
    */
  def prefixCompletions(docs: DataFrame, textCol: String,
                        maxPrefix: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPrefix >= 1 && k >= 1, "maxPrefix and k must be >= 1")
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
    val pre = vocab.select(col("token"), col("c"),
        explode(sequence(lit(1),
          least(length(col("token")), lit(maxPrefix)))).as("plen"))
      .select(col("token").substr(lit(1), col("plen")).as("prefix"),
        col("token"), col("c"))
    pre.withColumn("rank", row_number().over(
        Window.partitionBy("prefix")
          .orderBy(col("c").desc, col("token").asc)).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Audience-overlap estimation from mergeable HLL sketches —
    * inclusion–exclusion on the q114 artifact family: for every
    * unordered label pair, `approx_overlap = est(A) + est(B) −
    * est(A ∪ B)`, where the union estimate comes from the scalar
    * `hll_union` of the two per-label sketches (never a re-scan of the
    * fact rows). The operator also computes the EXACT overlap (distinct
    * value equi-join) and an `in_bounds` certificate — the q114
    * self-certification discipline: sketch estimates are
    * engine-specific, so the gate is rows-only, but every row carries
    * its own machine-checkable error bound (3× the standard HLL
    * relative error of lgK, compounded over the three estimates, floor
    * 16 for the sparse regime).
    *
    * Scale shape: sketches are one partial-agg pass (k-byte state per
    * label); the pair frame is label²-sized (labels are an enum, not
    * data); the exact twin is the only data-sized join and exists to
    * certify — a production pipeline runs the sketch side alone.
    */
  def hllIntersectEstimate(df: DataFrame, labelCol: String,
                           valueCol: String, lgK: Int = 12): DataFrame = {
    val sk = df.groupBy(col(labelCol).as("label"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count_distinct(col(valueCol)).as("exact_n"))
    val pairs = sk.as("a").join(sk.as("b"),
        col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
        col("a.exact_n").as("exact_a"), col("b.exact_n").as("exact_b"),
        hll_sketch_estimate(col("a.sketch")).as("est_a"),
        hll_sketch_estimate(col("b.sketch")).as("est_b"),
        hll_sketch_estimate(hll_union(col("a.sketch"), col("b.sketch")))
          .as("est_u"))
    val dv = df.select(col(labelCol).as("label"), col(valueCol).as("v"))
      .distinct()
    val exact = dv.as("a").join(dv.as("b"),
        col("a.v") === col("b.v") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    // 3 sigma of the HLL relative standard error (1.04 / sqrt(2^lgK))
    // per estimate, compounded over the three terms; floor 16 covers
    // the sparse-mode-to-dense seam.
    val tolPerMille = math.max(1L,
      math.round(3 * 3 * 1.04 / math.sqrt((1L << lgK).toDouble) * 1000))
    pairs.join(exact, Seq("label_a", "label_b"), "left")
      .withColumn("exact_overlap",
        coalesce(col("exact_overlap"), lit(0L)))
      .withColumn("approx_overlap",
        (col("est_a") + col("est_b") - col("est_u")).cast("long"))
      .withColumn("exact_union",
        col("exact_a") + col("exact_b") - col("exact_overlap"))
      .withColumn("in_bounds",
        abs(col("approx_overlap") - col("exact_overlap")) * 1000 <=
          greatest(col("exact_union") * tolPerMille, lit(16000L)))
      .select("label_a", "label_b", "exact_a", "exact_b", "exact_overlap",
        "approx_overlap", "exact_union", "in_bounds")
  }

  /** Inverted-index build with capped posting lists — the retrieval-side
    * artifact [[bm25TopK]] queries ad hoc: one relational row per
    * (token, rank, doc_id, tf) with rank <= cap under the total order
    * (tf desc, doc_id asc), plus per-token df (posting-list length before
    * the cap) and cf (corpus frequency). Row form, not arrays: postings
    * stay partial-aggregatable, parquet-pruned, and mergeable across
    * index shards.
    *
    * The cap is taken in TWO phases to dodge this file's header trap
    * (a bare per-token window funnels ~n_docs "the"-rows into one
    * reducer): phase 1 ranks within (token, doc_id % salts) and keeps
    * cap per salt bucket — the global top cap under a total order is
    * contained in the union of its buckets' top caps, so the prune is
    * lossless — and phase 2 ranks the <= cap·salts survivors per token.
    * The hottest token's final window sees cap·salts rows, not its df.
    * df/cf come from a hash aggregate over the same tf exchange
    * (ReuseExchange, the termDocStats `tf > 0` idiom), never a window.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    cap: Int, salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val stats = tf.where(col("tf") > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
    val order = Seq(col("tf").desc, col("doc_id").asc)
    val pre = tf
      .withColumn("salt", pmod(col("doc_id"), lit(salts.toLong)))
      .withColumn("prk", row_number().over(
        Window.partitionBy("token", "salt").orderBy(order: _*)))
      .filter(col("prk") <= cap)
      .drop("salt", "prk")
    pre
      .withColumn("rank", row_number().over(
        Window.partitionBy("token").orderBy(order: _*)).cast("long"))
      .filter(col("rank") <= cap)
      .join(stats, "token")
      .select("token", "df", "cf", "rank", "doc_id", "tf")
  }

  /** Bigram collocation detection (pointwise-mutual-information family),
    * decided entirely in integer arithmetic: a bigram (a, b) is a
    * collocation iff its lift P(ab) / (P(a)·P(b)) >= liftNum/liftDen and
    * it occurs at least `minCount` times. With P(ab) = c_ab/N_big and
    * P(t) = c_t/N_uni, the threshold cross-multiplies to
    * `c_ab · N_uni² · liftDen >= liftNum · N_big · c_a · c_b` — compared
    * in DECIMAL(38,0) (the q126/q133 idiom), so there is no log() or
    * float boundary and the DuckDB twin (HUGEINT) reproduces the accept
    * set exactly. The rational threshold matters in both regimes:
    * real-text collocation cuts are lift >= 3..10 (PMI >= ln lift), while
    * near-uniform corpora need cuts just above 1 (e.g. 21/20) for the
    * decision to split anything at all.
    *
    * Scale shape: corpus totals (N_uni, N_big) come from ONE scan-level
    * aggregate over token-array lengths — never from re-aggregating the
    * exploded frames — and broadcast as a single row. Unigram and bigram
    * counts are hash aggregates (map-side combine); the minCount cut
    * happens BEFORE the two vocab joins, so only candidate bigrams —
    * not the long tail — are ever joined, and AQE handles the hot-token
    * join skew.
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   liftNum: Long, liftDen: Long, minCount: Long)
  : DataFrame = {
    require(liftNum > 0 && liftDen > 0 && minCount > 0,
      "lift and minCount must be positive")
    val toks = docs.select(split(col(textCol), " ").as("toks"))
    val totals = toks.agg(
      sum(size(col("toks")).cast("long")).as("n_uni"),
      sum(greatest(size(col("toks")) - 1, lit(0)).cast("long")).as("n_big"))
    val uni = toks.select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val cand = graft.functions.TextFunctions
      .explodedShingles(docs, idCol, textCol, 2)
      .groupBy("shingle").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .select(element_at(split(col("shingle"), " "), 1).as("a"),
        element_at(split(col("shingle"), " "), 2).as("b"),
        col("c_ab"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    cand
      .join(uni.select(col("token").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("token").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(totals))
      .filter(
        dec(col("c_ab")) * dec(col("n_uni")) * dec(col("n_uni")) *
          dec(lit(liftDen)) >=
        dec(lit(liftNum)) * dec(col("n_big")) * dec(col("c_a")) *
          dec(col("c_b")))
      .select("a", "b", "c_ab", "c_a", "c_b")
  }

  /** Vocabulary coverage / OOV-rate gate — the tokenizer-fit check a
    * pretraining pipeline runs before committing a vocab: train the
    * top-`k` token vocabulary on the corpus (deterministic total order:
    * count desc, token asc — the q150 TakeOrdered discipline, no global
    * sort), then score every document's out-of-vocabulary token rate in
    * exact integer basis points.
    *
    * Scale shape: one explode pass feeds BOTH the vocabulary aggregate
    * and the per-doc scoring; the trained vocab is k rows — broadcast
    * into the scoring join (the q162 trained-model pattern: the model is
    * an artifact, the apply path is stateless). Per-doc totals are one
    * hash aggregate on the doc id.
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(k)
      .select(col("token"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bps", expr("n_oov * 10000 div n_tokens"))
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    * the pretraining-curation repetition battery), computed EXACTLY in
    * integer basis points so the pass/fail decision is engine-identical:
    *
    *  - `top{2,3,4}_bps`: characters covered by the single most frequent
    *    word n-gram (occurrences × gram length, including its internal
    *    spaces) as bps of the document's character length. Tie-break:
    *    lexicographically greatest gram (arg-max by (count, gram), one
    *    struct max — no window).
    *  - `dup_bps`: characters covered by all `dupN`-grams occurring more
    *    than once (sum of count × length over duplicated grams).
    *    Overlapping occurrences count each time, so values above 10000
    *    are possible for degenerate loops — the signal saturates exactly
    *    where Gopher's does. Gopher uses widths 5–10; corpora with tiny
    *    vocabularies need a narrower width for the signal to exist at
    *    all (the gate uses 3 — at width 5 the synthetic corpus is
    *    duplicate-free).
    *
    * `pass` applies the caps (defaults are Gopher's table-A1 cuts in bps).
    *
    * Scale shape: ONE pass — posexplode the token array once, emit the
    * (n, gram) candidates per position as a pre-built 4-struct array
    * (codegen explode, no interpreted lambda), then two hash aggregates
    * that SHARE one doc-keyed exchange: the input is pre-partitioned on
    * the doc id, which satisfies ClusteredDistribution for both the
    * (id, n, gram) count and the per-id assembly (the q169 prefix trick).
    * Short docs join back from `docs` with zero signals.
    */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String,
                       top2Max: Long = 2000, top3Max: Long = 1800,
                       top4Max: Long = 1600, dupMax: Long = 1500,
                       dupN: Int = 5): DataFrame = {
    require(dupN >= 2, s"dupN must be >= 2, got $dupN")
    val ns = (Seq(2, 3, 4) :+ dupN).distinct
    val base = docs
      .select(col(idCol).as("id"),
        length(col(textCol)).cast("long").as("nch"),
        split(col(textCol), " ").as("toks"))
      .repartition(col("id"))
      .select(col("id"), col("nch"), col("toks"),
        posexplode(col("toks")))
    val grams = base.select(col("id"), col("nch"),
      explode(array(ns.map { n =>
        val gram = concat_ws(" ",
          (1 to n).map(k => element_at(col("toks"), col("pos") + k)): _*)
        when(col("pos") <= size(col("toks")) - n,
          struct(lit(n).as("n"), gram.as("gram")))
      }: _*)).as("g"))
      .filter(col("g").isNotNull)
      .select(col("id"), col("nch"), col("g.n").as("n"),
        col("g.gram").as("gram"))
    val counts = grams.groupBy("id", "nch", "n", "gram")
      .agg(count(lit(1)).as("cnt"))
    def topChars(n: Int): Column = {
      val t = max(when(col("n") === n,
        struct(col("cnt"), col("gram"))))
      t.getField("cnt") * length(t.getField("gram"))
    }
    val perDoc = counts.groupBy("id", "nch")
      .agg(topChars(2).as("t2c"), topChars(3).as("t3c"),
        topChars(4).as("t4c"),
        sum(when(col("n") === dupN && col("cnt") > 1,
          col("cnt") * length(col("gram"))).otherwise(0L)).as("dc"))
    docs.select(col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(perDoc.withColumnRenamed("id", "doc_id").drop("nch"),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        expr(s"coalesce(t2c, 0) * 10000 div n_chars").as("top2_bps"),
        expr(s"coalesce(t3c, 0) * 10000 div n_chars").as("top3_bps"),
        expr(s"coalesce(t4c, 0) * 10000 div n_chars").as("top4_bps"),
        expr(s"coalesce(dc, 0) * 10000 div n_chars").as("dup_bps"))
      .withColumn("pass",
        col("top2_bps") <= top2Max && col("top3_bps") <= top3Max &&
          col("top4_bps") <= top4Max && col("dup_bps") <= dupMax)
  }

  /** Distinctive terms per group — Monroe et al.'s weighted log-odds
    * with an informative Dirichlet prior ("Fightin' Words"): for token
    * w in group L vs the rest R, with the corpus as prior
    * (α_w = a0·y0_w/n0),
    *
    *   δ = ln((y_L+α)/(n_L+a0−y_L−α)) − ln((y_R+α)/(n_R+a0−y_R−α))
    *   z = δ / sqrt(1/(y_L+α) + 1/(y_R+α))
    *
    * The curation question it answers: which tokens make this language
    * / source / time-slice LOOK different — raw frequency ratios
    * overweight rare terms; the prior + variance term fixes that.
    *
    * Engine-exact by construction: every z is ONE fixed expression tree
    * over exact integer counts (no multi-term float summation anywhere),
    * so both engines produce bit-identical doubles and the top-k order
    * (z desc, token) cannot diverge; the emitted z still rounds 6 by
    * convention. Scale shape: one (group, token) count aggregate, one
    * token-marginal aggregate joined back on token, rank-cap top-k per
    * group — vocabulary-sized frames after the first exchange.
    */
  def logOddsTerms(docs: DataFrame, groupCol: String, textCol: String,
                   a0: Long, minCount: Long, k: Int): DataFrame = {
    // (group, token) counts feed four consumers (group totals, token
    // marginals, corpus total, the scored join): persist so the token
    // explode over the corpus runs once
    val cnt = graft.CacheScope.track(docs
      .select(col(groupCol).as("g"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("g", "token").agg(count(lit(1)).as("yl"))
      .persist())
    val gTot = cnt.groupBy("g").agg(sum("yl").as("nl"))
    val wTot = cnt.groupBy("token").agg(sum("yl").as("y0"))
      .filter(col("y0") >= minCount)
    val n0 = cnt.agg(sum("yl").as("n0"))
    val scored = cnt
      .join(wTot, "token") // vocab-sized, shuffles on token once
      .join(broadcast(gTot), "g")
      .crossJoin(broadcast(n0))
      .withColumn("alpha", lit(a0) * col("y0") / col("n0"))
      .withColumn("yr", col("y0") - col("yl"))
      .withColumn("nr", col("n0") - col("nl"))
      .withColumn("delta",
        log((col("yl") + col("alpha")) /
          (col("nl") + lit(a0) - col("yl") - col("alpha"))) -
          log((col("yr") + col("alpha")) /
            (col("nr") + lit(a0) - col("yr") - col("alpha"))))
      .withColumn("z", col("delta") /
        sqrt(lit(1.0) / (col("yl") + col("alpha")) +
          lit(1.0) / (col("yr") + col("alpha"))))
    Sampling.topKPerGroup(scored, Seq("g"), k, col("z").desc, col("token"))
      .select(col("g").as(groupCol), col("token"), col("yl").as("y"),
        round(col("z"), 6).as("z"))
  }
}
