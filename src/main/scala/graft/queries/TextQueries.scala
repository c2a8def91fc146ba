package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Text analysis + curation: quality signals, language ID,
  * BPE, retrieval (TF-IDF/BM25), decontamination, packing/mixing twins.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object TextQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Text analysis: exact per-doc token statistics
    "q21_token_stats" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.distinctTokenCount(col("text")).cast("long")
          .as("n_distinct"),
        col("n_chars"),
        TextFunctions.stopwordCount(col("text")).as("n_stop"))),

    // Text analysis: marker-vote language id
    "q22_langid" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"))),

    // Fingerprint: md5 digest per document
    "q25_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))),

    // TF/DF term statistics: one explode pass, df = partial-agg groupBy
    // on the tf rows joined back (never a second corpus scan, and no
    // raw-token window that would funnel a hot token into one reducer)
    "q50_term_stats" -> ((s, d) =>
      graft.operators.Frequency.termDocStats(
        Tables.documents(s, d), "doc_id", "text")),

    // TF-IDF weighting: tf/df ride the termDocStats shuffles, N arrives
    // via a broadcast one-row aggregate (never a global window)
    "q58_tfidf" -> ((s, d) =>
      graft.operators.Frequency.tfidf(
        Tables.documents(s, d), "doc_id", "text")),

    // Repetition quality signals (Gopher-style): duplicate-word and
    // duplicate-trigram ratios per document — the standard "boilerplate /
    // degenerate text" filter feature in corpus curation
    "q62_repetition" -> ((s, d) => {
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val tri = TextFunctions.shinglesFromTokens(col("toks"), 3)
      staged.select(col("doc_id"),
        round(lit(1.0) -
          size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")), 6).as("dup_word_ratio"),
        when(size(tri) > 0,
          round(lit(1.0) -
            size(array_distinct(tri)).cast("double") / size(tri), 6))
          .otherwise(lit(0.0)).as("dup_trigram_ratio"))
    }),

    // Training-sequence packing: concat-then-chunk under a token budget.
    // The global token offset is a range-partitioned cumsum (one
    // per-partition-totals job), never a single-partition window. Token
    // counts are computed BEFORE packChunks so only (doc_id, n_tokens) —
    // two longs per row, not the document text — rides the range
    // exchange and the persist.
    "q70_pack_chunks" -> ((s, d) =>
      graft.operators.Packing.packChunks(
        Tables.documents(s, d).select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text"))
            .cast("long").as("n_tokens")),
        col("n_tokens"), 2048L, col("doc_id"))
        .select("doc_id", "n_tokens", "pack_id", "offset_in_pack",
          "n_packs_spanned")),

    // Quality-filter manifest: length band + language-ID agreement ->
    // keep/drop per doc, all per-row codegen'd expressions
    "q72_quality_filter" -> ((s, d) => {
      val t = graft.functions.TextFunctions
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          t.tokenCount(col("text")).cast("long").as("n_tokens"),
          t.langId(col("text")).as("lang_pred"))
        .withColumn("keep",
          (col("n_tokens").between(20, 1000) &&
            col("lang_pred") === col("lang")).cast("long"))
    }),

    // BPE-ish token counting next to whitespace counting — the budget
    // currency for packing/selection. Pattern chosen for cross-engine
    // regex parity (disjoint alternatives; see TextFunctions scaladoc).
    "q74_bpe_tokens" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_ws"))),

    // Benchmark decontamination manifest: corpus vs a deterministic
    // "benchmark" slice of itself (doc_id % 41 = 0) on 5-gram overlap.
    // Benchmark docs are their own exact hit, so the flag is guaranteed
    // non-trivial on gate data.
    "q75_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Decontaminate.overlap(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") % 41 === 0), "text",
        n = 5, minOverlap = 1)
    }),

    // Token-budget selection: seeded deterministic shuffle + distributed
    // running total, keep the prefix within budget (~half the sf tokens).
    "q76_token_budget" -> ((s, d) => {
      // token counts are evaluated BEFORE the range exchange: only
      // (doc_id, n_bpe) ride the shuffle, never the text
      val counted = Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
      graft.operators.Sampling.tokenBudgetSelect(
        counted, "doc_id", col("n_bpe"), budget = 15000L, seed = "s5")
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
    }),

    // Sliding-window chunking: 16-token windows every 8 tokens over the
    // BPE count — the long-context training prep step. Pure per-doc
    // explode, no shuffle.
    "q77_chunk_windows" -> ((s, d) =>
      graft.operators.Packing.chunkWindows(
        Tables.documents(s, d).select(col("doc_id"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe")),
        "doc_id", col("n_bpe"), window = 16, stride = 8)
        .withColumnRenamed("id", "doc_id")),

    // End-to-end curation: quality filter -> normalized exact dedup ->
    // benchmark decontamination -> token-budget selection, composed from
    // the individually-oracled operators exactly as a pipeline user
    // would. Composition adds only key-partitioned semi/anti joins and
    // the operators' own broadcast/agg shapes — no new scale risk.
    "q78_curation_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // The quality stage is read by four downstream consumers (dedup
      // agg, semi-join left side, decontamination grams, token counting)
      // — persist the stage boundary or the langId regex pass runs over
      // the corpus four times. CacheScope-tracked like every internal
      // operator cache.
      val quality = graft.CacheScope.track(docs.filter(
        TextFunctions.tokenCount(col("text")).between(20, 1000) &&
          TextFunctions.langId(col("text")) === col("lang"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val keepers = Dedup.normalizedExactDups(quality, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val deduped = quality.join(keepers, Seq("doc_id"), "left_semi")
      val flagged = graft.operators.Decontaminate.overlap(
        deduped, "doc_id", "text",
        docs.filter(col("doc_id") % 41 === 0), "text",
        n = 5, minOverlap = 1)
        .filter(col("contaminated") === 1L)
        .select("doc_id")
      val clean = deduped.join(flagged, Seq("doc_id"), "left_anti")
      val counted = clean.select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
      graft.operators.Sampling.tokenBudgetSelect(
        counted, "doc_id", col("n_bpe"), budget = 8000L, seed = "cur")
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
    }),

    // Per-source quality cap: keep each source's 10 longest docs
    // (doc_id tie-break). One hash exchange + in-partition rank.
    "q79_source_cap" -> ((s, d) =>
      graft.operators.Sampling.topKPerGroup(
        Tables.documents(s, d), Seq("source"), 10,
        col("n_chars").desc, col("doc_id"))
        .select(col("doc_id"), col("source"), col("n_chars"))),

    // Materialized training sequences: concat each 2048-token pack's
    // docs (doc_id order) into one text. Group size bounded by the
    // budget by construction.
    "q80_pack_texts" -> ((s, d) =>
      graft.operators.Packing.materializePacks(
        Tables.documents(s, d), col("text"),
        TextFunctions.bpeTokenCount(col("text")), 2048L, col("doc_id"))),

    // Weighted corpus mix: even doc_ids as "web" at 192/256, odd as
    // "books" at 64/256 — per-source salted hash, stateless filters.
    "q81_weighted_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Sampling.weightedMix(Seq(
        ("web", docs.filter(col("doc_id") % 2 === 0), 192),
        ("books", docs.filter(col("doc_id") % 2 === 1), 64)), "doc_id")
        .select(col("doc_id"), col("mix_source"))
    }),

    // Leakage-safe train/test split: near-dup docs travel TOGETHER (the
    // split key is the dedup component, not the doc), so a test doc can
    // never have a train-side near-duplicate — the q47 graph + q52 hash
    // split composed.
    "q87_leakage_split" -> ((s, d) =>
      graft.operators.Sampling.hashSplit(
        nearDupComponents(s, d)
          .select(col("id").as("doc_id"), col("component")),
        "component", 64)),

    // PII redaction gate (corpus-scrub stage): deterministic synthetic
    // PII (email + IPv4 + phone, derived from doc_id) is injected into
    // every document so the redaction demonstrably fires on gate data,
    // then TextFunctions.redact scrubs it and the FULL redacted text is
    // hash-compared against DuckDB applying the identical regex chain.
    // Patterns are deliberately Java/RE2-portable (ASCII classes, no
    // lookaround, no backrefs); application order (email, IP, phone)
    // matters — an IPv4 also matches the phone shape — and the oracle
    // nests its regexp_replace calls in the same order.
    "q102_pii_redact" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        graft.functions.TextFunctions.redact(
          concat(col("text"),
            lit(" contact user"), col("doc_id"),
            lit("@mail"), pmod(col("doc_id"), lit(7)),
            lit(".com from 10."), pmod(col("doc_id"), lit(256)),
            lit(".0."), pmod(col("doc_id"), lit(100)),
            lit(" tel +1 555 "),
            (lit(1000000L) + pmod(col("doc_id"), lit(9000000L)))))
          .as("clean"))),

    // Unigram-LM quality scoring (Frequency.unigramLogProb): the
    // perplexity-style curation filter, engine-exact via micro-nat
    // integer log sums (round ln once per token, then pure long
    // arithmetic — no fold-order contract).
    "q147_unigram_logprob" -> ((s, d) =>
      graft.operators.Frequency.unigramLogProb(
        Tables.documents(s, d), "doc_id", "text")),

    // Chi-square token-vs-source association (Frequency.chi2Association):
    // integer contingency cells, one fixed-order double expression for
    // the statistic (long-exact products at gate scale).
    "q149_chi2" -> ((s, d) =>
      graft.operators.Frequency.chi2Association(
        Tables.documents(s, d), "doc_id", "text", "source", minDf = 10L)),

    // BM25 retrieval (Frequency.bm25TopK): fixed query-term set from
    // the shared synthetic vocabulary; micro-unit integer score sums.
    "q150_bm25" -> ((s, d) =>
      graft.operators.Frequency.bm25TopK(
        Tables.documents(s, d), "doc_id", "text",
        Seq("data", "scan", "merge"), k = 100)),

    // First-order Markov transition matrix over per-user event
    // sequences (Journey.transitions): total (ts, event_id) order, lead
    // pairing, explicit 'end' state, exact counts + one rounded row
    // division.
    "q152_markov" -> ((s, d) =>
      graft.operators.Journey.transitions(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id")),

    // Temperature-scaled language rebalancing (Sampling.temperatureMix):
    // quotas proportional to sqrt(count) with the head language capped
    // at 150 — en is clipped, the tail languages keep more of their mass
    // (whole sources at sf0.01, scaled quotas at sf0.1).
    "q156_temperature_mix" -> ((s, d) =>
      graft.operators.Sampling.temperatureMix(
        Tables.documents(s, d), "lang", "doc_id", cap = 150)),

    // Inverted-index build (Frequency.invertedIndex): capped posting
    // lists (top 10 docs per token by tf, doc_id tie-break) + per-token
    // df/cf — the retrieval artifact behind q150's BM25. The salted
    // two-phase cap bounds the hottest token's window at cap·salts rows.
    "q159_inverted_index" -> ((s, d) =>
      graft.operators.Frequency.invertedIndex(
        Tables.documents(s, d), "doc_id", "text", cap = 10)),

    // Bigram collocation detection (Frequency.collocations): integer
    // cross-multiplied lift >= 21/20 with minCount 5. The near-uniform
    // synthetic corpus concentrates lift around 1.0, so the rational
    // threshold is what keeps both arms live (344 of 900 candidate
    // bigrams accepted at sf0.01, 200 of 927 at sf0.1).
    "q160_collocations" -> ((s, d) =>
      graft.operators.Frequency.collocations(
        Tables.documents(s, d), "doc_id", "text",
        liftNum = 21, liftDen = 20, minCount = 5)),

    // Dataset card (Expectations.corpusCard): per-(source, lang) corpus
    // profile — doc/token/char volumes, length extremes, normalized-
    // exact duplicate rate in integer basis points.
    "q161_dataset_card" -> ((s, d) =>
      graft.operators.Expectations.corpusCard(
        Tables.documents(s, d), Seq("source", "lang"), "text")),

    // Trained multinomial Naive Bayes language classifier
    // (Classifier.naiveBayes): Laplace-smoothed, trained on the 75%
    // md5-split, scored on the held-out 25% — every parameter and every
    // document score is an exact micro-nat LONG (q147 discipline), so
    // train+predict are hash-exact across engines. The learned upgrade
    // of q22's heuristic langid.
    "q245_naive_bayes" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bucket = substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      graft.operators.Classifier.naiveBayes(
        docs.filter(bucket >= "40"), docs.filter(bucket < "40"),
        "doc_id", "text", "lang")
    }),

    // Classifier evaluation (Classifier.evaluatePerClass): per-class
    // exact confusion counts + basis-point precision/recall/F1 over
    // q245's held-out predictions — the model-eval step of the trained
    // pipeline, every ratio one integer division.
    "q246_classifier_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bucket = substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 2)
      val preds = graft.operators.Classifier.naiveBayes(
        docs.filter(bucket >= "40"), docs.filter(bucket < "40"),
        "doc_id", "text", "lang")
      graft.operators.Classifier.evaluatePerClass(preds, "lang", "pred")
    }),

    // Distinctive terms per lang (Frequency.logOddsTerms): Monroe
    // weighted log-odds vs the rest with a corpus Dirichlet prior
    // (a0=1000). Each z is one fixed expression tree over exact counts,
    // so the top-10 rank (z desc, token) is engine-identical even
    // before the round(…,6).
    "q235_log_odds_terms" -> ((s, d) =>
      graft.operators.Frequency.logOddsTerms(
        Tables.documents(s, d), "lang", "text",
        a0 = 1000, minCount = 20, k = 10)),

    // Bigram conditional LM score (Frequency.bigramLogProb): q147's
    // order-2 upgrade — per-doc mean ln P(b|a) in exact micro-nat
    // integer sums, one rounded division.
    "q163_bigram_lm" -> ((s, d) =>
      graft.operators.Frequency.bigramLogProb(
        Tables.documents(s, d), "doc_id", "text")),

    // HTML boilerplate extraction (TextFunctions.extractHtmlText): each
    // document wrapped in a deterministic HTML template (title/script/
    // style chrome, nav and footer divs, entity-escaped second
    // paragraph), then extracted by the regex chain. matches_original
    // certifies per row that extraction recovers exactly the known
    // content — and the oracle re-runs the identical chain in RE2.
    "q167_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>.x{color:red}</style><script>var n="),
        col("doc_id"), lit(";</script></head><body>"),
        lit("<div class=\"nav\"><a href=\"/\">home</a> | "),
        lit("<a href=\"/about\">about</a></div><p>"), col("text"),
        lit("</p><p>fish &amp; chips &lt;tag&gt; &quot;q&quot;</p>"),
        lit("<div class=\"footer\">site "), col("doc_id"),
        lit("</div></body></html>"))
      val expected = concat(col("text"),
        lit(" fish & chips <tag> \"q\""))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextFunctions.extractHtmlText(html)
            .as("extracted"),
          expected.as("expected"))
        .select(col("doc_id"), col("extracted"),
          length(col("extracted")).cast("long").as("n_chars"),
          (col("extracted") === col("expected")).as("matches_original"))
    }),

    // Semantic decontamination (Decontaminate.semanticOverlap): the
    // paraphrase net over embeddings — a FIXED 40-vector benchmark
    // (broadcast; benchmarks are an external constant, they do not
    // grow with the corpus — which is also what keeps the scan linear
    // in the ScaleSmoke sweep), the rest is the corpus; one fused
    // cosine scan + one per-id max. tau = 0.35 sits near p95 of the
    // max-sim distribution, so both arms of the flag are populated
    // (38/460 and 165/1960 contaminated).
    "q171_semantic_decontam" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      graft.operators.Decontaminate.semanticOverlap(
        e.filter(col("vec_id") >= 40), "vec_id", "embedding",
        e.filter(col("vec_id") < 40), "embedding",
        tau = 0.35)
    }),

    // BPE merge-rule training (Frequency.bpeMerges): the first 3
    // data-DEPENDENT merges — each round's winner shapes the next
    // round's pair counts, the tokenizer-training loop. One corpus
    // pass (word→freq vocabulary contraction), then vocab-sized
    // rounds; the oracle replays the identical 3-round scalar-
    // subquery chain, so a wrong winner in ANY round cascades into a
    // hash mismatch.
    "q172_bpe_train" -> ((s, d) =>
      graft.operators.Frequency.bpeMerges(
        Tables.documents(s, d), "doc_id", "text", rounds = 3)),

    // Hybrid retrieval via reciprocal-rank fusion (Retrieval.rrfFuse):
    // q150's lexical BM25 top-100 and a q24-style cosine top-100 (query
    // = vec_id 0's embedding, joined on doc_id = vec_id) fused as exact
    // integer micro-RRF — no comparable scores needed, no float
    // accumulation. The expensive work stays in the two rankers; fusion
    // is a union + one hash agg over <= 200 rows.
    "q175_hybrid_retrieval" -> ((s, d) => {
      val bm = graft.operators.Frequency.bm25TopK(
        Tables.documents(s, d), "doc_id", "text",
        Seq("data", "scan", "merge"), k = 100)
        .select(col("doc_id"), col("rank"))
      val e = Tables.embeddings(s, d)
      val cos = graft.operators.Similarity.bruteForceTopK(
        e.filter(col("vec_id") === 0)
          .select(col("vec_id").as("query_id"), col("embedding")),
        e, k = 100)
        .select(col("vec_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(bm, cos), "doc_id", "rank")
    }),

    // BPE train -> apply (Frequency.bpeTrainApply): q172's three
    // learned merges applied to every DOCUMENT (not just the vocab),
    // reporting the per-doc unit inventory before/after — the deploy
    // half of the tokenizer loop. In-place ·x· wrapping leaves spaces
    // bare, so merges can never cross token boundaries; the after
    // count is pure arithmetic on '··' occurrences, no second
    // tokenize.
    "q178_bpe_apply" -> ((s, d) =>
      graft.operators.Frequency.bpeTrainApply(
        Tables.documents(s, d), "doc_id", "text", rounds = 3)),

    // Gopher-style repetition battery (Frequency.gopherRepetition):
    // top-{2,3,4}-gram character coverage + duplicated-gram coverage
    // per doc, exact integer basis points, one doc-keyed exchange for
    // both aggregates (posexplode once, all gram widths per position).
    // dupN = 3 (not Gopher's 5): the synthetic 30-token vocabulary has
    // no within-doc 5-gram repeats at all, while ~5% of docs repeat a
    // 3-gram — the narrower width keeps the dup arm live. Thresholds
    // sit inside the corpus's bps distribution at both scales.
    "q179_gopher_rep" -> ((s, d) =>
      graft.operators.Frequency.gopherRepetition(
        Tables.documents(s, d), "doc_id", "text",
        dupMax = 800, dupN = 3)),

    // Association rules (Association.basketRules): brand-level baskets
    // (order x p_brand via the part dim join), directed pair rules under
    // exact integer support/confidence/lift cuts (lift in DECIMAL(38,0),
    // the q160 discipline). Pair fan-out is bounded by distinct brands
    // per order, not the corpus. Brands co-occur independently in this
    // fixture, so observed lift concentrates toward 1.0 as N grows
    // (p99 = 1.077 at sf0.01, 1.010 at sf0.1) — the cut must sit just
    // above 1 (1001/1000) for the accept arm to survive both scales;
    // conf >= 1/7 sits mid-distribution at both.
    "q181_assoc_rules" -> ((s, d) => {
      val b = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      graft.operators.Association.basketRules(b, "basket", "item",
        minSupport = 5, confNum = 1, confDen = 7,
        liftNum = 1001, liftDen = 1000)
    }),

    // Vocabulary coverage / OOV gate (Frequency.vocabCoverage): top-28
    // token vocab trained on the corpus (count desc, token asc), every
    // doc scored for out-of-vocab rate in integer bps — the
    // tokenizer-fit check before committing a vocab (q162's
    // train-then-apply pattern at the vocabulary level). k = 28 of the
    // corpus's 31 distinct tokens puts the fully-covered arm at 45/455
    // (sf0.01) — smaller k kills it, k = 31 kills the OOV arm.
    "q184_vocab_coverage" -> ((s, d) =>
      graft.operators.Frequency.vocabCoverage(
        Tables.documents(s, d), "doc_id", "text", k = 28)),

    // Autocomplete prefix index (Frequency.prefixCompletions): top-3
    // completions per 1..3-char token prefix by (count desc, token) —
    // prefixes explode off the VOCABULARY contraction, never per
    // occurrence.
    "q211_autocomplete" -> ((s, d) =>
      graft.operators.Frequency.prefixCompletions(
        Tables.documents(s, d), "text", maxPrefix = 3, k = 3)),

    // Token-distribution entropy (Frequency.tokenEntropy): per-doc
    // Shannon entropy in micro-nats under the q147 one-rounding-per-ln
    // discipline — the vocabulary-flatness quality signal.
    "q221_token_entropy" -> ((s, d) =>
      graft.operators.Frequency.tokenEntropy(
        Tables.documents(s, d), "doc_id", "text")),

    // Simpson diversity (Frequency.simpsonDiversity): exact rational
    // two-draw concentration per user over event types, bps, no float
    // anywhere — the integer-only sibling of q221.
    "q222_simpson" -> ((s, d) =>
      graft.operators.Frequency.simpsonDiversity(
        Tables.events(s, d), Seq("user_id"), "event_type")),
  )

  // q245's full train+predict chain, shared verbatim by q246's eval
  // oracle (the eval must judge EXACTLY the predictions q245 emits)
  private val nbPredictSql: String =
    """WITH tr AS (SELECT * FROM documents
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '40'),
      |te AS (SELECT * FROM documents
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'),
      |tok AS (SELECT lang AS c, unnest(string_split(text, ' ')) AS t
      |  FROM tr),
      |ct AS (SELECT c, t, count(*) AS cnt FROM tok GROUP BY 1, 2),
      |ncl AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS n_c FROM ct
      |  GROUP BY 1),
      |voc AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM ct),
      |dcs AS (SELECT lang AS c, count(*) AS docs_c FROM tr GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS docs FROM tr),
      |cls AS (SELECT d.c,
      |    CAST(round(ln(d.docs_c / CAST(tot.docs AS DOUBLE))
      |      * 1000000, 0) AS BIGINT) AS prior_micro,
      |    CAST(round(ln(1 / CAST(n.n_c + voc.v AS DOUBLE))
      |      * 1000000, 0) AS BIGINT) AS l0_micro,
      |    n.n_c, voc.v
      |  FROM dcs d JOIN ncl n USING (c), voc, tot),
      |seen AS (SELECT ct.t, ct.c,
      |    CAST(round(ln((ct.cnt + 1) / CAST(cls.n_c + cls.v AS DOUBLE))
      |      * 1000000, 0) AS BIGINT) AS l_micro
      |  FROM ct JOIN cls USING (c)),
      |tt AS (SELECT doc_id AS id, lang AS truth, t, count(*) AS tf
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
      |    FROM te) GROUP BY 1, 2, 3),
      |sc AS (SELECT tt.id, tt.truth, cls.c,
      |    max(cls.prior_micro) + CAST(sum(tt.tf
      |      * coalesce(seen.l_micro, cls.l0_micro)) AS BIGINT)
      |      AS score_micro
      |  FROM tt CROSS JOIN cls
      |  LEFT JOIN seen ON seen.t = tt.t AND seen.c = cls.c
      |  GROUP BY 1, 2, 3),
      |pr AS (SELECT id AS doc_id, truth AS lang, c AS pred, score_micro,
      |    c = truth AS correct
      |  FROM sc QUALIFY row_number() OVER (PARTITION BY id
      |    ORDER BY score_micro DESC, c) = 1)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q21_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  n_chars,
        |  (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
        |  + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3
        |    AS n_stop
        |FROM documents""".stripMargin,

    "q22_langid" -> (langVotesSql +
      """SELECT doc_id, lang,
        |  CASE WHEN v_en = best AND v_en > 0 THEN 'en'
        |       WHEN v_es = best AND v_es > 0 THEN 'es'
        |       WHEN v_fr = best AND v_fr > 0 THEN 'fr'
        |       WHEN v_de = best AND v_de > 0 THEN 'de'
        |       ELSE 'und' END AS lang_pred
        |FROM votes""".stripMargin),

    "q25_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp FROM documents""".stripMargin,

    "q87_leakage_split" -> (ccReachCtes +
      """
        |, comp AS (SELECT id AS doc_id, min(r) AS component
        |  FROM reach GROUP BY id)
        |SELECT doc_id, component,
        |  CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 2) < '40'
        |    THEN 'test' ELSE 'train' END AS split
        |FROM comp""".stripMargin),

    "q50_term_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token)
        |SELECT doc_id, token, tf,
        |  count(*) OVER (PARTITION BY token) AS df
        |FROM tf""".stripMargin,

    "q58_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM tf GROUP BY doc_id, token),
        |withdf AS (
        |  SELECT doc_id, token, tf,
        |    count(*) OVER (PARTITION BY token) AS df
        |  FROM stats)
        |SELECT doc_id, token, tf, df,
        |  round(tf * ln((SELECT count(*) FROM documents) / CAST(df AS DOUBLE)), 6) AS tfidf
        |FROM withdf""".stripMargin,

    "q62_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) >= 3 THEN list_transform(
        |      range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
        |    ELSE CAST([] AS VARCHAR[]) END AS tri
        |  FROM t)
        |SELECT doc_id,
        |  round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
        |    AS dup_word_ratio,
        |  CASE WHEN len(tri) > 0 THEN
        |    round(1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri), 6)
        |  ELSE 0.0 END AS dup_trigram_ratio
        |FROM s""".stripMargin,

    "q70_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - n_tokens AS st
        |  FROM t)
        |SELECT doc_id, n_tokens, st // 2048 AS pack_id,
        |  st % 2048 AS offset_in_pack,
        |  CASE WHEN n_tokens > 0
        |    THEN (st % 2048 + n_tokens - 1) // 2048 + 1
        |    ELSE 1 END AS n_packs_spanned
        |FROM c""".stripMargin,

    "q72_quality_filter" -> (langVotesSql.stripSuffix("\n") +
      """SELECT v.doc_id, v.lang,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  CASE WHEN v_en = best AND v_en > 0 THEN 'en'
        |       WHEN v_es = best AND v_es > 0 THEN 'es'
        |       WHEN v_fr = best AND v_fr > 0 THEN 'fr'
        |       WHEN v_de = best AND v_de > 0 THEN 'de'
        |       ELSE 'und' END AS lang_pred,
        |  CAST(CASE WHEN len(string_split(d.text, ' ')) BETWEEN 20 AND 1000
        |    AND (CASE WHEN v_en = best AND v_en > 0 THEN 'en'
        |       WHEN v_es = best AND v_es > 0 THEN 'es'
        |       WHEN v_fr = best AND v_fr > 0 THEN 'fr'
        |       WHEN v_de = best AND v_de > 0 THEN 'de'
        |       ELSE 'und' END) = v.lang THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM votes v JOIN documents d USING (doc_id)""".stripMargin),

    // regexp_extract_all exists in both engines; the pattern's
    // alternatives match disjoint first-character classes so Java regex
    // and DuckDB's RE2 tokenize identically (TextFunctions scaladoc).
    "q74_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS n_bpe,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws
        |FROM documents""".stripMargin,

    "q75_decontaminate" -> sqlQ75Decontaminate,

    "q76_token_budget" -> sqlQ76TokenBudget,

    // range(0, n, stride) enumerates the same starts as Spark's
    // sequence(0, n-1, stride); integer division gives the chunk index
    "q77_chunk_windows" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(s // 8 AS BIGINT) AS chunk_idx,
        |  CAST(s AS BIGINT) AS tok_start,
        |  CAST(least(16, n - s) AS BIGINT) AS tok_len
        |FROM t, unnest(range(0, n, 8)) AS u(s)""".stripMargin,

    "q78_curation_pipeline" -> sqlQ78Curation,

    "q79_source_cap" ->
      """SELECT doc_id, source, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY n_chars DESC, doc_id) <= 10""".stripMargin,

    // same pack assignment as q70 (exclusive prefix sum div budget) on
    // the BPE count, then ordered string_agg per pack
    "q80_pack_texts" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n_tok,
        |    CAST(sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - n_tok AS st
        |  FROM t)
        |SELECT st // 2048 AS pack_id,
        |  string_agg(text, ' ' ORDER BY doc_id) AS text,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1""".stripMargin,

    // 192 = 0xc0, 64 = 0x40; salt = source name + ':'
    "q81_weighted_mix" ->
      """SELECT doc_id, 'web' AS mix_source FROM documents
        |WHERE doc_id % 2 = 0
        |  AND substr(md5('web:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'c0'
        |UNION ALL
        |SELECT doc_id, 'books' FROM documents
        |WHERE doc_id % 2 = 1
        |  AND substr(md5('books:' || CAST(doc_id AS VARCHAR)), 1, 2) < '40'
        |""".stripMargin,

    "q102_pii_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail' || CAST(doc_id % 7 AS VARCHAR)
        |      || '.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
        |      || ' tel +1 555 '
        |      || CAST(1000000 + doc_id % 9000000 AS VARCHAR),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS clean
        |FROM documents""".stripMargin,

    // Identical quota formula: sqrt/divide/multiply/floor are all
    // IEEE-correctly-rounded, so the quota boundary is engine-exact.
    "q156_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS src_n FROM documents GROUP BY lang),
        |m AS (SELECT max(src_n) AS cmax FROM c),
        |q AS (
        |  SELECT lang, src_n,
        |    CAST(floor(150 * sqrt(CAST(src_n AS DOUBLE))
        |      / sqrt(CAST(cmax AS DOUBLE))) AS BIGINT) AS quota
        |  FROM c, m),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.lang, q.src_n, q.quota
        |FROM r JOIN q ON q.lang = r.lang
        |WHERE r.rk <= q.quota""".stripMargin,

    // The two-phase salted cap is lossless, so the oracle ranks plainly.
    "q159_inverted_index" ->
      """WITH tf AS (
        |  SELECT token, doc_id, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  GROUP BY 1, 2)
        |SELECT token,
        |  count(*) OVER (PARTITION BY token) AS df,
        |  CAST(sum(tf) OVER (PARTITION BY token) AS BIGINT) AS cf,
        |  row_number() OVER (PARTITION BY token
        |    ORDER BY tf DESC, doc_id ASC) AS rank,
        |  doc_id, tf
        |FROM tf
        |QUALIFY rank <= 10""".stripMargin,

    "q160_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tot AS (
        |  SELECT CAST(sum(len(t)) AS BIGINT) AS n_uni,
        |    CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS n_big
        |  FROM toks),
        |uni AS MATERIALIZED (
        |  SELECT token, count(*) AS c FROM (
        |    SELECT unnest(t) AS token FROM toks) GROUP BY 1),
        |bgc AS (
        |  SELECT s, count(*) AS c_ab FROM (
        |    SELECT unnest(list_transform(range(1, len(t)),
        |      i -> t[i] || ' ' || t[i + 1])) AS s FROM toks)
        |  GROUP BY 1 HAVING count(*) >= 5),
        |sp AS (
        |  SELECT string_split(s, ' ')[1] AS a, string_split(s, ' ')[2] AS b,
        |    c_ab FROM bgc)
        |SELECT sp.a, sp.b, sp.c_ab, ua.c AS c_a, ub.c AS c_b
        |FROM sp
        |JOIN uni ua ON ua.token = sp.a
        |JOIN uni ub ON ub.token = sp.b, tot
        |WHERE CAST(sp.c_ab AS HUGEINT) * n_uni * n_uni * 20
        |  >= 21 * CAST(n_big AS HUGEINT) * ua.c * ub.c""".stripMargin,

    // Same micro-nat discipline as q147, at order 2: conditional
    // ln(c_ab / c_a-prefix), each ln rounded once, exact integer sums.
    "q163_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tf AS (
        |  SELECT doc_id, s, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |      i -> t[i] || ' ' || t[i + 1])) AS s FROM toks)
        |  GROUP BY doc_id, s),
        |bg AS (
        |  SELECT s, CAST(sum(tf) AS BIGINT) AS c_ab FROM tf GROUP BY s),
        |pre AS (
        |  SELECT string_split(s, ' ')[1] AS a,
        |    CAST(sum(c_ab) AS BIGINT) AS c_a
        |  FROM bg GROUP BY 1),
        |cond AS (
        |  SELECT s,
        |    CAST(round(ln(CAST(c_ab AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |      - CAST(round(ln(CAST(c_a AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |      AS cond_micro
        |  FROM bg JOIN pre ON pre.a = string_split(bg.s, ' ')[1])
        |SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
        |  CAST(sum(t.tf * c.cond_micro) AS BIGINT) AS lp_micro,
        |  round(CAST(sum(t.tf * c.cond_micro) AS DOUBLE)
        |    / (CAST(sum(t.tf) AS DOUBLE) * 1e6), 6) AS avg_logprob
        |FROM tf t JOIN cond c USING (s)
        |GROUP BY t.doc_id""".stripMargin,

    // The identical wrap + strip chain in RE2 ('g' = global, inline
    // (?s) dotall); &amp; unescapes last on both sides.
    "q167_html_extract" ->
      """WITH wrapped AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id ||
        |    '</title><style>.x{color:red}</style><script>var n=' ||
        |    doc_id || ';</script></head><body>' ||
        |    '<div class="nav"><a href="/">home</a> | ' ||
        |    '<a href="/about">about</a></div><p>' || text ||
        |    '</p><p>fish &amp; chips &lt;tag&gt; &quot;q&quot;</p>' ||
        |    '<div class="footer">site ' || doc_id ||
        |    '</div></body></html>' AS html,
        |    text || ' fish & chips <tag> "q"' AS expected
        |  FROM documents),
        |ext AS (
        |  SELECT doc_id, expected,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(regexp_replace(
        |          regexp_replace(regexp_replace(html,
        |            '(?s)<script.*?</script>', ' ', 'g'),
        |          '(?s)<style.*?</style>', ' ', 'g'),
        |          '(?s)<title.*?</title>', ' ', 'g'),
        |          '(?s)<div class="(nav|footer)">.*?</div>', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS extracted
        |  FROM wrapped)
        |SELECT doc_id, extracted,
        |  CAST(len(extracted) AS BIGINT) AS n_chars,
        |  extracted = expected AS matches_original
        |FROM ext""".stripMargin,

    // q24's cosine expression verbatim (round 6 before the max; round
    // is monotone so max(round) = round(max)), grouped to the per-id
    // flag.
    "q171_semantic_decontam" ->
      """WITH b AS (
        |  SELECT embedding AS bq FROM embeddings WHERE vec_id < 40),
        |s AS (
        |  SELECT e.vec_id,
        |    round(list_sum(list_transform(list_zip(e.embedding, b.bq),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.bq,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))), 6) AS sim
        |  FROM embeddings e, b WHERE e.vec_id >= 40)
        |SELECT vec_id, max(sim) AS max_sim,
        |  max(sim) >= 0.35 AS contaminated
        |FROM s GROUP BY 1""".stripMargin,

    // The identical 3-round merge chain as scalar-subquery CTEs: each
    // round's (count -> top-1 -> literal replace) feeds the next, so a
    // wrong winner in any round cascades. ·x· wrapping as in the Spark
    // side (each symbol owns both delimiters — back-to-back merges).
    "q172_bpe_train" ->
      """WITH w AS (
        |  SELECT tok AS w, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE len(tok) > 0 GROUP BY 1),
        |s0 AS (SELECT regexp_replace(w, '(.)', '·\1·', 'g') AS seq, freq FROM w),
        |c0 AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT unnest(list_zip(la[1:len(la)-1], la[2:len(la)])) AS p, freq
        |         FROM (SELECT string_split(substr(seq, 2, len(seq) - 2), '··') AS la,
        |                 freq FROM s0))
        |       GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
        |s1 AS (SELECT replace(seq,
        |         '·' || (SELECT a FROM c0) || '··' || (SELECT b FROM c0) || '·',
        |         '·' || (SELECT a FROM c0) || (SELECT b FROM c0) || '·') AS seq,
        |         freq FROM s0),
        |c1 AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT unnest(list_zip(la[1:len(la)-1], la[2:len(la)])) AS p, freq
        |         FROM (SELECT string_split(substr(seq, 2, len(seq) - 2), '··') AS la,
        |                 freq FROM s1))
        |       GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1),
        |s2 AS (SELECT replace(seq,
        |         '·' || (SELECT a FROM c1) || '··' || (SELECT b FROM c1) || '·',
        |         '·' || (SELECT a FROM c1) || (SELECT b FROM c1) || '·') AS seq,
        |         freq FROM s1),
        |c2 AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |         SELECT unnest(list_zip(la[1:len(la)-1], la[2:len(la)])) AS p, freq
        |         FROM (SELECT string_split(substr(seq, 2, len(seq) - 2), '··') AS la,
        |                 freq FROM s2))
        |       GROUP BY 1, 2 ORDER BY cnt DESC, a, b LIMIT 1)
        |SELECT CAST(0 AS BIGINT) AS round, a AS sym_a, b AS sym_b,
        |  a || b AS merged, cnt FROM c0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), a, b, a || b, cnt FROM c1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), a, b, a || b, cnt FROM c2""".stripMargin,

    // q150's BM25 chain + a q24-style single-query cosine ranking,
    // fused with exact integer micro-RRF (1000000 // (60 + rank)).
    "q175_hybrid_retrieval" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |st AS (
        |  SELECT count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT)
        |    AS sum_dl FROM base),
        |tf AS (
        |  SELECT doc_id, dl, token, count(*) AS tf FROM (
        |    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
        |      unnest(toks) AS token FROM base)
        |  WHERE token IN ('data', 'scan', 'merge')
        |  GROUP BY doc_id, dl, token),
        |dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |sc AS (
        |  SELECT t.doc_id,
        |    CAST(round(
        |      ln(1.0 + (CAST(st.n_docs - d.df AS DOUBLE) + 0.5)
        |        / (CAST(d.df AS DOUBLE) + 0.5))
        |      * (CAST(t.tf AS DOUBLE) * 2.2
        |        / (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |          * (CAST(t.dl AS DOUBLE) * CAST(st.n_docs AS DOUBLE)
        |            / CAST(st.sum_dl AS DOUBLE)))))
        |      * 1e6, 0) AS BIGINT) AS s
        |  FROM tf t JOIN dfr d USING (token), st),
        |agg AS (
        |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micro
        |  FROM sc GROUP BY doc_id),
        |bm AS (SELECT doc_id, r FROM (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score_micro
        |    DESC, doc_id ASC) AS BIGINT) AS r FROM agg) WHERE r <= 100),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |cs AS (
        |  SELECT e.vec_id AS doc_id,
        |    round(list_sum(list_transform(list_zip(e.embedding, q.qe),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.qe,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))), 6) AS sim
        |  FROM embeddings e, q),
        |cos AS (SELECT doc_id, r FROM (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC,
        |    doc_id ASC) AS BIGINT) AS r FROM cs) WHERE r <= 100),
        |u AS (SELECT * FROM bm UNION ALL SELECT * FROM cos),
        |f AS (SELECT doc_id, count(*) AS n_lists,
        |  CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_micro
        |  FROM u GROUP BY 1)
        |SELECT doc_id, n_lists, rrf_micro,
        |  CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC)
        |    AS BIGINT) AS rank
        |FROM f""".stripMargin,

    // q172's merge chain (c0/c1/c2 verbatim) applied to the DOCUMENTS:
    // in-place wrapping, three scalar-subquery rewrites, arithmetic
    // unit count.
    "q178_bpe_apply" ->
      """WITH w AS (
        |  SELECT tok AS w, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE len(tok) > 0 GROUP BY 1),
        |s0 AS (SELECT regexp_replace(w, '(.)', '·\1·', 'g') AS seq, freq FROM w),
        |c0 AS (SELECT p[1] AS a, p[2] AS b FROM (
        |         SELECT unnest(list_zip(la[1:len(la)-1], la[2:len(la)])) AS p, freq
        |         FROM (SELECT string_split(substr(seq, 2, len(seq) - 2), '··') AS la,
        |                 freq FROM s0))
        |       GROUP BY 1, 2 ORDER BY sum(freq) DESC, a, b LIMIT 1),
        |s1 AS (SELECT replace(seq,
        |         '·' || (SELECT a FROM c0) || '··' || (SELECT b FROM c0) || '·',
        |         '·' || (SELECT a FROM c0) || (SELECT b FROM c0) || '·') AS seq,
        |         freq FROM s0),
        |c1 AS (SELECT p[1] AS a, p[2] AS b FROM (
        |         SELECT unnest(list_zip(la[1:len(la)-1], la[2:len(la)])) AS p, freq
        |         FROM (SELECT string_split(substr(seq, 2, len(seq) - 2), '··') AS la,
        |                 freq FROM s1))
        |       GROUP BY 1, 2 ORDER BY sum(freq) DESC, a, b LIMIT 1),
        |s2 AS (SELECT replace(seq,
        |         '·' || (SELECT a FROM c1) || '··' || (SELECT b FROM c1) || '·',
        |         '·' || (SELECT a FROM c1) || (SELECT b FROM c1) || '·') AS seq,
        |         freq FROM s1),
        |c2 AS (SELECT p[1] AS a, p[2] AS b FROM (
        |         SELECT unnest(list_zip(la[1:len(la)-1], la[2:len(la)])) AS p, freq
        |         FROM (SELECT string_split(substr(seq, 2, len(seq) - 2), '··') AS la,
        |                 freq FROM s2))
        |       GROUP BY 1, 2 ORDER BY sum(freq) DESC, a, b LIMIT 1),
        |d0 AS (SELECT doc_id, text,
        |         regexp_replace(text, '(\S)', '·\1·', 'g') AS sx
        |       FROM documents),
        |d1 AS (SELECT doc_id, text, replace(sx,
        |         '·' || (SELECT a FROM c0) || '··' || (SELECT b FROM c0) || '·',
        |         '·' || (SELECT a FROM c0) || (SELECT b FROM c0) || '·') AS sx
        |       FROM d0),
        |d2 AS (SELECT doc_id, text, replace(sx,
        |         '·' || (SELECT a FROM c1) || '··' || (SELECT b FROM c1) || '·',
        |         '·' || (SELECT a FROM c1) || (SELECT b FROM c1) || '·') AS sx
        |       FROM d1),
        |d3 AS (SELECT doc_id, text, replace(sx,
        |         '·' || (SELECT a FROM c2) || '··' || (SELECT b FROM c2) || '·',
        |         '·' || (SELECT a FROM c2) || (SELECT b FROM c2) || '·') AS sx
        |       FROM d2)
        |SELECT doc_id,
        |  CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_units_before,
        |  CAST(len(string_split(text, ' '))
        |    + (len(sx) - len(replace(sx, '··', ''))) // 2 AS BIGINT)
        |    AS n_units_after
        |FROM d3""".stripMargin,

    // The identical gram enumeration (positions x widths), arg-max by
    // (count, gram) per width, duplicated-5-gram char sum, and integer
    // bps divisions.
    "q179_gopher_rep" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
        |    string_split(text, ' ') AS toks FROM documents),
        |p AS (
        |  SELECT doc_id, n_chars, toks,
        |    unnest(range(1, len(toks) + 1)) AS pos FROM base),
        |g AS (
        |  SELECT doc_id, n_chars, v.n AS n,
        |    array_to_string(toks[pos:pos + v.n - 1], ' ') AS gram
        |  FROM p, (VALUES (2), (3), (4)) v(n)
        |  WHERE pos + v.n - 1 <= len(toks)),
        |c AS (SELECT doc_id, n, gram, count(*) AS cnt
        |      FROM g GROUP BY 1, 2, 3),
        |tops AS (
        |  SELECT doc_id, n, cnt * len(gram) AS chars FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY doc_id, n ORDER BY cnt DESC, gram DESC) AS rk
        |    FROM c)
        |  WHERE rk = 1),
        |dup AS (
        |  SELECT doc_id, sum(cnt * len(gram)) AS chars
        |  FROM c WHERE n = 3 AND cnt > 1 GROUP BY 1),
        |a AS (
        |  SELECT base.doc_id, base.n_chars,
        |    coalesce(t2.chars, 0) * 10000 // base.n_chars AS top2_bps,
        |    coalesce(t3.chars, 0) * 10000 // base.n_chars AS top3_bps,
        |    coalesce(t4.chars, 0) * 10000 // base.n_chars AS top4_bps,
        |    coalesce(dup.chars, 0) * 10000 // base.n_chars AS dup_bps
        |  FROM base
        |  LEFT JOIN tops t2 ON t2.doc_id = base.doc_id AND t2.n = 2
        |  LEFT JOIN tops t3 ON t3.doc_id = base.doc_id AND t3.n = 3
        |  LEFT JOIN tops t4 ON t4.doc_id = base.doc_id AND t4.n = 4
        |  LEFT JOIN dup ON dup.doc_id = base.doc_id)
        |SELECT doc_id, n_chars,
        |  CAST(top2_bps AS BIGINT) AS top2_bps,
        |  CAST(top3_bps AS BIGINT) AS top3_bps,
        |  CAST(top4_bps AS BIGINT) AS top4_bps,
        |  CAST(dup_bps AS BIGINT) AS dup_bps,
        |  top2_bps <= 2000 AND top3_bps <= 1800 AND top4_bps <= 1600
        |    AND dup_bps <= 800 AS pass
        |FROM a""".stripMargin,

    // The identical basket collapse, pair self-join, direction union,
    // and integer threshold cuts (lift in HUGEINT, the DECIMAL twin).
    "q181_assoc_rules" ->
      """WITH it AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT count(DISTINCT basket) AS n_baskets FROM it),
        |pc AS (
        |  SELECT a.item AS ia, b.item AS ib, count(*) AS c_ab
        |  FROM it a JOIN it b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |ic AS (SELECT item, count(*) AS c FROM it GROUP BY 1),
        |dr AS (
        |  SELECT ia AS ante, ib AS cons, c_ab FROM pc
        |  UNION ALL SELECT ib AS ante, ia AS cons, c_ab FROM pc),
        |j AS (
        |  SELECT dr.ante, dr.cons, dr.c_ab, a.c AS c_ante, b.c AS c_cons,
        |    tot.n_baskets
        |  FROM dr JOIN ic a ON a.item = dr.ante
        |    JOIN ic b ON b.item = dr.cons, tot
        |  WHERE dr.c_ab * 7 >= a.c
        |    AND CAST(dr.c_ab AS HUGEINT) * tot.n_baskets * 1000
        |      >= CAST(1001 AS HUGEINT) * a.c * b.c)
        |SELECT ante, cons, c_ab, CAST(c_ante AS BIGINT) AS c_ante,
        |  CAST(c_cons AS BIGINT) AS c_cons,
        |  CAST(n_baskets AS BIGINT) AS n_baskets,
        |  c_ab * 10000 // c_ante AS conf_bps,
        |  CAST(CAST(c_ab AS HUGEINT) * n_baskets * 1000
        |    // (CAST(c_ante AS HUGEINT) * c_cons) AS BIGINT) AS lift_milli
        |FROM j""".stripMargin,

    // The identical top-k vocab cut (count desc, token asc) and per-doc
    // OOV aggregate.
    "q184_vocab_coverage" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |v AS (
        |  SELECT token, 1 AS in_vocab FROM (
        |    SELECT token, count(*) AS c FROM tf GROUP BY 1)
        |  QUALIFY row_number() OVER (ORDER BY c DESC, token ASC) <= 28)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 10000 // count(*) AS oov_bps
        |FROM tf LEFT JOIN v USING (token)
        |GROUP BY doc_id""".stripMargin,

    // count(DISTINCT norm) equals Spark's distinct-md5(norm) count (the
    // 16-byte key is an agg-state optimization, not a semantic change).
    "q161_dataset_card" ->
      """WITH n AS (
        |  SELECT source, lang, text,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(len(text)) AS BIGINT) AS n_chars,
        |  CAST(min(len(text)) AS BIGINT) AS min_chars,
        |  CAST(max(len(text)) AS BIGINT) AS max_chars,
        |  count(DISTINCT norm) AS n_unique,
        |  (count(*) - count(DISTINCT norm)) * 10000 // count(*) AS dup_bp
        |FROM n GROUP BY 1, 2""".stripMargin,

    // Identical micro-nat integer arithmetic: round each ln once, sum
    // longs, one rounded division at the end.
    "q147_unigram_logprob" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |    FROM documents) GROUP BY doc_id, token),
        |vocab AS (
        |  SELECT token, CAST(sum(tf) AS BIGINT) AS c,
        |    CAST(round(ln(CAST(sum(tf) AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |      AS l_micro
        |  FROM tf GROUP BY token),
        |tot AS (
        |  SELECT CAST(round(ln(CAST(sum(c) AS DOUBLE)) * 1e6, 0) AS BIGINT)
        |    AS lt_micro
        |  FROM vocab)
        |SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(t.tf * v.l_micro) - sum(t.tf) * any_value(tot.lt_micro)
        |    AS BIGINT) AS lp_micro,
        |  round(CAST(sum(t.tf * v.l_micro) - sum(t.tf)
        |      * any_value(tot.lt_micro) AS DOUBLE)
        |    / (CAST(sum(t.tf) AS DOUBLE) * 1e6), 6) AS avg_logprob
        |FROM tf t JOIN vocab v USING (token), tot
        |GROUP BY t.doc_id""".stripMargin,

    // Identical contingency cells and the same fixed-order double
    // expression (exact-long difference first, then three multiplies and
    // one division, rounded once).
    "q149_chi2" ->
      """WITH pres AS (
        |  SELECT DISTINCT doc_id, source AS label, token FROM (
        |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        |    FROM documents)),
        |n11t AS (
        |  SELECT token, label, count(*) AS n11
        |  FROM pres GROUP BY token, label),
        |dft AS (SELECT token, CAST(sum(n11) AS BIGINT) AS df
        |        FROM n11t GROUP BY token),
        |nl AS (SELECT source AS label, count(*) AS n_label
        |       FROM documents GROUP BY source),
        |nt AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT token, label, n11,
        |  df - n11 AS n10, n_label - n11 AS n01,
        |  n_docs - df - n_label + n11 AS n00,
        |  round(CAST(n_docs AS DOUBLE)
        |    * CAST(n11 * (n_docs - df - n_label + n11)
        |        - (df - n11) * (n_label - n11) AS DOUBLE)
        |    * CAST(n11 * (n_docs - df - n_label + n11)
        |        - (df - n11) * (n_label - n11) AS DOUBLE)
        |    / (CAST(df AS DOUBLE) * CAST(n_docs - df AS DOUBLE)
        |      * CAST(n_label AS DOUBLE)
        |      * CAST(n_docs - n_label AS DOUBLE)), 6) AS chi2
        |FROM n11t JOIN dft USING (token) JOIN nl USING (label), nt
        |WHERE df >= 10 AND df < n_docs AND n_label < n_docs""".stripMargin,

    // Same fixed-order BM25 expression, micro-rounded per (doc, term),
    // exact long sums, same (score, doc) top-k order.
    "q150_bm25" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |st AS (
        |  SELECT count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT)
        |    AS sum_dl FROM base),
        |tf AS (
        |  SELECT doc_id, dl, token, count(*) AS tf FROM (
        |    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
        |      unnest(toks) AS token FROM base)
        |  WHERE token IN ('data', 'scan', 'merge')
        |  GROUP BY doc_id, dl, token),
        |dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |sc AS (
        |  SELECT t.doc_id,
        |    CAST(round(
        |      ln(1.0 + (CAST(st.n_docs - d.df AS DOUBLE) + 0.5)
        |        / (CAST(d.df AS DOUBLE) + 0.5))
        |      * (CAST(t.tf AS DOUBLE) * 2.2
        |        / (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |          * (CAST(t.dl AS DOUBLE) * CAST(st.n_docs AS DOUBLE)
        |            / CAST(st.sum_dl AS DOUBLE)))))
        |      * 1e6, 0) AS BIGINT) AS s
        |  FROM tf t JOIN dfr d USING (token), st),
        |agg AS (
        |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micro,
        |    count(*) AS n_terms
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, score_micro, n_terms, rank FROM (
        |  SELECT *, CAST(row_number() OVER (ORDER BY score_micro DESC,
        |    doc_id ASC) AS BIGINT) AS rank FROM agg)
        |WHERE rank <= 100""".stripMargin,

    // Identical lead pairing under the same (ts, event_id) total order,
    // same 'end' terminal, same single rounded division.
    "q152_markov" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS from_state,
        |    coalesce(lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id), 'end') AS to_state
        |  FROM events),
        |c AS (
        |  SELECT from_state, to_state, count(*) AS n
        |  FROM seq GROUP BY from_state, to_state),
        |t AS (
        |  SELECT from_state, CAST(sum(n) AS BIGINT) AS row_total
        |  FROM c GROUP BY from_state)
        |SELECT c.from_state, c.to_state, c.n,
        |  round(CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE), 6) AS p
        |FROM c JOIN t USING (from_state)""".stripMargin,

    // The identical vocabulary-prefix explode and per-prefix top-k.
    "q211_autocomplete" ->
      """WITH v AS (
        |  SELECT token, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  WHERE len(token) > 0 GROUP BY 1),
        |p AS (
        |  SELECT substr(token, 1, CAST(plen AS INT)) AS prefix, token, c
        |  FROM v, unnest(range(1, least(len(token), 3) + 1)) u(plen))
        |SELECT prefix, token, c,
        |  CAST(row_number() OVER (PARTITION BY prefix
        |    ORDER BY c DESC, token ASC) AS BIGINT) AS rank
        |FROM p
        |QUALIFY rank <= 3""".stripMargin,

    // The identical per-count micro-nat rounding, exact sums, one div.
    "q221_token_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, tok AS token FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |c AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM c
        |      GROUP BY 1),
        |term AS (
        |  SELECT c.doc_id, n.n,
        |    c.c * CAST(round(ln(CAST(n.n AS DOUBLE) / c.c) * 1e6, 0)
        |      AS BIGINT) AS term
        |  FROM c JOIN n USING (doc_id))
        |SELECT doc_id, max(n) AS n_tokens, count(*) AS n_distinct,
        |  CAST(sum(term) // max(n) AS BIGINT) AS entropy_micro_nats
        |FROM term GROUP BY 1""".stripMargin,

    // The identical rational two-draw concentration.
    "q222_simpson" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c FROM events
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    count(*) AS n_categories,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS pairs
        |  FROM c GROUP BY 1)
        |SELECT user_id, n, n_categories,
        |  CASE WHEN n >= 2 THEN pairs * 10000 // (n * (n - 1)) END
        |    AS concentration_bps,
        |  CASE WHEN n >= 2 THEN 10000 - pairs * 10000 // (n * (n - 1)) END
        |    AS diversity_bps
        |FROM g""".stripMargin,

    // q235: identical expression tree per (lang, token) — exact integer
    // counts into ln/sqrt, left-to-right operand order matched to the
    // Spark side so z is bit-identical before rounding
    "q235_log_odds_terms" ->
      """WITH toks AS (
        |  SELECT lang AS g, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cnt AS (SELECT g, token, count(*) AS yl FROM toks GROUP BY 1, 2),
        |gt AS (SELECT g, CAST(sum(yl) AS BIGINT) AS nl FROM cnt GROUP BY 1),
        |wt AS (SELECT token, CAST(sum(yl) AS BIGINT) AS y0 FROM cnt
        |  GROUP BY 1 HAVING sum(yl) >= 20),
        |nt AS (SELECT CAST(sum(yl) AS BIGINT) AS n0 FROM cnt),
        |sc AS (SELECT cnt.g, cnt.token, cnt.yl,
        |    1000 * wt.y0 / CAST(nt.n0 AS DOUBLE) AS alpha,
        |    wt.y0 - cnt.yl AS yr, nt.n0 - gt.nl AS nr, gt.nl AS nl
        |  FROM cnt JOIN wt USING (token) JOIN gt USING (g), nt),
        |z AS (SELECT g, token, yl,
        |    (ln((yl + alpha) / (nl + 1000 - yl - alpha))
        |      - ln((yr + alpha) / (nr + 1000 - yr - alpha)))
        |      / sqrt(1.0 / (yl + alpha) + 1.0 / (yr + alpha)) AS z
        |  FROM sc)
        |SELECT g AS lang, token, CAST(yl AS BIGINT) AS y,
        |  round(z, 6) AS z FROM z
        |QUALIFY row_number() OVER (PARTITION BY g
        |  ORDER BY z DESC, token) <= 10""".stripMargin,

    // q245: identical md5 split, identical one-rounding-per-ln micro-nat
    // parameters, exact long score sums, argmax by (score desc, class)
    "q245_naive_bayes" -> (nbPredictSql + "\nSELECT * FROM pr"),

    // q246: exact confusion counts + one integer division per ratio
    // over the SAME prediction CTEs q245 hashes
    "q246_classifier_eval" -> (nbPredictSql + "\n" +
      """,
        |bt AS (SELECT lang AS class,
        |    CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp,
        |    CAST(sum(CASE WHEN pred <> lang THEN 1 ELSE 0 END) AS BIGINT)
        |      AS fn
        |  FROM pr GROUP BY 1),
        |bp AS (SELECT pred AS class,
        |    CAST(sum(CASE WHEN pred <> lang THEN 1 ELSE 0 END) AS BIGINT)
        |      AS fp
        |  FROM pr GROUP BY 1),
        |j AS (SELECT class, coalesce(tp, 0) AS tp, coalesce(fp, 0) AS fp,
        |    coalesce(fn, 0) AS fn
        |  FROM bt FULL JOIN bp USING (class))
        |SELECT class, tp, fp, fn,
        |  CASE WHEN tp + fp > 0 THEN tp * 10000 // (tp + fp) END
        |    AS precision_bps,
        |  CASE WHEN tp + fn > 0 THEN tp * 10000 // (tp + fn) END
        |    AS recall_bps,
        |  CASE WHEN 2 * tp + fp + fn > 0
        |    THEN 2 * tp * 10000 // (2 * tp + fp + fn) END AS f1_bps
        |FROM j""".stripMargin),
  )
}
