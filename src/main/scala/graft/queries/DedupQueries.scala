package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Deduplication tiers: exact, MinHash/SimHash LSH,
  * exact set-similarity/containment, entity resolution, URL/event dedup.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object DedupQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Dedup (exact): canonical row per text key
    "q15_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")),

    // Near-dup: word-bigram Jaccard of the corpus against a bounded
    // anchor subset (broadcast nested-loop, arrays never shuffled).
    // Fixed-size anchor set (first 50 ids), NOT a modulus filter: the
    // anchor count stays constant as the corpus grows, so the BNLJ is
    // O(50·N) at any scale instead of O(N²/100).
    "q23_neardup_jaccard" -> ((s, d) => {
      val sh = bigramHashShingles(s, d)
      Dedup.jaccardToAnchors(sh, sh.orderBy("id").limit(50))
        .filter(col("jaccard") >= 0.05)
        .select("id_a", "id_b", "jaccard")
    }),

    // F12: sha-based uid anonymization (exact mod-2^63, reference parity)
    "q27_uid_hash" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          graft.sources.Ingest.uidHash(col("c_name")).as("uid_hash"))),

    // MinHash-LSH candidate pairs — portable md5 base hash + band-value
    // buckets make the pair set engine-independent, so the full pipeline
    // is oracle-checked against DuckDB (sqlQ29Minhash)
    "q29_minhash_pairs" -> ((s, d) =>
      Dedup.minhashCandidates(
        Tables.documents(s, d), "text", "doc_id", 3, 32, 8)),

    // SimHash fingerprints, relational bit-vote plan. The packed signed-64
    // long can't be ASSEMBLED in DuckDB's overflow-checked BIGINT, but its
    // two unsigned 32-bit halves can — emit those, so the full per-doc
    // signature (not just q57's pairs projection) is oracle-pinned.
    "q30_simhash" -> ((s, d) =>
      Dedup.simhashDocs(Tables.documents(s, d), "text", "doc_id", 3)
        .select(col("doc_id"),
          shiftright(col("sh"), 32).bitwiseAND(lit(0xFFFFFFFFL)).as("sh_hi"),
          col("sh").bitwiseAND(lit(0xFFFFFFFFL)).as("sh_lo"))),

    // Embedding near-dup pairs vs a fixed-size anchor set (first 50 ids;
    // a modulus filter would grow the anchor count with the corpus and
    // silently turn the broadcast BNLJ quadratic), with exact oracle
    "q42_embedding_neardup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val a = emb.orderBy("vec_id").limit(50)
        .select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
      val b = emb.select(col("vec_id").as("id_b"),
        col("embedding").as("e_b"))
      b.join(broadcast(a), col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(VectorFunctions.cosine(col("e_a"), col("e_b")), 6)
            .as("sim"))
        .filter(col("sim") >= 0.15)
    }),

    // Distributed connected components over the near-dup pair graph: the
    // grouping stage of dedup (pairs -> keep-groups). Min-label
    // propagation, one shuffle per round; oracle = recursive CTE closure.
    "q47_connected_components" -> ((s, d) => nearDupComponents(s, d)),

    // End-to-end dedup keep-policy: near-dup pairs -> connected
    // components -> keep the best doc (longest, then smallest id) per
    // component. The full "dedup a corpus" flow as one query.
    "q56_dedup_keep" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "n_chars")
      val comps = nearDupComponents(s, d)
      val w = Window.partitionBy("component")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      comps.join(docs, comps("id") === docs("doc_id"))
        .select(col("doc_id"), col("component"), col("n_chars"))
        .withColumn("keep", (row_number().over(w) === 1).cast("long"))
        .select("doc_id", "component", "keep")
    }),

    // SimHash banded near-dup pairs with exact Hamming verification —
    // portable md5 base hash makes pairs AND distances engine-exact:
    // oracle-checked against DuckDB (sqlQ57Simhash)
    "q57_simhash_pairs" -> ((s, d) =>
      Dedup.simhashCandidates(Tables.documents(s, d), "text", "doc_id",
        shingleN = 3, bands = 4, maxHamming = 8)),

    // Connected components in O(log n) rounds (large-star/small-star) on
    // the same near-dup pair graph as q47 — same result, same oracle, so
    // the high-diameter upgrade path is gate-checked, not just
    // spec-checked. Use this form when the similarity graph chains
    // (transitive near-dups) instead of clustering.
    "q69_cc_logn" -> ((s, d) => {
      val sh = bigramHashShingles(s, d)
      val pairs = Dedup.jaccardToAnchors(sh, sh.orderBy("id").limit(50))
        .filter(col("jaccard") >= 0.05)
        .select("id_a", "id_b")
      // smallGraphFastPath = false: this gate EXISTS to exercise the
      // distributed large-star/small-star rounds end to end (the fast
      // path would absorb the fixture-sized graph and gate nothing)
      graft.operators.Graphs.connectedComponentsLogN(pairs, "id_a", "id_b",
        Tables.documents(s, d).select("doc_id"), "doc_id",
        smallGraphFastPath = false)
    }),

    // Normalized exact dedup: case/punctuation variants collapse to one
    // md5 key; one hash-agg shuffle, text never shuffles
    "q71_norm_dedup" -> ((s, d) =>
      Dedup.normalizedExactDups(Tables.documents(s, d), "doc_id", "text")),

    // Cross-batch near-dup: which "incoming" docs (doc_id % 3 = 0)
    // near-dup any "historical" doc (the rest) — the per-batch dedup
    // gate of a continuously ingesting corpus. The history band index is
    // batch-invariant (persist it in production); candidates via one
    // (band, bucket) equi-join, never a self-join.
    "q83_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 3 =!= 0),
        docs.filter(col("doc_id") % 3 === 0),
        "text", "doc_id")
        .select(col("in_id"), col("hist_id"),
          col("agree_k").cast("long").as("agree_k"))
    }),

    // Intra-doc repetition REMOVAL (the q62 ratios' rewrite sibling).
    // 2-token chunks: the synthetic vocabulary is ~40 words, so larger
    // chunks never repeat and the op would be the identity on gate data.
    "q85_intradoc_dedup" -> ((s, d) =>
      graft.operators.Dedup.intraDocChunkDedup(
        Tables.documents(s, d), "doc_id", "text", 2)),

    // Winnowing fingerprints (Dedup.winnowFingerprints — the MOSS
    // algorithm): per-doc count + order-free digest of the selected
    // fingerprint set. The fp_key encoding (gram-md5 ++ padded reverse
    // position) makes the robust-winnowing selection a plain window min,
    // so the oracle re-runs the identical selection in DuckDB.
    "q120_winnow" -> ((s, d) =>
      graft.operators.Dedup
        .winnowFingerprints(Tables.documents(s, d), "doc_id", "text",
          k = 8, w = 4)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"),
          md5(concat_ws(",", array_sort(collect_list(col("fp_key"))))
            .cast("binary")).as("fp_digest"))),

    // EXACT set-similarity self-join (Dedup.setSimilarityJoin, the
    // All-Pairs/PPJoin prefix filter): trigram-set Jaccard >= 1/2 with
    // the exact similarity — guaranteed recall where MinHash-LSH (q29)
    // is probabilistic. Trigram elements keep document frequencies low
    // (the regime prefix filtering is built for); the integer
    // cross-multiplied threshold makes the accept set engine-exact; the
    // oracle verifies EVERY pair relationally with no prefix filter.
    "q126_setsim_join" -> ((s, d) =>
      graft.operators.Dedup.setSimilarityJoin(
        Tables.documents(s, d), "doc_id", "text", tNum = 1, tDen = 2,
        shingleN = 3)),

    // Entity-resolution composition — the end-to-end dedup deliverable:
    // exact near-dup pairs (q126's guaranteed-recall set-similarity
    // join) -> connected components (min-id labels) -> per-cluster size
    // and canonical representative (longest text, ties to smallest id).
    // The pair frame persists once (CacheScope): the CC edge
    // symmetrization, the node universe, and the membership join all
    // consume it.
    "q137_entity_resolution" -> ((s, d) => {
      val pairs = graft.CacheScope.track(
        graft.operators.Dedup.setSimilarityJoin(
          Tables.documents(s, d), "doc_id", "text", tNum = 1, tDen = 2,
          shingleN = 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val nodes = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b")))
        .distinct()
      val cc = graft.operators.Graphs.connectedComponents(
        pairs, "id_a", "id_b", nodes, "doc_id")
      val ord = Window.partitionBy("cluster")
        .orderBy(col("n_chars").desc, col("doc_id"))
      cc.select(col("id").as("doc_id"), col("component").as("cluster"))
        .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy("cluster")))
        .withColumn("canonical_id", first("doc_id").over(ord))
        .withColumn("is_canonical",
          (col("doc_id") === col("canonical_id")).cast("long"))
        .select("doc_id", "cluster", "cluster_size", "canonical_id",
          "is_canonical")
    }),

    // Cross-document segment dedup (Dedup.crossDocChunkDedup): the
    // C4-style boilerplate pass — 5-token chunks appearing in more than
    // 2 distinct docs are removed everywhere, docs reassembled in
    // position order. 5/2 keeps both arms live at both scales (35 and
    // 222 banned chunk texts at sf0.01/sf0.1).
    "q155_crossdoc_dedup" -> ((s, d) =>
      graft.operators.Dedup.crossDocChunkDedup(
        Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 5, maxDocFreq = 2)),

    // Content-defined chunking (Dedup.contentDefinedChunks): Rabin-
    // style rolling-hash boundaries (trailing-4 polynomial, mod 32) —
    // shift-stable chunks, so repeated passages re-align to identical
    // fingerprints where fixed grids (q85) cannot. Only 16-byte md5
    // fps cross the dedup shuffle; `shared` marks cross-document
    // chunks. The char explode is the q120/q161 byte-linear budget.
    "q176_cdc_chunks" -> ((s, d) =>
      graft.operators.Dedup.contentDefinedChunks(
        Tables.documents(s, d), "doc_id", "text")),

    // URL canonicalization + dedup (TextFunctions.canonicalizeUrl +
    // Dedup.urlDedup): deterministic synthetic URLs per doc (mixed-case
    // scheme/host, default ports, doubled trailing slashes, tracking
    // params, fragments — every rule the canonicalizer owns is
    // exercised), collapsed to the whitelisted canonical form with
    // smallest-id-wins keep marks. Canonicalization is a pure per-row
    // regex projection; the only shuffle is the md5-keyed group.
    "q183_url_dedup" -> ((s, d) =>
      graft.operators.Dedup.urlDedup(
        synthUrlFrame(Tables.documents(s, d).select(col("doc_id"))),
        "url", "doc_id")
        .select("doc_id", "url", "canonical_url", "n_urls", "keep")),

    // Duplicate-cluster profile (Dedup.dupClusterProfile): the dedup
    // decision report — corpus share per exact-dup cluster size on the
    // q71 normalization key. The raw corpus is nearly dup-free (8 pairs
    // at sf0.1), so the gate injects two deterministic copy tiers
    // (every 3rd doc once, every 9th twice) to populate sizes 2-4 —
    // the profile shape a real crawl shows. Two nested hash aggregates
    // + a broadcast total.
    "q186_dup_profile" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def tier(m: Long, off: Long) =
        docs.filter(pmod(col("doc_id"), lit(m)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(off))
      graft.operators.Dedup.dupClusterProfile(
        docs.unionAll(tier(3L, 1000000L)).unionAll(tier(9L, 2000000L)),
        "doc_id", "text")
    }),

    // Exact containment join (Dedup.containmentJoin): ordered pairs
    // where >= 4/5 of doc a's trigram shingles appear in doc b — the
    // asymmetric excerpt/quotation structure Jaccard misses. Probe-side
    // rarest-first prefix filter (index side exposes all elements —
    // containment admits no index prefix), exact array-intersect
    // verify; the oracle re-verifies EVERY ordered pair with no filter.
    "q187_containment" -> ((s, d) =>
      graft.operators.Dedup.containmentJoin(
        Tables.documents(s, d), "doc_id", "text",
        tNum = 4, tDen = 5, shingleN = 3)),

    // Dedup-tier evaluation (Dedup.pairSetEval): BOTH MinHash-LSH tiers
    // priced against q126's EXACT trigram-Jaccard >= 1/2 ground truth —
    // precision/recall in integer bps, one row per tier. The
    // measure-don't-guess gate: banding (4-row bands x 8) passes a
    // J = 1/2 pair with p = 1-(1-J^4)^8 ~ 0.40, raw-candidate precision
    // FALLS with corpus size (7,575 bps at sf0.01 -> 3,022 at sf0.1 —
    // sub-threshold collision mass grows with bucket density), and the
    // verified tier (Dedup.verifyPairsJaccard on candidates only)
    // restores precision to exactly 10,000 bps at unchanged recall —
    // the r12 verdict-#4 scale fix, measured not asserted.
    "q190_dedup_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cand = graft.CacheScope.track(
        graft.operators.Dedup.minhashCandidates(
            docs, "text", "doc_id", 3, 32, 8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val truth = graft.CacheScope.track(
        graft.operators.Dedup.setSimilarityJoin(
            docs, "doc_id", "text", tNum = 1, tDen = 2, shingleN = 3)
          .select("id_a", "id_b")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val verified = graft.operators.Dedup.verifyPairsJaccard(
        cand, docs, "text", "doc_id", shingleN = 3, tNum = 1, tDen = 2)
      // both tiers in ONE pair-keyed pass (was two pairSetEval
      // full-outer joins — truth and cand each shuffled twice):
      // verified ⊆ cand, so a verified flag on the cand side of a
      // single full-outer join against truth carries both confusion
      // tables; per-tier counts are the identical pairSetEval sums.
      val j = cand.select(col("id_a"), col("id_b"), lit(1).as("__p"))
        .join(verified.select(col("id_a"), col("id_b"), lit(1).as("__v")),
          Seq("id_a", "id_b"), "left")
        .join(truth.select(col("id_a"), col("id_b"), lit(1).as("__t")),
          Seq("id_a", "id_b"), "full_outer")
      def cnt(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L))
      val one = j.agg(
        cnt(col("__p").isNotNull && col("__t").isNotNull).as("tp_c"),
        cnt(col("__p").isNotNull && col("__t").isNull).as("fp_c"),
        cnt(col("__p").isNull && col("__t").isNotNull).as("fn_c"),
        cnt(col("__v").isNotNull && col("__t").isNotNull).as("tp_v"),
        cnt(col("__v").isNotNull && col("__t").isNull).as("fp_v"),
        cnt(col("__v").isNull && col("__t").isNotNull).as("fn_v"))
      one.select(explode(array(
          struct(lit("candidates").as("tier"), col("tp_c").as("tp"),
            col("fp_c").as("fpos"), col("fn_c").as("fneg")),
          struct(lit("verified").as("tier"), col("tp_v").as("tp"),
            col("fp_v").as("fpos"), col("fn_v").as("fneg")))).as("r"))
        .select(col("r.tier").as("tier"), col("r.tp").as("tp"),
          col("r.fpos").as("fpos"), col("r.fneg").as("fneg"),
          when(col("r.tp") + col("r.fpos") > 0,
            expr("r.tp * 10000 div (r.tp + r.fpos)")).as("precision_bps"),
          when(col("r.tp") + col("r.fneg") > 0,
            expr("r.tp * 10000 div (r.tp + r.fneg)")).as("recall_bps"))
    }),

    // Tiered dedup cascade — the production order: cheap URL dedup
    // first (q183's canonicalizer), content-level normalized-exact
    // dedup ONLY on URL survivors. The injected copy tier (every 3rd
    // doc re-id'd at +1e6) gets fresh URLs (hash-derived), so it
    // passes tier 1 and dies at tier 2 — both cascade arms live by
    // construction. Per-doc verdict: url_dup | content_dup | kept.
    "q206_dedup_cascade" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val dd = docs.unionAll(
        docs.filter(pmod(col("doc_id"), lit(3L)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(1000000L)))
      val urlKeep = graft.operators.Dedup.urlDedup(
          synthUrlFrame(dd.select("doc_id"), siteMod = 5, pathMod = 40,
            idMod = 23), "url", "doc_id")
        .select(col("doc_id"), col("keep").as("url_keep"))
      // content keeper as a window over the nk exchange: the aggregate+
      // left-join-back form ran the (join + normalize + md5) subtree
      // twice and paid two extra exchanges; min-over-survivors in the
      // same nk partition is the identical keeper rule (url_dup rows are
      // caught by the first branch regardless of ck)
      val wNk = Window.partitionBy("nk")
      dd.join(urlKeep, "doc_id")
        .withColumn("nk", md5(
          graft.operators.Dedup.normalizeText(col("text")).cast("binary")))
        .withColumn("ck",
          min(when(col("url_keep"), col("doc_id"))).over(wNk))
        .select(col("doc_id"),
          when(!col("url_keep"), lit("url_dup"))
            .when(col("doc_id") =!= col("ck"), lit("content_dup"))
            .otherwise(lit("kept")).as("verdict"))
    }),

    // Idempotency-window dedup (Dedup.eventDedupWindow): a row is a
    // duplicate iff the previous same-(user, type) arrival is within
    // 2 h — the at-least-once ingest suppressor, batch form of q90's
    // watermarked dropDuplicates. Adjacent-arrival rule: one lag
    // comparison, exact.
    "q214_event_dedup" -> ((s, d) =>
      graft.operators.Dedup.eventDedupWindow(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("event_id"), expr("ts div 1000000000").as("sec")),
        Seq("user_id", "event_type"), "sec", "event_id",
        windowSec = 7200)),

    // Jaro-Winkler fuzzy vocabulary dedup (EditDistance.jaroWinklerPairs):
    // distinct-collapse -> first-token block join -> native codegen
    // jaro_winkler expression (plans/JaroWinkler.scala, DuckDB-parity-
    // pinned down to integer transposition halving and the 0.7 boost
    // threshold). The typo/variant tier between q168's Levenshtein<=1
    // and q29's MinHash: order-sensitive, prefix-weighted name matching.
    "q227_jaro_winkler" -> ((s, d) =>
      graft.operators.EditDistance.jaroWinklerPairs(
        Tables.part(s, d), "p_name", threshold = 0.84)),

    // Exact substring dedup (Dedup.exactSubstringDedup, Lee et al.'s
    // ExactSubstr re-expressed relationally): every 8-token window
    // occurring >1 time corpus-wide is removed from all but its
    // globally-first occurrence; surviving tokens rejoin in order. The
    // span-level tier above q15 (whole-doc) and beside q29 (scored).
    "q243_exact_substring" -> ((s, d) =>
      graft.operators.Dedup.exactSubstringDedup(
        Tables.documents(s, d), "doc_id", "text", l = 8)),
  )

  val oracles: Map[String, String] = Map(

    "q15_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,

    "q23_neardup_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id AS id, list_distinct(list_transform(
        |    range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]
        |  )) AS bg FROM documents)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
        |    / len(list_distinct(a.bg || b.bg)) AS jaccard
        |FROM (SELECT * FROM sh ORDER BY id LIMIT 50) a
        |JOIN sh b ON a.id < b.id
        |WHERE CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
        |    / len(list_distinct(a.bg || b.bg)) >= 0.05""".stripMargin,

    "q27_uid_hash" ->
      """SELECT c_custkey,
        |  CAST(('0x'
        |    || translate(substr(sha256(c_name), 49, 1), '89abcdef', '01234567')
        |    || substr(sha256(c_name), 50, 15)) AS BIGINT) AS uid_hash
        |FROM customer""".stripMargin,

    // q29/q57/q30 oracle the full signature pipelines (portable md5 base
    // hash; q30 emits the signature as unsigned 32-bit halves)
    "q29_minhash_pairs" -> sqlQ29Minhash,

    "q30_simhash" -> sqlQ30Simhash,

    "q42_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding,
        |          y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(b.embedding,
        |          y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))), 6) AS sim
        |FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 50) a
        |JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding,
        |          y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(b.embedding,
        |          y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))), 6) >= 0.15""".stripMargin,

    "q47_connected_components" ->
      (ccReachCtes + "\nSELECT id, min(r) AS component FROM reach GROUP BY id"),

    "q56_dedup_keep" -> (ccReachCtes + ",\n" +
      """comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT d.doc_id, c.component,
        |  CAST(row_number() OVER (PARTITION BY c.component
        |    ORDER BY d.n_chars DESC, d.doc_id ASC) = 1 AS BIGINT) AS keep
        |FROM documents d JOIN comp c ON d.doc_id = c.id""".stripMargin),

    "q57_simhash_pairs" -> sqlQ57Simhash,

    // same graph, same canonical min-id components as q47 — the oracle is
    // shared by construction
    "q69_cc_logn" ->
      (ccReachCtes + "\nSELECT id, min(r) AS component FROM reach GROUP BY id"),

    "q71_norm_dedup" ->
      """SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_key,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    "q83_incremental_dedup" -> sqlQ83Incremental,

    // The identical winnowing selection: same normalization, same gram
    // hash, same fp_key encoding, same window min, same digest.
    "q120_winnow" ->
      """WITH nrm AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS norm
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(1, CAST(length(norm) - 8 + 2 AS BIGINT)))
        |      AS BIGINT) AS p,
        |    norm
        |  FROM nrm WHERE length(norm) >= 11),
        |keyed AS (
        |  SELECT doc_id, p,
        |    md5(substr(norm, CAST(p AS INT), 8))
        |      || lpad(CAST(10000000 - p AS VARCHAR), 8, '0') AS key,
        |    length(norm) - 8 + 1 AS n_grams
        |  FROM grams),
        |chosen AS (
        |  SELECT DISTINCT doc_id,
        |    min(key) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp_key
        |  FROM keyed QUALIFY p <= n_grams - 4 + 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
        |  md5(string_agg(fp_key, ',' ORDER BY fp_key)) AS fp_digest
        |FROM chosen GROUP BY doc_id""".stripMargin,

    // Ground truth with NO prefix filter: every pair's exact bigram-set
    // intersection, relationally (token equi-join + group count), with
    // the identical integer cross-multiplied accept test.
    "q126_setsim_join" -> sqlQ126SetSim,

    // q126's exact pair set -> recursive reachability closure (min
    // reachable id = the CC label) -> identical window canonical pick.
    "q137_entity_resolution" ->
      """WITH RECURSIVE toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |el AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS e
        |  FROM toks),
        |sz AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n FROM el GROUP BY doc_id),
        |inter AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM el a JOIN el b ON a.e = b.e AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS MATERIALIZED (
        |  SELECT i.id_a, i.id_b
        |  FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
        |  JOIN sz sb ON sb.doc_id = i.id_b
        |  WHERE i.c * 2 >= 1 * (sa.n + sb.n - i.c)),
        |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |      UNION SELECT id_b AS src, id_a AS dst FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.dst AS id, reach.r AS r
        |  FROM e JOIN reach ON e.src = reach.id),
        |comp AS MATERIALIZED (
        |  SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
        |m AS (
        |  SELECT c.doc_id, c.cluster, d.n_chars
        |  FROM comp c JOIN documents d USING (doc_id))
        |SELECT doc_id, cluster,
        |  count(*) OVER (PARTITION BY cluster) AS cluster_size,
        |  first_value(doc_id) OVER ord AS canonical_id,
        |  CAST(CASE WHEN doc_id = first_value(doc_id) OVER ord
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
        |FROM m
        |WINDOW ord AS (PARTITION BY cluster
        |  ORDER BY n_chars DESC, doc_id)""".stripMargin,

    // The q85 chunking, banned on corpus document frequency instead of
    // intra-doc position; NOT IN is null-safe here (chunk is never null).
    "q155_crossdoc_dedup" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |chunks AS MATERIALIZED (
        |  SELECT doc_id, i,
        |    array_to_string(t[i * 5 + 1 : i * 5 + 5], ' ') AS chunk
        |  FROM toks, unnest(range(0, greatest(
        |    CAST(ceil(len(t) / 5.0) AS BIGINT), 1))) u(i)),
        |banned AS (
        |  SELECT chunk FROM (
        |    SELECT chunk, count(DISTINCT doc_id) AS df
        |    FROM chunks GROUP BY chunk)
        |  WHERE df > 2),
        |agg AS (
        |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY i) AS clean_text,
        |    count(*) AS n_kept
        |  FROM chunks WHERE chunk NOT IN (SELECT chunk FROM banned)
        |  GROUP BY doc_id)
        |SELECT t.doc_id,
        |  coalesce(a.clean_text, '') AS clean_text,
        |  greatest(CAST(ceil(len(t.t) / 5.0) AS BIGINT), 1) AS n_chunks,
        |  coalesce(a.n_kept, 0) AS n_kept
        |FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id""".stripMargin,

    // The identical rolling polynomial, boundary rule, and interval
    // reconstruction; md5 fingerprints compare byte-for-byte.
    "q176_cdc_chunks" ->
      """WITH base AS (
        |  SELECT doc_id AS id, text AS t FROM documents
        |  WHERE len(text) > 0),
        |codes AS (
        |  SELECT id, len, pos,
        |    CAST(ascii(substr(t, CAST(pos AS INT), 1)) AS BIGINT) AS c
        |  FROM (SELECT id, t, len(t) AS len,
        |          unnest(range(1, len(t) + 1)) AS pos FROM base)),
        |r AS (
        |  SELECT id, len, pos,
        |    c + 31 * lag(c, 1) OVER w + 961 * lag(c, 2) OVER w
        |      + 29791 * lag(c, 3) OVER w AS h
        |  FROM codes WINDOW w AS (PARTITION BY id ORDER BY pos)),
        |b AS (SELECT DISTINCT id, pos FROM r
        |      WHERE (pos >= 4 AND h % 32 = 0) OR pos = len),
        |ch AS (
        |  SELECT id, pos,
        |    coalesce(lag(pos, 1) OVER v, 0) + 1 AS start,
        |    CAST(row_number() OVER v AS BIGINT) AS chunk_idx
        |  FROM b WINDOW v AS (PARTITION BY id ORDER BY pos)),
        |cf AS (
        |  SELECT id, chunk_idx,
        |    CAST(pos - start + 1 AS BIGINT) AS chunk_len,
        |    md5(substr(t, CAST(start AS INT),
        |      CAST(pos - start + 1 AS INT))) AS fp
        |  FROM ch JOIN base USING (id)),
        |sh AS (SELECT fp, count(DISTINCT id) AS nd FROM cf GROUP BY 1)
        |SELECT id AS doc_id, chunk_idx, chunk_len, cf.fp, nd > 1 AS shared
        |FROM cf JOIN sh USING (fp)""".stripMargin,

    // The identical URL synthesis (every branch off the same md5-derived
    // h), regex canonicalization chain, and smallest-id-wins group.
    "q183_url_dedup" ->
      (s"""WITH ${sqlUrlCanonCtes("documents")},
        |g AS (SELECT canonical_url, min(doc_id) AS keep_id,
        |        count(*) AS n_urls
        |      FROM c GROUP BY 1)
        |SELECT c.doc_id, c.url, c.canonical_url, g.n_urls,
        |  c.doc_id = g.keep_id AS keep
        |FROM c JOIN g USING (canonical_url)""").stripMargin,

    // The identical normalization, nested cluster-size counts, and
    // integer share.
    "q186_dup_profile" ->
      """WITH alltexts AS (
        |  SELECT text FROM documents
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT text FROM documents WHERE doc_id % 9 = 0),
        |n AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM alltexts),
        |cl AS (SELECT count(*) AS cluster_size FROM n GROUP BY norm),
        |tot AS (SELECT count(*) AS n_total FROM n)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  cluster_size * count(*) AS n_docs, tot.n_total,
        |  cluster_size * count(*) * 10000 // tot.n_total AS docs_bps
        |FROM cl, tot GROUP BY cluster_size, tot.n_total""".stripMargin,

    // Every ordered pair re-verified from the element equi-join (pairs
    // sharing zero elements cannot pass a positive threshold), no
    // prefix filter — the operator's candidate pruning must be lossless
    // against this.
    "q187_containment" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |el AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS e
        |  FROM toks),
        |sz AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n FROM el GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM el a JOIN el b ON a.e = b.e AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i.id_a, i.id_b, sa.n AS na, sb.n AS nb, i.c,
        |  i.c * 10000 // sa.n AS cont_bps
        |FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
        |JOIN sz sb ON sb.doc_id = i.id_b
        |WHERE i.c * 5 >= 4 * sa.n""".stripMargin,

    // q29's candidate SQL and q126's exact-truth SQL verbatim, full
    // outer joined on the pair key; counts and bps are exact integers.
    // The verified tier's oracle spelling exploits an exact identity:
    // Spark verifies candidates with the integer Jaccard test at the
    // SAME threshold (and over the same distinct word-trigram sets) that
    // defines truth, so verified = cand INTERSECT truth — both engines
    // compute the boundary exactly, no float edge.
    "q190_dedup_eval" ->
      s"""WITH cand AS (SELECT id_a, id_b FROM ($sqlQ29Minhash)),
         |truth AS (SELECT id_a, id_b FROM ($sqlQ126SetSim)),
         |ver AS (
         |  SELECT c.id_a, c.id_b FROM cand c JOIN truth t
         |    ON c.id_a = t.id_a AND c.id_b = t.id_b),
         |jc AS (
         |  SELECT c.id_a IS NOT NULL AS in_p, t.id_a IS NOT NULL AS in_t
         |  FROM cand c FULL JOIN truth t
         |    ON c.id_a = t.id_a AND c.id_b = t.id_b),
         |jv AS (
         |  SELECT v.id_a IS NOT NULL AS in_p, t.id_a IS NOT NULL AS in_t
         |  FROM ver v FULL JOIN truth t
         |    ON v.id_a = t.id_a AND v.id_b = t.id_b),
         |ac AS (
         |  SELECT 'candidates' AS tier,
         |    CAST(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fpos,
         |    CAST(sum(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fneg
         |  FROM jc),
         |av AS (
         |  SELECT 'verified' AS tier,
         |    CAST(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fpos,
         |    CAST(sum(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fneg
         |  FROM jv),
         |u AS (SELECT * FROM ac UNION ALL SELECT * FROM av)
         |SELECT tier, tp, fpos, fneg,
         |  CASE WHEN tp + fpos > 0 THEN tp * 10000 // (tp + fpos) END
         |    AS precision_bps,
         |  CASE WHEN tp + fneg > 0 THEN tp * 10000 // (tp + fneg) END
         |    AS recall_bps
         |FROM u""".stripMargin,

    // The same two tiers over the dup-injected union: URL keep-group
    // first, content keep-group over URL survivors only.
    "q206_dedup_cascade" ->
      (s"""WITH dd AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 3 = 0),
        |${sqlUrlCanonCtes("dd", siteMod = 5, pathMod = 40, idMod = 23)},
        |g AS (SELECT canonical_url, min(doc_id) AS keep_id
        |      FROM c GROUP BY 1),
        |k AS (SELECT c.doc_id, c.doc_id = g.keep_id AS url_keep
        |      FROM c JOIN g USING (canonical_url)),
        |n AS (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text),
        |          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nk
        |      FROM dd),
        |ck AS (SELECT n.nk, min(n.doc_id) AS ck
        |       FROM n JOIN k ON k.doc_id = n.doc_id AND k.url_keep
        |       GROUP BY 1)
        |SELECT k.doc_id,
        |  CASE WHEN NOT k.url_keep THEN 'url_dup'
        |    WHEN k.doc_id <> ck.ck THEN 'content_dup'
        |    ELSE 'kept' END AS verdict
        |FROM k JOIN n USING (doc_id)
        |LEFT JOIN ck ON ck.nk = n.nk""").stripMargin,

    // The identical lag rule under the same total order.
    "q214_event_dedup" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |    epoch_ns(ts) // 1000000000 AS sec
        |  FROM events),
        |r AS (SELECT *, lag(sec) OVER (PARTITION BY user_id, event_type
        |        ORDER BY sec, event_id) AS prev FROM e)
        |SELECT user_id, event_type, event_id, sec,
        |  prev IS NOT NULL AND sec - prev <= 7200 AS is_dup
        |FROM r""".stripMargin,

    // q85: identical chunking (the 1-based inclusive list slice clamps
    // at the end in both engines), first occurrence via min(i), ordered
    // rebuild
    "q85_intradoc_dedup" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |chunks AS MATERIALIZED (
        |  SELECT doc_id, i,
        |    array_to_string(t[i * 2 + 1 : i * 2 + 2], ' ') AS chunk
        |  FROM toks, unnest(range(0, greatest(
        |    CAST(ceil(len(t) / 2.0) AS BIGINT), 1))) u(i)),
        |kept AS (
        |  SELECT doc_id, chunk, min(i) AS i
        |  FROM chunks GROUP BY doc_id, chunk)
        |SELECT k.doc_id,
        |  string_agg(k.chunk, ' ' ORDER BY k.i) AS clean_text,
        |  greatest(CAST(ceil(len(any_value(t.t)) / 2.0) AS BIGINT), 1)
        |    AS n_chunks,
        |  count(*) AS n_kept
        |FROM kept k JOIN toks t ON t.doc_id = k.doc_id
        |GROUP BY k.doc_id""".stripMargin,

    // q227: same distinct -> first-token block -> threshold on the
    // ROUNDED score (both engines compare round(jw, 6), so a last-ulp
    // engine difference cannot flip a boundary pair).
    "q227_jaro_winkler" ->
      """WITH u AS (
        |  SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL),
        |b AS (SELECT s, string_split(s, ' ')[1] AS blk FROM u)
        |SELECT a.s AS name_a, b2.s AS name_b,
        |  round(jaro_winkler_similarity(a.s, b2.s), 6) AS jw
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.s < b2.s
        |WHERE round(jaro_winkler_similarity(a.s, b2.s), 6) >= 0.84""".stripMargin,

    // q243: identical md5 gram keys, identical global (id, p) keep rule,
    // DISTINCT position coverage instead of interval merging, ordered
    // string_agg rebuild
    "q243_exact_substring" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |pos AS (SELECT doc_id, arr,
        |    unnest(range(0, greatest(len(arr) - 8 + 1, 0))) AS p FROM toks),
        |grams AS (SELECT doc_id, p,
        |    md5(array_to_string(
        |      arr[CAST(p + 1 AS INT):CAST(p + 8 AS INT)], ' ')) AS g
        |  FROM pos),
        |firsts AS (SELECT g, min(struct_pack(doc_id := doc_id, p := p)) AS f,
        |    count(*) AS c FROM grams GROUP BY 1),
        |dups AS (SELECT gr.doc_id, gr.p FROM grams gr JOIN firsts f
        |  ON gr.g = f.g
        |  WHERE f.c >= 2 AND NOT (gr.doc_id = f.f.doc_id AND gr.p = f.f.p)),
        |rem AS (SELECT DISTINCT doc_id, unnest(range(p, p + 8)) AS rp
        |  FROM dups),
        |tok2 AS (SELECT doc_id, unnest(arr) AS tok,
        |    CAST(generate_subscripts(arr, 1) - 1 AS BIGINT) AS tp FROM toks),
        |kept AS (SELECT t.doc_id, t.tok, t.tp FROM tok2 t
        |  LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.rp = t.tp
        |  WHERE r.doc_id IS NULL),
        |outp AS (SELECT doc_id,
        |    coalesce(string_agg(tok, ' ' ORDER BY tp), '') AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id, coalesce(o.clean_text, '') AS clean_text,
        |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(string_split(d.text, ' ')) - coalesce(o.n_kept, 0)
        |    AS BIGINT) AS n_removed
        |FROM documents d LEFT JOIN outp o USING (doc_id)""".stripMargin,
  )
}
