package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Vector/embedding surface: ANN (brute/LSH/IVF/PQ/int8),
  * k-means, random projection, semantic dedup, kNN eval.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object VectorQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Similarity search: brute-force cosine top-k
    "q24_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(queries, emb, 10)
    }),

    // LSH-bucketed ANN top-k. The md5-portable plane table (LshPlanes)
    // makes the bucket assignment SQL-reproducible, so the whole probe
    // pipeline is oracle-checked (sqlQ32LshTopK).
    "q32_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding")),
        emb, 10, bits = 4)
    }),

    // IVF ANN: deterministic hash-seeded coarse quantizer + probed-cell
    // exact rerank — every stage (centroid choice, cell assignment,
    // probing, rerank) reproduced by the DuckDB oracle. The trained
    // k-means quantizer (ivfTopK) keeps its spec coverage; its init is
    // engine-specific and can't be oracled.
    "q40_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKSeeded(
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding")),
        emb, 10, nlist = 16, nprobe = 3)
    }),

    // Int8 embedding quantization (corpus-prep export for memory-bound
    // ANN at 100 TB: 4x smaller vectors at a certified reconstruction
    // error). Fully oracled: scales, quantized-value aggregates, and
    // saturation counts are bit-exact across engines (abs/max/divide are
    // single IEEE ops, round-half-away agrees), and err_ok certifies
    // |x - q*scale| <= scale/2 per vector in BOTH engines.
    "q100_embed_quantize" -> ((s, d) => {
      import graft.functions.VectorFunctions
      val withQ = Tables.embeddings(s, d)
        .withColumn("__scale", VectorFunctions.int8Scale(col("embedding")))
        .withColumn("__q",
          VectorFunctions.quantizeInt8(col("embedding"), col("__scale")))
      val err = aggregate(
        zip_with(col("embedding"), col("__q"), (x, qi) =>
          abs(x.cast("double") - qi.cast("double") * col("__scale"))),
        lit(0.0), (acc, e) => greatest(acc, e))
      withQ.select(
        col("vec_id"),
        round(col("__scale") * 1e9).cast("long").as("scale_x1e9"),
        size(col("__q")).cast("long").as("n_dims"),
        aggregate(col("__q"), lit(0L), (a, x) => a + x.cast("long"))
          .as("sum_q"),
        aggregate(col("__q"), lit(0L), (a, x) => a + abs(x).cast("long"))
          .as("sum_abs_q"),
        size(filter(col("__q"), x => abs(x) === 127)).cast("long")
          .as("n_sat"),
        (col("__scale") === 0.0 ||
          err <= col("__scale") * 0.5 + lit(1e-12)).as("err_ok"))
    }),

    // Quantized ANN: q24's brute-force top-k on the int8-quantized
    // corpus (4x smaller vectors), scored by the fused integer
    // Int8Cosine loop. Integer dot/norms are order-exact, so unlike the
    // float form there is NO fold-order contract to honor — the oracle
    // reproduces the similarity bit-for-bit from plain list arithmetic.
    "q101_ann_int8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopKInt8(queries, emb, 10)
    }),

    // Product-quantization ANN (Similarity.pqTopK): corpus stored as
    // m=8 four-bit-ish codes (64x smaller than float32), queries scored
    // by ADC table lookups. The deterministic hash-ordered codebook makes
    // every stage SQL-reproducible, so the WHOLE pipeline — encoding
    // argmin, lookup tables, final ranking — is oracle-checked, not just
    // recall-certified.
    "q113_pq_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.pqTopK(queries, emb, 10)
    }),

    // IVF-PQ ANN (Similarity.ivfPqTopK): the FAISS-style 100 TB layout —
    // the coarse quantizer prunes the SCAN (nprobe of nlist cells), the
    // product codes shrink the scanned BYTES (~64x); the whole index is
    // (cell, 8 codes) per vector and exact floats never appear at query
    // time. Both quantizers are deterministic hash-ordered samples, so
    // the oracle re-derives index build AND query path end to end.
    "q119_ivfpq_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.ivfPqTopK(queries, emb, 10)
    }),

    // Deterministic contrastive negative sampling
    // (Sampling.contrastiveNegatives): 4 hash-addressed negatives per
    // doc, excluding normalized-exact duplicates as false negatives.
    // Every draw is md5-derived, so the oracle reproduces the exact
    // pairing (row_number index + the same '0x'||substr(md5) hash).
    "q124_negative_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val nk = md5(trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), " +", " ")).cast("binary"))
      val keyed = docs.select(col("doc_id"), nk.as("nk"))
      val a = keyed.select(col("doc_id").as("id_a"), col("nk"))
      val b = keyed.select(col("doc_id").as("id_b"), col("nk"))
      val dupPairs = a.join(b, "nk").filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      graft.operators.Sampling.contrastiveNegatives(docs, "doc_id", 4,
        exclude = Some(dupPairs))
    }),

    // Integer-exact Lloyd k-means (Clustering.kMeansLloyd): quantize
    // once to longs, then seed/assign/update are all exact integer
    // arithmetic with deterministic tie-breaks — the whole 4-round
    // trajectory is bit-reproducible, so the oracle re-derives it as
    // unrolled CTEs (the q109/q128 pattern) instead of trusting a
    // trained artifact.
    "q145_kmeans" -> ((s, d) =>
      graft.operators.Clustering.kMeansLloyd(
        Tables.embeddings(s, d), "vec_id", "embedding",
        k = 8, dim = 64, rounds = 4)),

    // Signed random projection (Similarity.randomProjection): 16
    // md5-parity ±1 hyperplanes over the quantized embeddings — exact
    // integer projections + the sign-bit SRP code, zero shuffles.
    // Gate emits the long form (one row per (vec, plane)) — the compare
    // harness hashes scalar columns, so the array stays library-side.
    "q148_random_projection" -> ((s, d) =>
      graft.operators.Similarity.randomProjection(
        Tables.embeddings(s, d), "vec_id", "embedding",
        outDim = 16, dim = 64)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "p")),
          col("srp_code"))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("p"),
          col("srp_code"))),

    // Distribution-drift report between the first and second half-month
    // of the purchase feed (Expectations.driftReport): integer
    // cross-multiplied drift flag at 20% relative change.
    "q153_drift" -> ((s, d) => {
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          pmod(col("user_id"), lit(25)).as("cohort"))
      val split = p.agg((min("day") + 15L).as("split"))
      val pp = p.crossJoin(broadcast(split))
      graft.operators.Expectations.driftReport(
        pp.filter(col("day") < col("split")),
        pp.filter(col("day") >= col("split")),
        "cohort", "user_id", col("cents"), num = 1L, den = 5L)
    }),

    // SemDeDup (Clustering.semDedup): q145's k-means clusters + the
    // intra-cluster integer-cosine prune at tau = 2/5 (the synthetic
    // embeddings' near-dup band — max pairwise cosine is ~0.6, so 0.95
    // would leave the drop arm dead). Both kept and dropped rows are
    // live at both scales.
    //
    // k scales with the corpus (k = max(8, n/250), the paper's k ∝ N
    // rule): a PINNED k makes the intra-cluster pair join quadratic —
    // the first ×100 smoke ran 8 clusters of 25k vectors each and blew
    // up ×142. The floor keeps k = 8 at BOTH oracle scales (n = 500 and
    // 2000), so the static kmeansCtes(8) oracle is exact; the count() is
    // one metadata-cheap job.
    "q154_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val k = math.max(8L, emb.count() / 250L).toInt
      graft.operators.Clustering.semDedup(emb, "vec_id", "embedding",
        k = k, dim = 64, rounds = 4, tauNum = 2, tauDen = 5)
    }),

    // kNN classification over embeddings (the labeled-neighbor vote —
    // the standard embedding-quality eval): a FIXED-SIZE 100-query
    // held-out set (md5-ranked take — TakeOrdered, never a global
    // sort), top-10 cosine neighbors from the rest vote, the majority
    // label wins with (votes desc, label asc) tie-break via one struct
    // max. Composes the audited q24 ranking; the vote adds one
    // neighbor-label join + two label-sized aggregates.
    //
    // The eval set is PINNED at 100 regardless of corpus size (the
    // sf0.01 oracle fixture has only 500 vectors — a bigger pin would
    // leave no corpus to retrieve from): the
    // earlier every-20th-vector rule grew queries with the corpus and
    // made the whole eval O(N²/20) — the board's only super-linear
    // ×100 target (×764). With 100 broadcast queries the eval is one
    // linear corpus scan at any scale; the md5 rank keeps membership a
    // pure function of the data (same idiom as q52/q232), reproducible
    // from plain SQL.
    "q216_knn_classify" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qIds = e.select(col("vec_id"),
          md5(col("vec_id").cast("string").cast("binary")).as("__h"))
        .orderBy(col("__h"), col("vec_id")).limit(100)
        .select("vec_id")
      val queries = e.join(broadcast(qIds), "vec_id")
      val corpus = e.join(broadcast(qIds), Seq("vec_id"), "left_anti")
      val nbr = graft.operators.Similarity.bruteForceTopK(
        queries.select(col("vec_id").as("query_id"), col("embedding")),
        corpus, k = 10)
      val votes = nbr
        .join(corpus.select(col("vec_id"), col("label")), "vec_id")
        .groupBy("query_id", "label").agg(count(lit(1)).as("v"))
      votes.groupBy("query_id")
        .agg(max(struct(col("v"), (-col("label")).as("nl"),
          col("label"))).as("m"))
        .select(col("query_id"),
          col("m.label").cast("long").as("pred_label"),
          col("m.v").as("n_votes"))
        .join(queries.select(col("vec_id").as("query_id"),
          col("label").cast("long").as("true_label")), "query_id")
        .withColumn("correct", col("pred_label") === col("true_label"))
    }),

    // Leading principal component with an integer-exact covariance
    // oracle (Pca.leadingComponentCertified): coords quantize to
    // round(x·1e6) longs in ONE distributed aggregate (45 longs out);
    // cov_ij is an exact integer rational both engines recompute
    // bit-for-bit; the eigenvector is deterministic driver power
    // iteration certified by pc1_ok (residual bound, oracle-pinned).
    "q233_pca_power" -> ((s, d) =>
      graft.operators.Pca.leadingComponentCertified(
        s, Tables.embeddings(s, d), "embedding", dims = 8)),
  )

  val oracles: Map[String, String] = Map(

    "q24_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb
        |  FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_sum(list_transform(list_zip(e.embedding, q.q_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.q_emb,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))), 6) AS sim
        |  FROM embeddings e, q),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 10""".stripMargin,

    "q32_lsh_topk" -> sqlQ32LshTopK,

    "q40_ivf_topk" -> sqlQ40IvfTopK,

    "q101_ann_int8" ->
      """WITH qz AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CASE WHEN s = 0 THEN 0
        |      ELSE CAST(round(CAST(x AS DOUBLE) / s, 0) AS INT) END) AS qv
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
        |        FROM embeddings)),
        |q AS (SELECT vec_id AS query_id, qv AS q_q FROM qz
        |      WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(CAST(list_sum(list_transform(list_zip(e.qv, q.q_q),
        |        p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT)))
        |        AS DOUBLE)
        |      / NULLIF(sqrt(CAST(list_sum(list_transform(e.qv,
        |            v -> CAST(v AS BIGINT) * CAST(v AS BIGINT))) AS DOUBLE))
        |        * sqrt(CAST(list_sum(list_transform(q.q_q,
        |            v -> CAST(v AS BIGINT) * CAST(v AS BIGINT))) AS DOUBLE)),
        |        0), 6) AS sim
        |  FROM qz e, q),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC NULLS LAST, vec_id ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 10""".stripMargin,

    "q100_embed_quantize" ->
      """WITH sc AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |qq AS (
        |  SELECT vec_id, scale, embedding,
        |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(round(CAST(x AS DOUBLE) / scale, 0) AS INT) END)
        |      AS qv
        |  FROM sc)
        |SELECT vec_id,
        |  CAST(round(scale * 1000000000, 0) AS BIGINT) AS scale_x1e9,
        |  CAST(len(qv) AS BIGINT) AS n_dims,
        |  CAST(list_sum(qv) AS BIGINT) AS sum_q,
        |  CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT)
        |    AS sum_abs_q,
        |  CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT) AS n_sat,
        |  (scale = 0 OR list_max(list_transform(list_zip(embedding, qv),
        |      p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale)))
        |    <= scale * 0.5 + 1e-12) AS err_ok
        |FROM qq""".stripMargin,

    "q113_pq_ann" -> sqlQ113PqAnn,

    "q119_ivfpq_ann" -> sqlQ119IvfPq,

    // The identical hash-addressed pairing: row_number index by doc_id,
    // the portable 32-bit md5 hash mod N, self-pairs dropped, exact-dup
    // pairs anti-joined on the canonical key.
    "q124_negative_pairs" ->
      """WITH idx AS MATERIALIZED (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |  FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |js AS (SELECT CAST(unnest(range(1, 5)) AS BIGINT) AS j),
        |cand AS (
        |  SELECT i.doc_id AS anchor_id, js.j,
        |    CAST(('0x' || substr(md5(
        |      CAST(i.doc_id AS VARCHAR) || ':' || CAST(js.j AS VARCHAR)),
        |      1, 8)) AS BIGINT) % n.n_docs AS neg_idx
        |  FROM idx i, n, js),
        |joined AS (
        |  SELECT c.anchor_id, c.j, x.doc_id AS neg_id
        |  FROM cand c JOIN idx x ON x.idx = c.neg_idx
        |  WHERE x.doc_id <> c.anchor_id),
        |nrm AS (
        |  SELECT doc_id, md5(trim(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS nk
        |  FROM documents),
        |ex AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM nrm a JOIN nrm b ON a.nk = b.nk AND a.doc_id < b.doc_id)
        |SELECT anchor_id, j, neg_id FROM joined jo
        |WHERE NOT EXISTS (SELECT 1 FROM ex
        |  WHERE ex.id_a = least(jo.anchor_id, jo.neg_id)
        |    AND ex.id_b = greatest(jo.anchor_id, jo.neg_id))""".stripMargin,

    // Unrolled integer-exact Lloyd trajectory (see sqlQ145KMeans).
    "q145_kmeans" -> sqlQ145KMeans,

    // The q145 trajectory + intra-cluster integer-cosine prune.
    "q154_semdedup" -> sqlQ154SemDedup,

    // Relational twin of the unrolled sign expressions: the ±1 matrix
    // from the same md5-hex-parity formula, the projection as an exact
    // integer sum, the code from the same strict >0 sign bits.
    "q148_random_projection" ->
      """WITH sgn AS MATERIALIZED (
        |  SELECT j, d,
        |    CASE WHEN substr(md5(j || ':' || d), 32, 1)
        |      IN ('0','2','4','6','8','a','c','e')
        |    THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(range(0, 16)) AS j),
        |       (SELECT unnest(range(0, 64)) AS d)),
        |q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000)
        |      AS BIGINT) AS qd
        |  FROM embeddings),
        |pr AS MATERIALIZED (
        |  SELECT vec_id, j, CAST(sum(qd * s) AS BIGINT) AS p
        |  FROM q JOIN sgn USING (d) GROUP BY vec_id, j),
        |code AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN p > 0 THEN (CAST(1 AS BIGINT) << j)
        |      ELSE 0 END) AS BIGINT) AS srp_code
        |  FROM pr GROUP BY vec_id)
        |SELECT pr.vec_id, CAST(pr.j AS BIGINT) AS j, pr.p, code.srp_code
        |FROM pr JOIN code USING (vec_id)""".stripMargin,

    // Same two keyed aggregates + full-outer + integer cross-multiplied
    // drift flag.
    "q153_drift" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |    user_id % 25 AS cohort
        |  FROM events WHERE event_type = 'purchase'),
        |sp AS (SELECT min(day) + 15 AS split FROM p),
        |a AS (
        |  SELECT cohort, count(*) AS n_a,
        |    count(DISTINCT user_id) AS entities_a,
        |    CAST(sum(cents) AS BIGINT) AS sum_a
        |  FROM p, sp WHERE day < split GROUP BY cohort),
        |b AS (
        |  SELECT cohort, count(*) AS n_b,
        |    count(DISTINCT user_id) AS entities_b,
        |    CAST(sum(cents) AS BIGINT) AS sum_b
        |  FROM p, sp WHERE day >= split GROUP BY cohort)
        |SELECT cohort,
        |  coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        |  coalesce(entities_a, 0) AS entities_a,
        |  coalesce(entities_b, 0) AS entities_b,
        |  coalesce(sum_a, 0) AS sum_a, coalesce(sum_b, 0) AS sum_b,
        |  CAST(abs(coalesce(n_a, 0) - coalesce(n_b, 0)) * 5
        |    > coalesce(n_a, 0) * 1 AS BIGINT) AS drifted
        |FROM a FULL OUTER JOIN b USING (cohort)""".stripMargin,

    // The identical cosine ranking (q24's expression), neighbor vote,
    // and (votes desc, label asc) winner over the same md5-ranked
    // fixed 500-query eval set.
    "q216_knn_classify" ->
      """WITH ids AS (
        |  SELECT vec_id FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 100),
        |q AS (
        |  SELECT e.vec_id AS query_id, e.embedding AS qe, e.label
        |  FROM embeddings e JOIN ids ON ids.vec_id = e.vec_id),
        |c AS (SELECT * FROM embeddings
        |  WHERE vec_id NOT IN (SELECT vec_id FROM ids)),
        |s AS (
        |  SELECT q.query_id, c.vec_id, c.label,
        |    round(list_sum(list_transform(list_zip(c.embedding, q.qe),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(c.embedding,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(q.qe,
        |            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))), 6)
        |      AS sim
        |  FROM c, q),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, vec_id ASC) AS rank FROM s),
        |v AS (SELECT query_id, label, count(*) AS v FROM r
        |      WHERE rank <= 10 GROUP BY 1, 2),
        |p AS (SELECT query_id, label AS pred_label, v AS n_votes FROM (
        |        SELECT *, row_number() OVER (PARTITION BY query_id
        |          ORDER BY v DESC, label ASC) AS rk FROM v)
        |      WHERE rk = 1)
        |SELECT p.query_id, CAST(p.pred_label AS BIGINT) AS pred_label,
        |  p.n_votes, CAST(q.label AS BIGINT) AS true_label,
        |  p.pred_label = q.label AS correct
        |FROM p JOIN q USING (query_id)""".stripMargin,

    // q233: covariance recomputed from the same quantized longs in
    // HUGEINT (numerator n·Σqᵢqⱼ − Σqᵢ·Σqⱼ exactly), one double
    // division; pc1_ok is the certificate column pinned true
    "q233_pca_power" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |ql AS (SELECT vec_id, i,
        |    CAST(round(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
        |      * 1000000, 0) AS BIGINT) AS q
        |  FROM e, unnest(range(0, 8)) u(i)),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
        |m AS (SELECT i, CAST(sum(q) AS BIGINT) AS s FROM ql GROUP BY 1),
        |p AS (SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS p
        |  FROM ql a JOIN ql b ON a.vec_id = b.vec_id AND b.i >= a.i
        |  GROUP BY 1, 2)
        |SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
        |  round(CAST(CAST(t.n AS HUGEINT) * p.p
        |      - CAST(ma.s AS HUGEINT) * mb.s AS DOUBLE)
        |    / CAST(CAST(t.n AS HUGEINT) * t.n * 1000000000000 AS DOUBLE), 6)
        |    AS cov,
        |  TRUE AS pc1_ok
        |FROM p, t, m ma, m mb WHERE ma.i = p.i AND mb.i = p.j""".stripMargin,
  )
}
