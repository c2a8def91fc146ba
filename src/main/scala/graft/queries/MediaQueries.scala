package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Multimodal: synthetic image decode/resize/phash,
  * frame sampling, scene detection, audio fingerprint + match.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object MediaQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multimodal: deterministic PNG payloads -> REAL javax.imageio decode
    // -> dimensions + channel means. The synthetic pixels are integer
    // functions of the id, so the DuckDB oracle predicts the decoded
    // stats exactly — the whole encode/decode byte path is hash-checked.
    "q31_media_features" -> ((s, d) =>
      Multimodal.decodeImages(
        Multimodal.synthImages(
          Tables.documents(s, d).select("doc_id"), "doc_id"), 8)
        .toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))),

    // End-to-end multimodal similarity: PNG payloads -> real imageio
    // decode (mapPartitions) -> cosine top-k over the extracted feature
    // vectors. The decoded features are closed-form predictable (see
    // q31), so the full decode -> ANN composition is oracle-checked.
    "q67_media_ann" -> ((s, d) => {
      // feats feeds BOTH sides of the ANN (corpus + broadcast query) —
      // without the persist the ImageIO encode+decode subtree executes
      // once per side. CacheScope-tracked so harnesses release it after
      // materializing the result.
      val feats = CacheScope.track(
        Multimodal.decodeImages(
          Multimodal.synthImages(
            Tables.documents(s, d).select("doc_id"), "doc_id"), 8)
          .toDF()
          .select(col("media_id").as("vec_id"),
            col("features").as("embedding"))
          .persist())
      val qs = feats.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(qs, feats, 10)
    }),

    // Multimodal resize stage: synth PNG -> real decode -> deterministic
    // nearest-neighbor resample to 8x6 -> PNG re-encode -> real decode of
    // the thumbnail. The floor index map (sx = x*w/8) is closed-form, so
    // the oracle predicts the resampled channel means exactly — the whole
    // two-codec byte path is hash-checked.
    "q91_media_resize" -> ((s, d) =>
      Multimodal.decodeImages(
        Multimodal.resizeImages(
          Multimodal.synthImages(
            Tables.documents(s, d).select("doc_id"), "doc_id"), 8, 6), 8)
        .toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))),

    // Frame sampling as a gate: every 2nd 64-byte chunk of each payload
    // becomes its own row (the video-frame-sampling shape over an opaque
    // binary column). Payloads here are the documents' ASCII text bytes,
    // so the chunk content is oracle-expressible as substr — the chunking
    // arithmetic (grouped + zipWithIndex + stride filter) is what's
    // being pinned.
    "q92_frame_sample" -> ((s, d) =>
      Multimodal.sampleChunks(
        Multimodal.fromStrings(
          Tables.documents(s, d), "doc_id", "text", "text/plain"),
        chunkBytes = 64, everyK = 2)
        .select(col("media_id"),
          col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk").cast("string").as("chunk"))),

    // Perceptual image hash (Multimodal.perceptualHashes): 8×8 aHash
    // over the decoded synthetic images — integer luma, strict-mean
    // bits, two-long packing. Every bit oracle-derived in closed form.
    "q164_image_phash" -> ((s, d) =>
      graft.operators.Multimodal.perceptualHashes(
        graft.operators.Multimodal.synthImages(
          Tables.documents(s, d).select("doc_id"), "doc_id"))),

    // Image near-dup keep/drop (Dedup.hammingNearDupKept over q164's
    // hashes): exact-hash collapse first (the synthetic corpus has
    // identical-hash groups of 400+ — the hot-bucket case the operator
    // is built for), then 4×16-bit banded pairs over DISTINCT hashes
    // with exact popcount verify at Hamming <= 3. 322 kept / 4678
    // dropped at sf0.1.
    "q165_image_neardup" -> ((s, d) =>
      graft.operators.Dedup.hammingNearDupKept(
        graft.operators.Multimodal.perceptualHashes(
          graft.operators.Multimodal.synthImages(
            Tables.documents(s, d).select("doc_id"), "doc_id")),
        "media_id", "hash_hi", "hash_lo", maxDist = 3)),

    // Audio fingerprinting (Multimodal.synthAudio + audioFrames): a
    // full RIFF/WAVE container round trip — synthetic 16-bit mono PCM
    // whose every sample is a closed-form integer of the id, decoded
    // by a real chunk walker; per-frame integer band energies + peak
    // band in mapPartitions, then the Shazam-style adjacent-peak
    // fingerprint as a relational lead() — frames, not samples, cross
    // into the window (1/256 of decoded volume).
    "q173_audio_fingerprint" -> ((s, d) => {
      val fr = graft.operators.Multimodal.audioFrames(
        graft.operators.Multimodal.synthAudio(
          Tables.documents(s, d).select("doc_id"), "doc_id")).toDF()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("frame_idx")
      fr.withColumn("fp",
        col("peak_band") * 4 + lead(col("peak_band"), 1).over(w))
    }),

    // Shazam-style audio retrieval (Multimodal.fingerprintMatch): query
    // clips are time-shifted EXCERPTS of the corpus tracks, re-encoded
    // through the real WAV container (synthAudioClips); fingerprints =
    // q173's adjacent-peak pairs enriched with the frame energy mod 2^16;
    // the matcher joins on fp value, histograms dt = track − query
    // frame, and keeps each query's offset-coherent best — recovering
    // (source track, shift) from audio bytes alone. Every energy is
    // re-derived in closed form by the oracle (the q173 discipline), so
    // the whole retrieval is hash-exact. All 43 queries recover their
    // source at sf0.01; at sf0.1 the synthetic signal itself repeats
    // (ids congruent mod 4096 share samples), so ~79 queries tie with
    // a genuine content-duplicate track and the deterministic
    // tie-break picks the smaller id — correct retrieval of duplicate
    // content, not a collision artifact.
    "q188_audio_match" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val M = graft.operators.Multimodal
      def fps(frames: org.apache.spark.sql.DataFrame) = {
        val w = Window.partitionBy("media_id").orderBy("frame_idx")
        frames.withColumn("fp",
          (col("peak_band") * 4 + lead(col("peak_band"), 1).over(w))
            * 65536 + pmod(col("e0") + col("e1") + col("e2") + col("e3"),
              lit(65536L)))
          .filter(col("fp").isNotNull)
          .select("media_id", "frame_idx", "fp")
      }
      val docs = Tables.documents(s, d).select("doc_id")
      val tracks = fps(M.audioFrames(M.synthAudio(docs, "doc_id")).toDF())
      // queries: every 5th doc with >= 8 track frames; clip = 4 frames
      // starting at frame 1 + id%3 (so the clip always fits)
      val clipsIn = docs
        .filter(pmod(col("doc_id"), lit(5L)) === 0 &&
          pmod(col("doc_id"), lit(7L)) >= 4)
        .select(col("doc_id").as("id"),
          ((pmod(col("doc_id"), lit(3L)) + 1) * 256).as("off"),
          lit(1024L).as("n"))
      val queries = fps(M.audioFrames(M.synthAudioClips(clipsIn)).toDF())
      M.fingerprintMatch(queries, tracks)
    }),

    // Scene-change detection (Multimodal.sceneChanges): 32-byte frames
    // off the binary payload, exact integer frame energies, boundary at
    // a >= 1/20 relative energy jump (cross-multiplied), scene id as
    // the running boundary count — the shot-splitting pass before
    // per-shot dedup/captioning.
    "q207_scene_detect" -> ((s, d) => {
      val M = graft.operators.Multimodal
      M.sceneChanges(
        M.sampleChunks(
          M.fromStrings(Tables.documents(s, d), "doc_id", "text",
            "video/raw"),
          chunkBytes = 32, everyK = 1),
        tNum = 1, tDen = 20)
    }),
  )

  val oracles: Map[String, String] = Map(

    "q31_media_features" -> sqlQ31MediaFeatures,

    "q67_media_ann" -> sqlQ67MediaAnn,

    "q91_media_resize" -> sqlQ91MediaResize,

    // chunk count = ceil(len/64) via integer arithmetic; stride-2 filter;
    // 1-based substr start. ASCII fixture text => bytes == chars.
    "q92_frame_sample" ->
      """WITH t AS (
        |  SELECT doc_id, text, length(text) AS n FROM documents),
        |idx AS (
        |  SELECT doc_id, text, CAST(p AS BIGINT) AS chunk_idx
        |  FROM t, unnest(range((n + 63) // 64)) AS u(p)
        |  WHERE p % 2 = 0)
        |SELECT doc_id AS media_id, chunk_idx,
        |  substr(text, CAST(chunk_idx * 64 + 1 AS INT), 64) AS chunk
        |FROM idx""".stripMargin,

    // The synthetic pixel channels in closed form through the 8×8 floor
    // map, ITU-601 integer luma, strict-mean bits, two-long packing
    // (2^p sums never touch bit 31 of a half, so BIGINT is exact).
    "q164_image_phash" -> (sqlPhashCtes +
      "\nSELECT doc_id AS media_id, hi AS hash_hi, lo AS hash_lo FROM hh"),

    // Same hash derivation + ALL-pairs over distinct hashes (no bands —
    // the oracle verifies every pair) + the smallest-rep domination rule.
    "q165_image_neardup" -> (sqlPhashCtes +
      """,
        |g AS (SELECT hi, lo, min(doc_id) AS rep FROM hh GROUP BY 1, 2),
        |dom AS (
        |  SELECT DISTINCT b.rep FROM g a JOIN g b ON a.rep < b.rep
        |  WHERE bit_count(xor(CAST(a.hi AS BIT), CAST(b.hi AS BIT)))
        |      + bit_count(xor(CAST(a.lo AS BIT), CAST(b.lo AS BIT))) <= 3)
        |SELECT h.doc_id AS media_id, h.hi AS hash_hi, h.lo AS hash_lo,
        |  (h.doc_id = g.rep AND g.rep NOT IN (SELECT rep FROM dom)) AS kept
        |FROM hh h JOIN g USING (hi, lo)""".stripMargin),

    // Every decoded sample re-derived in closed form from the synthetic
    // PCM formula (the q164 discipline for audio): band energies,
    // >=-chain peak, and the adjacent-peak fingerprint via lead().
    "q173_audio_fingerprint" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, 1024 + (doc_id % 7) * 256 AS n
        |  FROM documents),
        |idx AS (SELECT media_id, unnest(range(0, n)) AS i FROM d),
        |s AS (SELECT media_id, i // 256 AS frame_idx, (i % 256) // 64 AS band,
        |        abs((media_id * 31 + i * i * 7) % 4096 - 2048) AS a FROM idx),
        |e AS (SELECT media_id, frame_idx,
        |        CAST(sum(CASE WHEN band = 0 THEN a ELSE 0 END) AS BIGINT) AS e0,
        |        CAST(sum(CASE WHEN band = 1 THEN a ELSE 0 END) AS BIGINT) AS e1,
        |        CAST(sum(CASE WHEN band = 2 THEN a ELSE 0 END) AS BIGINT) AS e2,
        |        CAST(sum(CASE WHEN band = 3 THEN a ELSE 0 END) AS BIGINT) AS e3
        |      FROM s GROUP BY 1, 2),
        |p AS (SELECT *, CAST(CASE WHEN e0 >= e1 AND e0 >= e2 AND e0 >= e3 THEN 0
        |        WHEN e1 >= e2 AND e1 >= e3 THEN 1
        |        WHEN e2 >= e3 THEN 2 ELSE 3 END AS BIGINT) AS peak_band FROM e)
        |SELECT media_id, frame_idx, e0, e1, e2, e3, peak_band,
        |  peak_band * 4 + lead(peak_band) OVER
        |    (PARTITION BY media_id ORDER BY frame_idx) AS fp
        |FROM p""".stripMargin,

    // Track energies/peaks re-derived in closed form (the q173 CTEs);
    // clip fingerprints ARE the track fingerprints at frames
    // off..off+2 (same samples), re-indexed to clip frames; then the
    // identical join + offset histogram + (votes desc, track, dt)
    // winner.
    "q188_audio_match" ->
      """WITH d AS (
        |  SELECT doc_id AS media_id, 1024 + (doc_id % 7) * 256 AS n
        |  FROM documents),
        |idx AS (SELECT media_id, unnest(range(0, n)) AS i FROM d),
        |s AS (SELECT media_id, i // 256 AS frame_idx, (i % 256) // 64 AS band,
        |        abs((media_id * 31 + i * i * 7) % 4096 - 2048) AS a FROM idx),
        |e AS (SELECT media_id, frame_idx,
        |        CAST(sum(CASE WHEN band = 0 THEN a ELSE 0 END) AS BIGINT) AS e0,
        |        CAST(sum(CASE WHEN band = 1 THEN a ELSE 0 END) AS BIGINT) AS e1,
        |        CAST(sum(CASE WHEN band = 2 THEN a ELSE 0 END) AS BIGINT) AS e2,
        |        CAST(sum(CASE WHEN band = 3 THEN a ELSE 0 END) AS BIGINT) AS e3
        |      FROM s GROUP BY 1, 2),
        |p AS (SELECT *, CAST(CASE WHEN e0 >= e1 AND e0 >= e2 AND e0 >= e3 THEN 0
        |        WHEN e1 >= e2 AND e1 >= e3 THEN 1
        |        WHEN e2 >= e3 THEN 2 ELSE 3 END AS BIGINT) AS peak_band FROM e),
        |tf AS (SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |        (peak_band * 4 + lead(peak_band) OVER
        |          (PARTITION BY media_id ORDER BY frame_idx)) * 65536
        |          + (e0 + e1 + e2 + e3) % 65536 AS fp
        |      FROM p),
        |tfv AS (SELECT * FROM tf WHERE fp IS NOT NULL),
        |qf AS (SELECT media_id AS query_id,
        |        frame_idx - (1 + media_id % 3) AS qf, fp
        |      FROM tfv
        |      WHERE media_id % 5 = 0 AND media_id % 7 >= 4
        |        AND frame_idx BETWEEN (1 + media_id % 3)
        |          AND (3 + media_id % 3)),
        |h AS (SELECT q.query_id, t.media_id AS track_id,
        |        t.frame_idx - q.qf AS dt, count(*) AS n_matches
        |      FROM qf q JOIN tfv t USING (fp) GROUP BY 1, 2, 3)
        |SELECT query_id, track_id, dt, n_matches FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY n_matches DESC, track_id, dt) AS rk FROM h)
        |WHERE rk = 1""".stripMargin,

    // The identical byte-position frame energies, lag boundary test,
    // and running boundary count.
    "q207_scene_detect" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, text, len(text) AS n FROM documents),
        |p AS (
        |  SELECT media_id, (i - 1) // 32 AS frame_idx,
        |    ascii(substr(text, CAST(i AS INT), 1)) AS c
        |  FROM b, unnest(range(1, n + 1)) u(i)),
        |e AS (SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |        CAST(sum(c) AS BIGINT) AS energy
        |      FROM p GROUP BY 1, 2),
        |r AS (SELECT *, lag(energy) OVER
        |        (PARTITION BY media_id ORDER BY frame_idx) AS prev
        |      FROM e),
        |x AS (SELECT media_id, frame_idx, energy,
        |        prev IS NOT NULL
        |          AND abs(energy - prev) * 20 >= (energy + prev)
        |          AS is_boundary
        |      FROM r)
        |SELECT media_id, frame_idx, energy, is_boundary,
        |  CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END) OVER
        |    (PARTITION BY media_id ORDER BY frame_idx
        |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_id
        |FROM x""".stripMargin,
  )
}
