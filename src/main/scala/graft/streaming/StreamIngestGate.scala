package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous ingest gate — the streaming form of the q83 cross-batch
  * near-dup check: flag arriving documents whose MinHash bands collide
  * with the historical corpus.
  *
  * Split of labor at scale:
  *  - the HISTORY side is a static band index (hist_id, band, bucket)
  *    built once by [[bandIndex]] from the relational signature pipeline
  *    (in production: persisted parquet, refreshed on compaction);
  *  - each micro-batch computes the incoming docs' signatures PER ROW
  *    with the Column-form twin (spec-pinned value-identical to the
  *    relational form, so stream buckets match index buckets exactly) —
  *    stateless, no streaming aggregation, no shuffle on the stream
  *    side; per-doc HOF cost is fine at ingest rates, unlike the
  *    corpus-wide batch path;
  *  - candidates come from the stream-static inner join on
  *    (band, bucket); the ONLY streaming state is the flagged-pair
  *    dedup, bounded by the watermark horizon.
  * Exact verification (full-signature agreement) stays in the batch
  * layer ([[Dedup.incrementalNearDups]]) — the stream gate is the cheap
  * early filter in front of it.
  */
object StreamIngestGate {

  /** Static (hist_id, band, bucket) index over the historical corpus —
    * [[Dedup.bandedSignatures]]' layout, so stream and batch consumers
    * can never key buckets differently.
    */
  def bandIndex(history: DataFrame, textCol: String, idCol: String,
                shingleN: Int = 3, k: Int = 32, bands: Int = 8): DataFrame =
    Dedup.bandedSignatures(
      Dedup.minhashSignatures(history, textCol, idCol, shingleN, k),
      k, bands)
      .withColumnRenamed("id", "hist_id")

  /** The j-th 16-bit band of a 64-bit perceptual hash packed as two
    * 32-bit halves (lo holds bands 0-1, hi holds 2-3) — the ONE bucket
    * keying both [[imageHashIndex]] and [[imageFlagStream]] use: the
    * pigeonhole recall guarantee holds only while stream and index key
    * buckets identically, so the formula must not exist twice.
    */
  private def band16(hi: org.apache.spark.sql.Column,
                     lo: org.apache.spark.sql.Column, j: Int)
  : org.apache.spark.sql.Column =
    shiftright(if (j < 2) lo else hi, 16 * (j % 2))
      .bitwiseAND(lit(0xFFFFL))

  /** Static banded index over historical image hashes for
    * [[imageFlagStream]] — [[Dedup.hammingNearDupKept]]'s layout logic:
    * identical hashes collapse to their min id FIRST (the synthetic
    * corpus has 400+-member identical-hash groups; banding raw images
    * would put c² pairs in one bucket and re-flag the same duplicate
    * relationship c times), then each distinct hash emits its 4×16-bit
    * band values.
    */
  def imageHashIndex(histHashes: DataFrame): DataFrame = {
    val reps = histHashes
      .groupBy("hash_hi", "hash_lo")
      .agg(min(col("media_id")).as("hist_id"))
    reps.select(col("hist_id"), col("hash_hi").as("h_hi"),
      col("hash_lo").as("h_lo"),
      posexplode(array((0 until 4).map(j =>
        band16(col("hash_hi"), col("hash_lo"), j)): _*)))
      .select(col("hist_id"), col("h_hi"), col("h_lo"),
        col("pos").as("bj"), col("col").as("bv"))
  }

  /** Image-ingest dedup gate: flag arriving images whose perceptual hash
    * lies within Hamming `maxDist` of a historical representative. The
    * stream side is stateless per row (4 band values per image via ONE
    * posexplode); candidates come from the stream-static equi-join on
    * (band, value) with the exact popcount verify; the only streaming
    * state is the watermark-bounded flagged-pair dedup (a pair can match
    * on several bands). Recall is the pigeonhole guarantee for
    * maxDist <= 3. `incoming` = (media_id, ts, hash_hi, hash_lo) — the
    * [[graft.operators.Multimodal.perceptualHashStream]] shape.
    */
  def imageFlagStream(incoming: DataFrame, index: DataFrame,
                      watermark: String, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"4 bands of 16 bits guarantee recall only for maxDist in [1, 3]: $maxDist")
    val banded = incoming
      .select(col("media_id").as("in_id"), col("ts"),
        col("hash_hi"), col("hash_lo"),
        posexplode(array((0 until 4).map(j =>
          band16(col("hash_hi"), col("hash_lo"), j)): _*)))
      .select(col("in_id"), col("ts"), col("hash_hi"), col("hash_lo"),
        col("pos").as("bj"), col("col").as("bv"))
    val dist =
      bit_count(col("hash_hi").bitwiseXOR(col("h_hi"))).cast("long") +
        bit_count(col("hash_lo").bitwiseXOR(col("h_lo"))).cast("long")
    banded.join(index, Seq("bj", "bv"))
      .filter(dist <= maxDist)
      .select(col("in_id"), col("hist_id"), col("ts"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("in_id", "hist_id")
  }

  /** Flag stream: (in_id, hist_id, ts) per band collision, deduplicated
    * within the watermark horizon. `incoming` needs (tsCol, idCol,
    * textCol). The (shingleN, k, bands) triple MUST match the index's —
    * a mismatch joins disjoint bucket spaces and silently flags nothing,
    * which is why the parameters are validated here too. Docs shorter
    * than `shingleN` tokens (and null-text docs) produce all-null
    * buckets; those rows are filtered out before the join. NOTE this is
    * not redundant belt-and-braces: Spark's array equality treats null
    * elements as EQUAL, so two all-null buckets would equi-join — the
    * invariant that the index side contains no null buckets holds today
    * only because [[bandIndex]] builds from minhashSignatures (which
    * drops short docs), and the filter keeps the gate correct even if an
    * index is ever built from the fused per-row expression instead.
    */
  def flagStream(incoming: DataFrame, index: DataFrame, textCol: String,
                 idCol: String, watermark: String, shingleN: Int = 3,
                 k: Int = 32, bands: Int = 8,
                 tsCol: String = "ts"): DataFrame = {
    require(bands >= 1 && k % bands == 0,
      s"k must divide evenly into bands: k=$k, bands=$bands")
    val rows = k / bands
    incoming
      // fused per-row signature (one compiled pass over the shingles) —
      // value-identical to the Column composition AND to the relational
      // index pipeline (MinhashSignatureParitySpec + the bucket-parity
      // test below), so stream and index buckets can never diverge
      .withColumn("__sig",
        graft.plans.MinhashSignature(col(textCol), shingleN, k))
      .select(col(idCol).as("in_id"), col(tsCol).as("ts"),
        posexplode(array((0 until bands).map(b =>
          slice(col("__sig"), b * rows + 1, rows)): _*)))
      .select(col("in_id"), col("ts"), col("pos").as("band"),
        col("col").as("bucket"))
      // short/null docs emit all-null buckets; drop them HERE — array
      // equality treats null elements as equal, so they would otherwise
      // match an all-null index bucket (see scaladoc)
      .filter(element_at(col("bucket"), 1).isNotNull)
      .join(index, Seq("band", "bucket"))
      .select(col("in_id"), col("hist_id"), col("ts"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("in_id", "hist_id")
  }
}
