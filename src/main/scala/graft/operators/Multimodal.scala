package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed per-partition in batches.
  *
  * The Spark-side mechanics (schema, batch iteration, partition sizing,
  * output shape) are real and tested; the codec step is a clearly marked
  * STUB (no media libraries in this environment) producing deterministic
  * fake features so the pipeline shape is exercised end to end. Swap
  * [[decodeStub]] for a real decoder (e.g. javacv) without touching the
  * surrounding plan.
  */
object Multimodal {

  /** media(media_id, kind, payload binary, meta...) row. */
  final case class MediaItem(media_id: Long, kind: String,
                             payload: Array[Byte])

  /** Fixed-length feature vector + basic stats per item. */
  final case class MediaFeatures(media_id: Long, kind: String,
                                 n_bytes: Long, checksum: Long,
                                 features: Array[Float])

  /** STUB decode: byte histogram folded into `dim` buckets, L1-normalized.
    * Deterministic stand-in for image/audio decoding — replace with a real
    * codec for production.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    val total = math.max(1f, payload.length.toFloat)
    var j = 0
    while (j < dim) { acc(j) /= total; j += 1 }
    acc
  }

  /** Batch feature extraction over the binary column — mapPartitions so a
    * real decoder can amortize per-batch model/codec setup exactly like a
    * pandas-batch UDF would.
    */
  def extractFeatures(media: Dataset[MediaItem], dim: Int = 16)
  : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { m =>
        val feats = decodeStub(m.payload, dim)
        var ck = 0L
        var i = 0
        while (i < m.payload.length) { ck = ck * 31 + (m.payload(i) & 0xff); i += 1 }
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, ck, feats)
      }
    }
  }

  /** Frame sampling for chunked payloads (video stand-in): keep every
    * k-th fixed-size chunk as its own row.
    */
  def sampleChunks(media: Dataset[MediaItem], chunkBytes: Int,
                   everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(chunkBytes).zipWithIndex
        .filter(_._2 % everyK == 0)
        .map { case (chunk, idx) => (m.media_id, idx, chunk) }
    }.toDF("media_id", "chunk_idx", "chunk")
  }

  /** Construct a media dataset from any table, payload synthesized from a
    * string column — the ingest shape for environments without real media
    * files.
    */
  def fromStrings(df: DataFrame, idCol: String, strCol: String,
                  kind: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(strCol))
      .as[(Long, String)]
      .map { case (id, s) =>
        MediaItem(id, kind, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
  }
}
