package graft

import java.nio.file.Files
import graft.streaming.{StreamIngestGate, StreamSessions}
import org.apache.spark.sql.functions._

class StreamIngestGateSpec extends SparkSpec {
  import spark.implicits._

  test("stream gate flags a near-dup arrival once; fresh docs pass") {
    val history = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "completely unrelated historical content sits right here"))
      .toDF("id", "text")
    val index = StreamIngestGate.bandIndex(history, "text", "id",
      shingleN = 3, k = 16, bands = 4)

    val dir = Files.createTempDirectory("graft_sgate").toString
    val incoming = Seq(
      // twin of hist 10, arrives TWICE -> must flag once
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 100L,
        "the quick brown fox jumps over the lazy dog today"),
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 100L,
        "the quick brown fox jumps over the lazy dog today"),
      // fresh doc -> no flag
      (java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 101L,
        "fresh novel text that matches nothing in the archive"),
      // shorter than one shingle -> no flag, no error
      (java.sql.Timestamp.valueOf("2024-01-01 10:03:00"), 102L, "tiny doc"))
      .toDF("ts", "id", "text")
    incoming.write.mode("overwrite").parquet(dir)

    val stream = StreamSessions.readParquetStream(spark, dir, incoming.schema)
    val flagged = StreamIngestGate.flagStream(stream, index, "text", "id",
      watermark = "1 hour", shingleN = 3, k = 16, bands = 4)
    val q = StreamSessions.runAvailableNow(flagged, "graft_gate")
    try {
      val got = spark.table("graft_gate").collect()
        .map(r => (r.getAs[Long]("in_id"), r.getAs[Long]("hist_id")))
      assert(got.toSeq === Seq((100L, 10L)))
    } finally q.stop()
  }

  test("stream buckets equal the batch index buckets (form parity)") {
    // The gate only works if the per-row Column signature and the
    // relational signature pipeline agree bucket-for-bucket: band the
    // SAME docs both ways and compare the full (id, band, bucket) sets.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("id", "text")
    val viaIndex = StreamIngestGate.bandIndex(docs, "text", "id",
      shingleN = 3, k = 16, bands = 4)
      .select(col("hist_id").as("id"), col("band"), col("bucket"))
    val rows = 4
    val viaColumn = docs
      .withColumn("__sig",
        graft.operators.Dedup.minhashSignature(col("text"), 3, 16))
      .select(col("id"), posexplode(array((0 until 4).map(b =>
        slice(col("__sig"), b * rows + 1, rows)): _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    assert(viaIndex.exceptAll(viaColumn).count() === 0L)
    assert(viaColumn.exceptAll(viaIndex).count() === 0L)
  }

  test("image gate: identical-hash history collapses to one rep; " +
    "near and exact arrivals flag, distant ones pass") {
    // history: ids 10/12 share a hash (rep 10), id 14 distinct
    val hist = Seq((10L, 0L, 0L), (12L, 0L, 0L), (14L, 1L << 40, 255L))
      .toDF("media_id", "hash_hi", "hash_lo")
    val index = StreamIngestGate.imageHashIndex(hist)
    // the collapsed index carries ONE rep for the shared hash
    assert(index.select("hist_id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(10L, 14L))
    val dir = StreamSessions.stageFrameAsDir("spec-imgate") {
      Seq(
        (100L, 0L, 1L),          // d=1 from rep 10 -> flag
        (101L, 1L << 40, 255L),  // exact dup of 14 -> flag
        (102L, -1L, -1L))        // far from both -> pass
        .toDF("media_id", "hash_hi", "hash_lo")
        .select(col("media_id"),
          org.apache.spark.sql.functions.timestamp_seconds(
            col("media_id")).as("ts"),
          col("hash_hi"), col("hash_lo"))
    }
    val raw = StreamSessions.readParquetStream(spark, dir,
      spark.read.parquet(dir).schema)
    val got = StreamSessions.runToCompletionAppend(
      StreamIngestGate.imageFlagStream(raw, index, "1 hour"),
      "spec_imgate")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 10L), (101L, 14L)))
  }
}
