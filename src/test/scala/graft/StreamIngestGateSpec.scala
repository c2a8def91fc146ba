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
}
