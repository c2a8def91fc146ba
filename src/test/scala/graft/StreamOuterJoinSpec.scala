package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamSessions

/** Stream-stream LEFT OUTER interval join (q151's operator).
  *
  * The null-emission timing is the whole semantic: unmatched left rows
  * only flush when the watermark proves no match can arrive, so a finite
  * replay needs trailing pusher files — and, crucially, the pusher
  * filter must stay OUT of the streaming frame (Catalyst pushes a
  * join-key filter below EventTimeWatermark, pruning the pushers at the
  * scan before they can advance the watermark). These tests pin both
  * the semantics and that regression.
  */
class StreamOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def vRows(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("user_id", "event_id", "tsec")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("tsec")).as("ts"))

  private def pRows(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("user_id", "purchase_id", "tsec")
      .select(col("user_id"), col("purchase_id"),
        timestamp_seconds(col("tsec")).as("pts"))

  private def run(key: String, views: Seq[(Long, Long, Long)],
                  purchases: Seq[(Long, Long, Long)],
                  filterInsideStream: Boolean = false)
  : Map[Long, Option[Long]] = {
    val vDir = StreamSessions.stageOrderedFrames(s"sojv:$key") {
      Seq(vRows(views),
        vRows(Seq((-1L, -1L, 500000L))), vRows(Seq((-1L, -1L, 900000L))))
    }
    val pDir = StreamSessions.stageOrderedFrames(s"sojp:$key") {
      Seq(pRows(purchases),
        pRows(Seq((-1L, -1L, 500000L))), pRows(Seq((-1L, -1L, 900000L))))
    }
    val v = StreamSessions.readParquetStreamThrottled(
      spark, vDir, spark.read.parquet(vDir).schema)
    val p = StreamSessions.readParquetStreamThrottled(
      spark, pDir, spark.read.parquet(pDir).schema)
    val joined0 = StreamSessions.intervalJoinLeftOuter(
      v, p, "user_id", "ts", "pts", "1 HOURS", "60 seconds")
    val joined =
      if (filterInsideStream) joined0.filter(col("user_id") =!= -1L)
      else joined0
    val out = StreamSessions.runToCompletionAppend(joined, s"soj_$key")
      .filter(col("user_id") =!= -1L)
      .collect()
    out.map(r => r.getLong(1) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
  }

  test("matched rows join within the backward window; unmatched flush null") {
    val got = run("base",
      views = Seq((1L, 10L, 1000L), (1L, 11L, 5000L), (2L, 12L, 3000L)),
      purchases = Seq((1L, 90L, 990L)))
    // view 10: purchase 990 within [1000-3600, 1000] -> match
    // view 11: 990 < 5000-3600 -> outside window -> null
    // view 12: other user -> null
    assert(got == Map(10L -> Some(90L), 11L -> None, 12L -> None))
  }

  test("the outer tail flushes even for the latest-timestamp left rows") {
    // the unmatched view is the GLOBAL max event time: without the
    // pusher files its null row would be withheld forever
    val got = run("tail",
      views = Seq((1L, 10L, 1000L), (2L, 20L, 99000L)),
      purchases = Seq((1L, 90L, 990L)))
    assert(got == Map(10L -> Some(90L), 20L -> None))
  }

  test("REGRESSION: a pusher filter inside the stream withholds the tail") {
    // the same fixture with the -1 filter INSIDE the streaming frame:
    // Catalyst pushes it below EventTimeWatermark, the pushers never
    // advance the watermark, and the tail null row is lost. This pins
    // the Spark behavior that forced the batch-side filter placement —
    // if a Spark upgrade changes it, this test will say so.
    val got = run("pushedflt",
      views = Seq((1L, 10L, 1000L), (2L, 20L, 99000L)),
      purchases = Seq((1L, 90L, 990L)),
      filterInsideStream = true)
    assert(got == Map(10L -> Some(90L)))
  }
}
