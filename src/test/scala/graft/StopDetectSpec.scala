package graft

import graft.operators.StopDetect
import org.apache.spark.sql.Row

class StopDetectSpec extends SparkSpec {
  import spark.implicits._

  // r_C=50m, minSize=2, minStay=600s, maxStay=3600s
  private val p = StopDetect.Params(50.0, 2L, 600L, 3600L, "haversine")

  private def run(rows: Seq[(String, Double, Double, Long)]) =
    StopDetect.stopEvents(
      rows.toDF("uid", "latitude", "longitude", "timestamp"), p)
      .orderBy("uid", "timestamp")
      .select("uid", "stop_events", "timestamp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("dwell then move: one stop event, tail is -1") {
    // 3 pings ~11m apart in a dwell, then a 1km jump
    val got = run(Seq(
      ("u", 19.0000, -99.0, 0L),
      ("u", 19.0001, -99.0, 400L),
      ("u", 19.0002, -99.0, 800L),
      ("u", 19.0100, -99.0, 1200L)))
    // last dwell row's lead distance is the jump => not stationary;
    // event rows are the first two; total_time = 400+400 >= 600, size 2
    assert(got.map(_._2).toSeq === Seq(1L, 1L, -1L, -1L))
  }

  test("short dwell below minStayingTime is invalidated to -1") {
    val got = run(Seq(
      ("u", 19.0000, -99.0, 0L),
      ("u", 19.0001, -99.0, 100L), // total_time 100+100 < 600
      ("u", 19.0100, -99.0, 200L)))
    assert(got.map(_._2).toSeq === Seq(-1L, -1L, -1L))
  }

  test("time gap above maxStayingTime splits events") {
    // stationarity is forward-looking (reference utils.py:354-359): the row
    // BEFORE the 4300s gap sees time_diff > maxStayingTime and drops out,
    // leaving event 1 with a single row => invalidated by minSize.
    val got = run(Seq(
      ("u", 19.0000, -99.0, 0L),
      ("u", 19.0001, -99.0, 700L),
      ("u", 19.0000, -99.0, 5000L),  // gap 4300 > 3600 breaks
      ("u", 19.0001, -99.0, 5700L),
      ("u", 19.0000, -99.0, 6400L)))
    val ids = got.map(_._2).toSeq
    assert(ids === Seq(-1L, -1L, 2L, 2L, -1L))
  }

  test("single-ping user is -1 and users are independent") {
    val got = run(Seq(
      ("a", 19.0, -99.0, 0L),
      ("b", 19.0000, -99.0, 0L),
      ("b", 19.0001, -99.0, 400L),
      ("b", 19.0002, -99.0, 800L),
      ("b", 19.0100, -99.0, 1200L)))
    assert(got.filter(_._1 == "a").map(_._2).toSeq === Seq(-1L))
    assert(got.filter(_._1 == "b").map(_._2).toSeq ===
      Seq(1L, 1L, -1L, -1L))
  }

  test("eventMedians: exact median and span") {
    val se = StopDetect.stopEvents(Seq(
      ("u", 19.0000, -99.0, 0L),
      ("u", 19.0002, -99.0, 400L),
      ("u", 19.0001, -99.0, 800L),
      ("u", 19.0100, -99.0, 1200L))
      .toDF("uid", "latitude", "longitude", "timestamp"), p)
    // stationary rows are t=0 and t=400 only (t=800's lead is the jump)
    val m = StopDetect.eventMedians(se).collect()
    assert(m.length === 1)
    val r = m.head
    assert(r.getAs[Double]("latitude") === 19.0001)
    assert(r.getAs[Long]("start_timestamp") === 0L)
    assert(r.getAs[Long]("end_timestamp") === 400L)
  }
}

class EuclideanMetricSpec extends SparkSpec {
  import spark.implicits._

  test("euclidean metric: degrees-space radius") {
    // two points 0.003 deg apart: euclidean r_C=0.005 keeps the first
    // stationary (forward-looking), the 0.1 deg jump breaks the run;
    // minSize=1 so the single-row event survives
    val p = graft.operators.StopDetect.Params(
      rC = 0.005, minSize = 1L, minStayingTime = 100L,
      maxStayingTime = 3600L, metric = "euclidean")
    val got = graft.operators.StopDetect.stopEvents(Seq(
      ("u", 19.000, -99.0, 0L),
      ("u", 19.003, -99.0, 200L),
      ("u", 19.103, -99.0, 400L))
      .toDF("uid", "latitude", "longitude", "timestamp"), p)
      .orderBy("timestamp").collect()
      .map(_.getAs[Long]("stop_events"))
    assert(got.toSeq === Seq(1L, -1L, -1L))
  }
}
