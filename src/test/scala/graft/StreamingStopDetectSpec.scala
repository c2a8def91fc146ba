package graft

import graft.operators.StopDetect
import graft.streaming.StreamingStopDetect
import graft.streaming.StreamingStopDetect.Ping
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingStopDetectSpec extends SparkSpec {
  import spark.implicits._

  private val p = StopDetect.Params(50.0, 2L, 600L, 3600L, "haversine")

  // one user: dwell (3 pings), jump, second dwell (2 pings), far tail.
  // The tail ping stays pending in streaming (no successor yet).
  private val batch1 = Seq(
    Ping("u", 19.0000, -99.0, 0L),
    Ping("u", 19.0001, -99.0, 400L),
    Ping("u", 19.0002, -99.0, 800L))
  private val batch2 = Seq(
    Ping("u", 19.0100, -99.0, 1200L), // breaks run 1
    Ping("u", 19.0101, -99.0, 1600L),
    Ping("u", 19.0102, -99.0, 2400L), // run 2 (too short -> -1)
    Ping("u", 19.1000, -99.0, 2500L)) // breaks run 2; pending tail

  test("streaming output matches batch for all classified pings") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ping]
    val q = StreamingStopDetect.stopEvents(mem.toDS(), p)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sstops").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("sstops")
        .orderBy("timestamp")
        .collect().map(r => (r.getAs[Long]("stop_events"),
          r.getAs[Long]("timestamp")))

      val batchAll = StopDetect.stopEvents(
        (batch1 ++ batch2).toDF("uid", "latitude", "longitude", "timestamp"),
        p)
        .orderBy("timestamp")
        .collect().map(r => (r.getAs[Long]("stop_events"),
          r.getAs[Long]("timestamp")))

      // pending = the user's latest ping
      assert(streamed.toSeq === batchAll.toSeq.dropRight(1))
    } finally q.stop()
  }
}
