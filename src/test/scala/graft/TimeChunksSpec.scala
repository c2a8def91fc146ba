package graft

import graft.streaming.StreamSessions
import org.apache.spark.sql.functions._

/** [[StreamSessions.timeChunks]] — the staging step behind the q110/q151
  * bounded-state replay: chunks must partition the input exactly (no
  * row lost or duplicated), be time-ordered and time-aligned, and the
  * chunk count must adapt to input size unless pinned by conf.
  */
class TimeChunksSpec extends SparkSpec {
  import spark.implicits._

  override def withFixture(test: NoArgTest) = {
    try super.withFixture(test)
    finally {
      spark.conf.unset("spark.graft.streamChunks")
      CacheScope.releaseAll()
    }
  }

  private def frame(n: Int) =
    spark.range(0, n).select(col("id"),
      timestamp_seconds(col("id") * 60).as("ts"))

  test("chunks partition the input: union == input, chunks time-disjoint") {
    spark.conf.set("spark.graft.streamChunks", "7")
    val chunks = StreamSessions.timeChunks(frame(1000), "ts", 16)
    assert(chunks.size == 7)
    val total = chunks.map(_.count()).sum
    assert(total == 1000L)
    val union = chunks.reduce(_ unionByName _)
      .select("id").as[Long].collect().sorted
    assert(union.toSeq == (0L until 1000L))
    // time-ordered: each chunk's max ts < next chunk's min ts
    val bounds = chunks.map(c => c.agg(
      min(col("ts").cast("long")), max(col("ts").cast("long"))).head())
      .filter(!_.isNullAt(0)).map(r => (r.getLong(0), r.getLong(1)))
    bounds.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ =>
    }
  }

  test("adaptive count: small inputs get 2 chunks, conf pins override") {
    val small = StreamSessions.timeChunks(frame(500), "ts", 16)
    assert(small.size == 2) // floor: one real mid-run watermark advance
    CacheScope.releaseAll()
    spark.conf.set("spark.graft.streamChunks", "16")
    val pinned = StreamSessions.timeChunks(frame(500), "ts", 16)
    assert(pinned.size == 16)
  }

  test("empty input yields one (empty) chunk, no NPE on the agg") {
    val chunks = StreamSessions.timeChunks(
      frame(10).filter(col("id") < -1), "ts", 16)
    assert(chunks.size == 1)
    assert(chunks.head.count() == 0L)
  }
}
