package graft

import graft.operators.{Communities, Geometry, Indexing}
import org.apache.spark.sql.functions._

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  private def medians(rows: (String, Long, Double, Double)*) =
    rows.toSeq.map { case (u, e, la, lo) => (u, e, la, lo, 0L, 100L) }
      .toDF("uid", "stop_events", "latitude", "longitude",
        "start_timestamp", "end_timestamp")

  test("nearby stops share a community; singleton is -1") {
    val got = Communities.assignLocations(medians(
      ("u", 1L, 19.0000, -99.0),
      ("u", 2L, 19.0005, -99.0),
      ("u", 3L, 19.5000, -99.0)),
      Communities.Params(r2 = 100.0))
      .orderBy("stop_events")
      .select("stop_events", "stop_locations")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got(0)._2 === got(1)._2)
    assert(got(0)._2 === 0L)
    assert(got(2)._2 === -1L)
  }

  test("labelSingletons keeps isolated stops as own communities") {
    val got = Communities.assignLocations(medians(
      ("u", 1L, 19.0, -99.0),
      ("u", 2L, 19.5, -99.0)),
      Communities.Params(r2 = 100.0, labelSingletons = true))
      .orderBy("stop_events")
      .select("stop_locations")
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L, 1L))
  }
}

class IndexingSpec extends SparkSpec {
  import spark.implicits._

  test("global row index follows total sort order without a global sort") {
    val df = Seq(30L, 10L, 20L, 50L, 40L).toDF("k").repartition(3)
    val got = Indexing.globalRowIndex(df, "idx", col("k"))
      .orderBy("idx")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((10L, 0L), (20L, 1L), (30L, 2L),
      (40L, 3L), (50L, 4L)))
  }
}

class GeometrySpec extends SparkSpec {
  import spark.implicits._

  test("hull of a square is its 4 corners; max distance is the diagonal") {
    val pts = Seq(
      ("u", 0L, 0.0, 0.0), ("u", 0L, 0.0, 0.001),
      ("u", 0L, 0.001, 0.0), ("u", 0L, 0.001, 0.001),
      ("u", 0L, 0.0005, 0.0005)) // interior point
      .toDF("uid", "stop_locations", "latitude", "longitude")
    val got = Geometry.clusterHulls(pts).collect().head
    assert(got.getAs[Seq[Double]]("hull_lats").length === 4)
    // ~157m diagonal at the equator
    val d = got.getAs[Double]("max_pair_dist")
    assert(d > 156 && d < 158)
  }

  test("degenerate inputs: single point and collinear points") {
    val pts = Seq(
      ("u", 0L, 1.0, 1.0),
      ("v", 0L, 0.0, 0.0), ("v", 0L, 0.0, 0.001), ("v", 0L, 0.0, 0.002))
      .toDF("uid", "stop_locations", "latitude", "longitude")
    val got = Geometry.clusterHulls(pts).collect()
      .map(r => r.getAs[String]("uid") ->
        r.getAs[Seq[Double]]("hull_lats").length).toMap
    assert(got("u") === 1)
    assert(got("v") === 2) // collinear -> bounding segment
  }
}
