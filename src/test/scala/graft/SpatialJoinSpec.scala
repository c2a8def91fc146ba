package graft

import graft.operators.SpatialJoin
import graft.plans.Haversine
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  test("planted pairs: cross-cell neighbors found, out-of-radius dropped") {
    // ~111 m per 0.001 deg lat at the equator band used here
    val pts = Seq(
      (1L, 19.0000, -99.0000),
      (2L, 19.0008, -99.0000), // ~88 m from 1: pair, straddles cells
      (3L, 19.0020, -99.0000), // ~133 m from 2, ~221 m from 1
      (4L, 40.0000, 10.0000)   // isolated
    ).toDF("id", "lat", "lon")
    val got = SpatialJoin.radiusPairs(pts, "id", "lat", "lon", 150.0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (2L, 3L)))
  }

  test("bucketed result equals brute force on random clouds") {
    val rnd = new scala.util.Random(31)
    val pts = Seq.tabulate(300)(i =>
      (i.toLong, 19.0 + rnd.nextDouble() * 0.01 - 0.005,
        -99.0 + rnd.nextDouble() * 0.01 - 0.005))
      .toDF("id", "lat", "lon")
    val got = SpatialJoin.radiusPairs(pts, "id", "lat", "lon", 120.0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = pts.select($"id".as("ia"), $"lat".as("la"), $"lon".as("lo"))
    val b = pts.select($"id".as("ib"), $"lat".as("lb"), $"lon".as("lb2"))
    val brute = a.join(b, $"ia" < $"ib")
      .filter(Haversine.distanceMeters($"la", $"lo", $"lb", $"lb2") <= 120.0)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("pairs straddling the antimeridian are found") {
    val pts = Seq(
      (1L, 0.0, 179.9995),  // ~111 m across the seam from 2
      (2L, 0.0, -179.9995),
      (3L, 0.0, 179.9980),  // ~167 m from 1 (same side), ~278 m from 2
      (4L, 0.0, 170.0)      // isolated
    ).toDF("id", "lat", "lon")
    val got = SpatialJoin.radiusPairs(pts, "id", "lat", "lon", 200.0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L)))
  }

  test("seam wrap matches brute force on a cloud spanning +/-180") {
    val rnd = new scala.util.Random(47)
    val pts = Seq.tabulate(300) { i =>
      val lon = 179.995 + rnd.nextDouble() * 0.01 // [179.995, 180.005)
      (i.toLong, 10.0 + rnd.nextDouble() * 0.01 - 0.005,
        if (lon >= 180.0) lon - 360.0 else lon)
    }.toDF("id", "lat", "lon")
    val got = SpatialJoin.radiusPairs(pts, "id", "lat", "lon", 120.0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = pts.select($"id".as("ia"), $"lat".as("la"), $"lon".as("lo"))
    val b = pts.select($"id".as("ib"), $"lat".as("lb"), $"lon".as("lb2"))
    val brute = a.join(b, $"ia" < $"ib")
      .filter(Haversine.distanceMeters($"la", $"lo", $"lb", $"lb2") <= 120.0)
      .select("ia", "ib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("plan is an equi-join on the cell key, not a cross join") {
    val pts = Seq((1L, 19.0, -99.0)).toDF("id", "lat", "lon")
    val plan = SpatialJoin.radiusPairs(pts, "id", "lat", "lon", 100.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"expected hash equi-join:\n$plan")
  }

  test("continent-scale radius fails loudly (seam wrap would double-count)") {
    // Above ~1,100 km at latAbsMax=85 the lon cell exceeds 120 deg: base
    // and wrapped neighborhoods overlap and seam pairs would be emitted
    // twice. The operator must refuse, not silently duplicate.
    val pts = Seq((1L, 0.0, 179.9), (2L, 0.0, -179.9)).toDF("id", "lat", "lon")
    val e = intercept[IllegalArgumentException] {
      SpatialJoin.radiusPairs(pts, "id", "lat", "lon", 2.0e6)
    }
    assert(e.getMessage.contains("double-count"))
    // just under the bound still works
    assert(SpatialJoin.radiusPairs(pts, "id", "lat", "lon", 5.0e4)
      .collect().length === 1)
  }

  test("grid POIs: diagonal adjacency merges, gaps separate, chains close") {
    // cellDeg = 0.001. Cluster A: three points in diagonally-adjacent
    // cells (0,0) (1,1) (2,2) — Chebyshev chain, ONE poi. Cluster B: a
    // point at (5,5) — two empty cells away, its own poi. u2 revisits
    // cluster A, so A counts 2 users, 4 stops.
    val pts = Seq(
      ("u1", 0.0005, 0.0005), ("u1", 0.0015, 0.0015),
      ("u1", 0.0025, 0.0025), ("u2", 0.0005, 0.0006),
      ("u2", 0.0055, 0.0055))
      .toDF("uid", "latitude", "longitude")
    val got = SpatialJoin.gridClusters(pts, "uid", "latitude", "longitude",
      0.001)
      .orderBy("n_stops")
      .collect().map(r => (r.getAs[Long]("n_stops"), r.getAs[Long]("n_users")))
    assert(got.toSeq === Seq((1L, 1L), (4L, 2L)))
  }

  test("grid POIs plan: equi-join probes, no cartesian/nested-loop") {
    val pts = Seq(("a", 0.0005, 0.0005), ("b", 0.0015, 0.0015))
      .toDF("uid", "latitude", "longitude")
    val plan = SpatialJoin.gridClusters(pts, "uid", "latitude",
      "longitude", 0.001).queryExecution.executedPlan.toString
    // the O(occupied cells) edge list depends on the neighbor probes
    // staying an equi-join on the packed key
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"cell-adjacency degenerated to an all-pairs join:\n$plan")
  }

  test("grid POIs: sub-packing-resolution cell size fails loudly") {
    val pts = Seq(("a", 0.0, 0.0)).toDF("uid", "latitude", "longitude")
    val e = intercept[IllegalArgumentException] {
      SpatialJoin.gridClusters(pts, "uid", "latitude", "longitude", 1e-8)
    }
    assert(e.getMessage.contains("2^30"))
  }

  test("grid POIs: negative coordinates pack and cluster correctly") {
    // straddling the origin: (-0.0005) floors to cell -1, (0.0005) to
    // cell 0 — adjacent, so the two points merge despite the sign flip
    val pts = Seq(("a", -0.0005, -0.0005), ("b", 0.0005, 0.0005))
      .toDF("uid", "latitude", "longitude")
    val got = SpatialJoin.gridClusters(pts, "uid", "latitude", "longitude",
      0.001).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_stops") === 2L)
    assert(got.head.getAs[Long]("n_users") === 2L)
  }
}
