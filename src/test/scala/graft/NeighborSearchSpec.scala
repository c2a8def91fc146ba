package graft

import graft.operators.{NeighborSearch, StopClusters}

class NeighborSearchSpec extends SparkSpec {

  private def haversine(aLat: Double, aLon: Double,
                        bLat: Double, bLon: Double): Double = {
    val la1 = math.toRadians(aLat); val la2 = math.toRadians(bLat)
    val dLat = la2 - la1
    val dLon = math.toRadians(bLon) - math.toRadians(aLon)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(la1) * math.cos(la2) * math.pow(math.sin(dLon / 2), 2)
    2 * 6371000.0 * math.asin(math.sqrt(a))
  }

  private def brutePairs(lat: Array[Double], lon: Array[Double],
                         eps: Double,
                         d: (Double, Double, Double, Double) => Double) = {
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    for (i <- lat.indices; j <- (i + 1) until lat.length)
      if (d(lat(i), lon(i), lat(j), lon(j)) <= eps) out += ((i, j))
    out
  }

  private def gridPairs(lat: Array[Double], lon: Array[Double],
                        eps: Double, metric: String,
                        d: (Double, Double, Double, Double) => Double) = {
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    var dupes = 0
    NeighborSearch.pairs(lat, lon, eps, metric, d, (i, j, dd) => {
      assert(i < j); assert(dd <= eps)
      if (!out.add((i, j))) dupes += 1
    })
    assert(dupes === 0, "a pair was visited twice")
    out
  }

  test("grid emits exactly the brute-force pair set (haversine, mid-lat)") {
    // n = 400 > GridThreshold, clustered points at Mexico City latitude
    for (seed <- Seq(3, 17)) {
      val rnd = new scala.util.Random(seed)
      val n = 400
      val lat = new Array[Double](n); val lon = new Array[Double](n)
      for (k <- 0 until n) {
        val cLat = 19.4 + (rnd.nextInt(8) - 4) * 0.002
        val cLon = -99.1 + (rnd.nextInt(8) - 4) * 0.002
        lat(k) = cLat + rnd.nextGaussian() * 3e-4
        lon(k) = cLon + rnd.nextGaussian() * 3e-4
      }
      val eps = 60.0
      val brute = brutePairs(lat, lon, eps, haversine)
      val grid = gridPairs(lat, lon, eps, "haversine", haversine)
      assert(grid === brute, s"seed $seed: pair sets differ")
      assert(brute.nonEmpty)
    }
  }

  test("grid is exact in the sparse regime (city-wide scatter)") {
    // 4000 points over ~50 km x 50 km, eps 100 m: most buckets hold one
    // point and every surviving pair spans cells — the regime the whale
    // guard exists for (measured 0.13 s grid vs 22 s brute at 15k nodes)
    val rnd = new scala.util.Random(9)
    val n = 4000
    val lat = Array.fill(n)(19.2 + rnd.nextDouble() * 0.5)
    val lon = Array.fill(n)(-99.4 + rnd.nextDouble() * 0.5)
    val brute = brutePairs(lat, lon, 100.0, haversine)
    assert(gridPairs(lat, lon, 100.0, "haversine", haversine) === brute)
    assert(brute.nonEmpty)
  }

  test("grid is exact at high latitude (lon cells widen with 1/cos)") {
    val rnd = new scala.util.Random(11)
    val n = 300
    val lat = Array.fill(n)(67.5 + rnd.nextGaussian() * 5e-4)
    val lon = Array.fill(n)(23.0 + rnd.nextGaussian() * 1.5e-3)
    val eps = 75.0
    val brute = brutePairs(lat, lon, eps, haversine)
    assert(gridPairs(lat, lon, eps, "haversine", haversine) === brute)
    assert(brute.nonEmpty)
  }

  test("grid is exact for euclidean metric and duplicate coordinates") {
    def eu(a: Double, b: Double, c: Double, d: Double) =
      math.sqrt((c - a) * (c - a) + (d - b) * (d - b))
    val rnd = new scala.util.Random(5)
    val n = 350
    val lat = new Array[Double](n); val lon = new Array[Double](n)
    for (k <- 0 until n) {
      if (k % 7 == 0 && k > 0) { lat(k) = lat(k - 1); lon(k) = lon(k - 1) }
      else { lat(k) = rnd.nextDouble() * 20; lon(k) = rnd.nextDouble() * 20 }
    }
    val brute = brutePairs(lat, lon, 1.2, eu)
    assert(gridPairs(lat, lon, 1.2, "euclidean", eu) === brute)
    assert(brute.nonEmpty)
  }

  test("pairs at exactly eps survive the grid (cell-boundary fuzz)") {
    // pairs engineered to sit AT the comparison boundary: point pairs
    // separated by deltas straddling cell edges, eps chosen as the exact
    // computed distance of a sampled pair — the 1e-9 cell margin must
    // keep every d <= eps pair inside the 3x3 probe neighborhood
    val rnd = new scala.util.Random(31)
    val n = 260
    val lat = new Array[Double](n); val lon = new Array[Double](n)
    for (k <- 0 until n) {
      lat(k) = 19.4 + (k % 16) * 9.04e-4 + rnd.nextGaussian() * 1e-7
      lon(k) = -99.1 + (k / 16) * 9.04e-4 + rnd.nextGaussian() * 1e-7
    }
    // eps = an actual inter-point distance (one grid step) => many pairs
    // at d == eps exactly
    val eps = haversine(lat(0), lon(0), lat(1), lon(1))
    val brute = brutePairs(lat, lon, eps, haversine)
    assert(gridPairs(lat, lon, eps, "haversine", haversine) === brute)
    assert(brute.nonEmpty)
  }

  test("pole and antimeridian groups fall back to the exact brute path") {
    // near-pole: lon bound vacuous; seam: raw-lon delta ~360 for a close
    // pair. Both must still yield the exact pair set.
    val latP = Array.fill(200)(89.9999)
    val lonP = Array.tabulate(200)(k => k * 1.8 - 180.0)
    assert(gridPairs(latP, lonP, 50.0, "haversine", haversine) ===
      brutePairs(latP, lonP, 50.0, haversine))
    val latS = Array.fill(200)(10.0)
    val lonS = Array.tabulate(200)(k =>
      if (k % 2 == 0) 179.9995 else -179.9995)
    val bruteS = brutePairs(latS, lonS, 200.0, haversine)
    assert(bruteS.nonEmpty, "seam pairs must be within eps")
    assert(gridPairs(latS, lonS, 200.0, "haversine", haversine) === bruteS)
  }

  test("DBSCAN and community labels are identical across the grid threshold") {
    // same geometry run as one whale group (grid path) and re-labeled by
    // the brute path via many small shifted copies is hard to compare —
    // instead: labels from the full pipeline must equal a brute-force
    // reference DBSCAN computed in-test.
    val rnd = new scala.util.Random(23)
    val n = 320
    val pts = Array.tabulate(n) { k =>
      val cx = (k % 5) * 0.01 // 5 bands ~1.1 km apart
      (19.4 + cx + rnd.nextGaussian() * 2e-5,
        -99.1 + rnd.nextGaussian() * 2e-5)
    }
    val eps = 25.0
    // brute reference: connected components of core points (minPts=2)
    val adj = Array.fill(n)(List.empty[Int])
    for (i <- 0 until n; j <- (i + 1) until n)
      if (haversine(pts(i)._1, pts(i)._2, pts(j)._1, pts(j)._2) <= eps) {
        adj(i) ::= j; adj(j) ::= i
      }
    val comp = Array.fill(n)(-1)
    var c = 0
    for (s <- 0 until n) if (comp(s) < 0 && adj(s).nonEmpty) {
      val stack = scala.collection.mutable.Stack(s)
      while (stack.nonEmpty) {
        val v = stack.pop()
        if (comp(v) < 0) { comp(v) = c; adj(v).foreach(stack.push(_)) }
      }
      c += 1
    }
    import spark.implicits._
    val df = pts.zipWithIndex.map { case ((la, lo), k) =>
      ("u", k.toLong, la, lo, 0L, 100L)
    }.toSeq.toDF("uid", "stop_events", "latitude", "longitude",
      "start_timestamp", "end_timestamp")
    val got = StopClusters.cluster(df,
      StopClusters.Params(eps, 2, "haversine", 0.0))
      .orderBy("stop_events")
      .collect().map(_.getAs[Long]("stop_locations"))
    // same partition up to relabeling, same noise set
    assert(got.length === n)
    val mapping = scala.collection.mutable.Map.empty[Long, Int]
    for (k <- 0 until n) {
      if (comp(k) < 0) assert(got(k) === -1L, s"row $k must be noise")
      else {
        assert(got(k) >= 0L, s"row $k must be clustered")
        mapping.get(got(k)) match {
          case Some(m) => assert(m === comp(k), s"row $k split/merged")
          case None =>
            assert(!mapping.valuesIterator.contains(comp(k)),
              s"row $k merged two reference components")
            mapping(got(k)) = comp(k)
        }
      }
    }
  }
}
