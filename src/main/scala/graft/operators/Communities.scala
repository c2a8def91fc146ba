package graft.operators

import org.apache.spark.sql.DataFrame

/** Community-based stop-location clustering — the engine's stand-in for
  * the reference's Infomap mode (compute_infomap,
  * src/polaroam/models.py:179-204; graph construction
  * src/polaroam/utils.py:32-134).
  *
  * Fidelity points carried over exactly:
  *  - the downsample collapse (models.py:60-87): stops are snapped to a
  *    grid of `minSpacialResolution` (0 = no snap) and collapsed to one
  *    NODE per unique (uid, lat, lon), carrying `count` = stops collapsed;
  *  - edge weight = max(count_i, count_j) * d^(-q) in weighted mode, and
  *    just max(count_i, count_j) unweighted (add_edges, utils.py:101-122);
  *  - self-links are excluded, so a unique coordinate with NO distinct
  *    neighbor inside r2 is a singleton and labels -1 even if many stops
  *    collapsed onto it (query_radius returns the node itself; add_edges
  *    iterates neighbors > node only);
  *  - node order is first appearance in stop_events order (the reference's
  *    group_by(maintain_order=True) over timestamp-sorted stops).
  *
  * True Infomap minimizes the map equation with a C++ library and is not
  * bit-reproducible without it (SURVEY §7 trap 7); the reference's own
  * production scripts use the DBSCAN path. We ship asynchronous weighted
  * label propagation on the same radius graph: deterministic (max-weight
  * neighbor label, ties to the smaller label; fixed iteration cap),
  * per-user inside the same flatMapGroups kernel shape as DBSCAN. The
  * semantic divergence from Infomap's objective is documented, not hidden.
  */
object Communities {

  final case class Params(
      r2: Double = 20.0,
      weighted: Boolean = true,
      weightExponent: Double = 1.0,
      minSpacialResolution: Double = 0.0,
      maxIterations: Int = 20,
      metric: String = "haversine",
      labelSingletons: Boolean = false,
      maxGroupSize: Int = 20000)

  /** medians(uid, stop_events, latitude, longitude, ...) ->
    * + stop_locations: community id per stop (first-appearance
    * canonicalized, -1 for unlabeled singletons). Stops collapsing onto
    * the same (snapped) coordinate share that node's label.
    */
  def assignLocations(medians: DataFrame, p: Params): DataFrame = {
    val spark = medians.sparkSession
    import spark.implicits._
    medians
      .select("uid", "stop_events", "latitude", "longitude",
        "start_timestamp", "end_timestamp")
      .as[StopClusters.MedianRow]
      .groupByKey(_.uid)
      .flatMapGroups { (_: String, it: Iterator[StopClusters.MedianRow]) =>
        val rows = it.toArray.sortBy(_.stop_events)
        val labels = labelStops(rows, p)
        rows.iterator.zipWithIndex.map { case (r, k) =>
          StopClusters.LabeledRow(r.uid, r.stop_events, r.latitude,
            r.longitude, r.start_timestamp, r.end_timestamp, labels(k))
        }
      }
      .toDF()
  }

  /** Collapse a user's stops to unique snapped coordinates (downsample),
    * label the unique-coordinate graph, and fan labels back to stops.
    * Returns one label per input row (input must be stop_events-sorted).
    */
  private[operators] def labelStops(rows: Array[StopClusters.MedianRow],
                                    p: Params): Array[Long] = {
    def snap(v: Double): Double =
      if (p.minSpacialResolution > 0)
        math.round(v / p.minSpacialResolution) * p.minSpacialResolution
      else v
    // first-appearance-ordered unique coords + per-coord stop counts
    val nodeOf = scala.collection.mutable.LinkedHashMap.empty[(Double, Double), Int]
    val rowNode = new Array[Int](rows.length)
    var i = 0
    while (i < rows.length) {
      val key = (snap(rows(i).latitude), snap(rows(i).longitude))
      rowNode(i) = nodeOf.getOrElseUpdate(key, nodeOf.size)
      i += 1
    }
    val allCoords = nodeOf.keysIterator.toArray
    val allCounts = new Array[Long](allCoords.length)
    i = 0
    while (i < rows.length) { allCounts(rowNode(i)) += 1L; i += 1 }
    // whale-user guard: the radius graph is O(nodes²); nodes beyond
    // maxGroupSize (first-appearance order) label -1 rather than pinning
    // a task for hours — the enforced form of the reference's
    // min_spacial_resolution mitigation
    val n = math.min(allCoords.length, p.maxGroupSize)
    if (n < allCoords.length)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"uid ${rows.head.uid}: ${allCoords.length} unique coords exceed " +
          s"maxGroupSize=${p.maxGroupSize}; labeling overflow as -1")
    val nodeLabels = labelGroup(allCoords.take(n), allCounts.take(n), p) ++
      Array.fill(allCoords.length - n)(-1L)
    Array.tabulate(rows.length)(k => nodeLabels(rowNode(k)))
  }

  private def labelGroup(coords: Array[(Double, Double)],
                         counts: Array[Long], p: Params): Array[Long] = {
    val n = coords.length
    // radius graph with reference edge weights (utils.py:101-122):
    // max(count_i, count_j) * d^(-q) weighted, max(count_i, count_j)
    // unweighted; zero-distance pairs get a large finite weight.
    val adj = Array.fill(n)(List.empty[(Int, Double)])
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = dist(p)(coords(i)._1, coords(i)._2,
          coords(j)._1, coords(j)._2)
        if (d <= p.r2) {
          val cMax = math.max(counts(i), counts(j)).toDouble
          val w =
            if (!p.weighted) cMax
            else if (d <= 1e-9) cMax * 1e18
            else cMax * math.pow(d, -p.weightExponent)
          adj(i) ::= (j, w); adj(j) ::= (i, w)
        }
        j += 1
      }
      i += 1
    }
    // asynchronous weighted label propagation in fixed index order:
    // deterministic AND convergent (synchronous updates oscillate on
    // 2-node components); ties go to the smallest label
    val label = Array.tabulate(n)(identity)
    var changed = true
    var iter = 0
    while (changed && iter < p.maxIterations) {
      changed = false
      i = 0
      while (i < n) {
        if (adj(i).nonEmpty) {
          val scores = scala.collection.mutable.Map.empty[Int, Double]
          adj(i).foreach { case (j, w) =>
            scores(label(j)) = scores.getOrElse(label(j), 0.0) + w
          }
          val next = scores.toSeq
            .maxBy { case (lbl, s) => (s, -lbl.toDouble) }._1
          if (next != label(i)) { label(i) = next; changed = true }
        }
        i += 1
      }
      iter += 1
    }
    // canonicalize: 0-based by first appearance; singletons -> -1 unless
    // labelSingletons (reference label_singletons flag, utils.py:124-134)
    val isolated = Array.tabulate(n)(k => adj(k).isEmpty)
    val labelOf = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      if (isolated(i) && !p.labelSingletons) out(i) = -1L
      else {
        if (!labelOf.contains(label(i)))
          labelOf(label(i)) = labelOf.size.toLong
        out(i) = labelOf(label(i))
      }
      i += 1
    }
    out
  }

  private def dist(p: Params)(aLat: Double, aLon: Double,
                              bLat: Double, bLon: Double): Double =
    p.metric match {
      case "euclidean" =>
        math.sqrt((bLat - aLat) * (bLat - aLat) + (bLon - aLon) * (bLon - aLon))
      case _ =>
        val la1 = math.toRadians(aLat); val la2 = math.toRadians(bLat)
        val dLat = la2 - la1
        val dLon = math.toRadians(bLon) - math.toRadians(aLon)
        val a = math.pow(math.sin(dLat / 2), 2) +
          math.cos(la1) * math.cos(la2) * math.pow(math.sin(dLon / 2), 2)
        2 * 6371000.0 * math.asin(math.sqrt(a))
    }
}
