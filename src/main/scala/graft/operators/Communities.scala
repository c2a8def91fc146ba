package graft.operators

import org.apache.spark.sql.DataFrame

/** Community-based stop-location clustering — the engine's stand-in for
  * the reference's Infomap mode (compute_infomap,
  * src/polaroam/models.py:179-204; graph construction
  * src/polaroam/utils.py:32-134: BallTree radius query M1 + Infomap
  * two-level partition M2, edge weight = max(count_i, count_j) * d^(-q)).
  *
  * True Infomap minimizes the map equation with a C++ library and is not
  * bit-reproducible without it (SURVEY §7 trap 7); the reference's own
  * production scripts use the DBSCAN path. We ship synchronous weighted
  * label propagation on the same radius graph: deterministic (max-weight
  * neighbor label, ties to the smaller label; fixed iteration cap),
  * per-user inside the same flatMapGroups kernel shape as DBSCAN. The
  * semantic divergence from Infomap's objective is documented, not hidden.
  */
object Communities {

  final case class Params(
      r2: Double = 20.0,
      weightExponent: Double = 1.0,
      maxIterations: Int = 20,
      metric: String = "haversine",
      labelSingletons: Boolean = false)

  /** medians(uid, stop_events, latitude, longitude, ...) ->
    * + stop_locations: community id per stop (first-appearance
    * canonicalized, -1 for unlabeled singletons).
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
        val labels = labelGroup(rows, p)
        rows.iterator.zipWithIndex.map { case (r, k) =>
          StopClusters.LabeledRow(r.uid, r.stop_events, r.latitude,
            r.longitude, r.start_timestamp, r.end_timestamp, labels(k))
        }
      }
      .toDF()
  }

  private def labelGroup(rows: Array[StopClusters.MedianRow],
                         p: Params): Array[Long] = {
    val n = rows.length
    // radius graph with reference edge weights (utils.py:101-122):
    // count_i = stop visits collapse to 1 per median row here, so weight
    // reduces to d^(-q); zero-distance pairs get a large finite weight.
    val adj = Array.fill(n)(List.empty[(Int, Double)])
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = dist(p)(rows(i).latitude, rows(i).longitude,
          rows(j).latitude, rows(j).longitude)
        if (d <= p.r2) {
          val w = if (d <= 1e-9) 1e18
            else math.pow(d, -p.weightExponent)
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
