package graft.operators

import graft.plans.Haversine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global (cross-user) spatial self-join: all point pairs within a
  * haversine radius, as a grid-bucketed EQUI-join — the scale form of
  * the per-user radius kernel (StopClusters). SURVEY §2.8 M1 names this
  * shape: "cross-user global variant = geohash-bucketed self-join".
  *
  * Shape: snap each point to a lat/lon grid cell at least one radius
  * wide, explode ONE side to its 3x3 cell neighborhood, hash-join on the
  * cell id, verify with the exact distance. Any pair within the radius
  * differs by at most one cell index per axis (cell width >= radius
  * extent), so the neighborhood join finds it; the exact filter removes
  * false candidates, and id_a < id_b keeps each pair once (the pair
  * meets exactly once per orientation — a point has ONE home cell, and
  * the partner's 9 exploded cells are distinct).
  *
  * Cost: one shuffle of 10 rows per point (1 + 9 neighborhood copies)
  * on the cell key, candidates bounded by local density x 9 cells — vs
  * the O(n^2) cross join. Density skew (a city-center cell) maps to the
  * usual skew levers: AQE skew-join or Salting on the cell key.
  *
  * `latAbsMax` bounds |latitude| for the DATASET (default 85 deg): the
  * longitude cell width is fixed from it (cos shrinks degree width
  * toward the poles), so cells near the equator are wider than strictly
  * needed — more candidates, never a missed pair. Poles (|lat| >
  * latAbsMax) are out of contract.
  *
  * The +/-180 seam IS in contract: points within two cells of the
  * antimeridian additionally explode the neighborhood of their
  * 360-degree-shifted longitude, so a pair straddling the seam meets in
  * the partner's wrapped cell set (disjoint from the base set — no
  * double-count) and the exact haversine filter, periodic in delta-lon,
  * keeps it.
  */
object SpatialJoin {

  private val MetersPerDegLatMin = 110574.0

  /** All (id_a, id_b, dist_m) pairs with dist <= radiusM, id_a < id_b.
    * The id column must be orderable; dist_m is rounded to 3 decimals
    * (millimeters) for cross-engine comparability.
    */
  def radiusPairs(pts: DataFrame, idCol: String, latCol: String,
                  lonCol: String, radiusM: Double,
                  latAbsMax: Double = 85.0): DataFrame = {
    require(radiusM > 0, s"radius must be positive: $radiusM")
    val latCell = radiusM / MetersPerDegLatMin
    val lonCell = radiusM /
      (MetersPerDegLatMin * math.cos(math.toRadians(latAbsMax)))
    // The seam wrap's no-double-count argument needs the base and wrapped
    // cell-index sets disjoint: indices sit ~360/lonCell apart, so once a
    // cell spans more than ~a third of the globe (radius above ~1,100 km
    // at the default latAbsMax) the neighborhoods overlap and
    // seam-adjacent pairs would silently be emitted twice. Fail loudly —
    // continent-scale radii don't want a grid join anyway.
    require(360.0 / lonCell > 3.0,
      f"radiusM=$radiusM%.0f makes lon cells $lonCell%.1f deg wide at " +
        f"latAbsMax=$latAbsMax%.1f — the antimeridian wrap would " +
        "double-count pairs; use a smaller radius (or a cross join at " +
        "this scale)")
    def cellOf(lat: Column, lon: Column, dy: Int, dx: Int): Column =
      concat_ws(":",
        (floor(lat / latCell) + dy).cast("long"),
        (floor(lon / lonCell) + dx).cast("long"))

    val a = pts.select(col(idCol).as("id_a"), col(latCol).as("lat_a"),
      col(lonCol).as("lon_a"),
      cellOf(col(latCol), col(lonCol), 0, 0).as("cell"))
    val nbrs = array((for (dy <- -1 to 1; dx <- -1 to 1)
      yield cellOf(col(latCol), col(lonCol), dy, dx)): _*)
    // Antimeridian wrap: a partner across the seam sits within one cell
    // of THIS point's longitude shifted by 360, so for seam-adjacent
    // points also explode the neighborhood of the shifted coordinate.
    // Base and wrapped cell indices are ~360/lonCell apart — disjoint
    // sets, so each pair still meets at most once per orientation.
    val wrappedLon = when(col(lonCol) >= lit(180.0 - 2 * lonCell),
        col(lonCol) - 360.0)
      .when(col(lonCol) <= lit(-180.0 + 2 * lonCell), col(lonCol) + 360.0)
    val nbrsWrap = array((for (dy <- -1 to 1; dx <- -1 to 1)
      yield cellOf(col(latCol), wrappedLon, dy, dx)): _*)
    val allNbrs = concat(nbrs,
      when(wrappedLon.isNotNull, nbrsWrap)
        .otherwise(array().cast("array<string>")))
    val b = pts.select(col(idCol).as("id_b"), col(latCol).as("lat_b"),
      col(lonCol).as("lon_b"), explode(allNbrs).as("cell"))
    a.join(b, "cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("__d", Haversine.distanceMeters(
        col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")))
      // filter on the UNROUNDED distance (an external SQL twin filters
      // the exact value; rounding first would flip boundary pairs),
      // round only the emitted column
      .filter(col("__d") <= radiusM)
      .select(col("id_a"), col("id_b"), round(col("__d"), 3).as("dist_m"))
  }

  /** Global (cross-user) POI clustering at corpus scale: occupied grid
    * cells of side `cellDeg` degrees are the vertices, Chebyshev-adjacent
    * occupied cells the edges, a POI is a connected component of the CELL
    * graph, and every point inherits its cell's component. Returns
    * (poi_id, n_stops, n_users) — the shared-place table the per-user
    * reference pipeline (models.py:206-237, per-uid only) cannot express.
    *
    * Scale shape: cell ids are pure integer arithmetic (floor-divide,
    * pack lat/lon indices into one long) — no FP metric, reproducible in
    * any engine; edges come from probing the 4 canonical neighbor offsets
    * with an equi-join against the occupied-cell set, so the edge list is
    * O(occupied cells) and the quadratic co-location blowup of a
    * point-pair eps graph ([[radiusPairs]] must hash-sample dense data
    * for exactly that reason) never appears. Components run on CELLS —
    * orders of magnitude fewer rows than points.
    *
    * Known limitation (shared with the relational oracle): lon cells are
    * indexed on raw degrees, so a POI physically straddling the +-180
    * antimeridian splits into two (the seam-adjacent cell indices differ
    * by ~360/cellDeg and the neighbor probes never connect them).
    * [[NeighborSearch]] brute-forces that regime; here a seam POI is
    * vanishingly rare and the split is benign (two entries, correct
    * totals) — documented rather than special-cased.
    */
  def gridClusters(pts: DataFrame, userCol: String, latCol: String,
                   lonCol: String, cellDeg: Double): DataFrame = {
    require(cellDeg > 0, s"cellDeg must be positive: $cellDeg")
    // |floor(±180/cellDeg)| must stay inside the 2^30 packing offset or
    // cell keys collide with a neighbor row's index space
    require(180.0 / cellDeg < (1L << 30) - 1,
      f"cellDeg=$cellDeg%g packs cell indices beyond 2^30 — use >= 1e-6 deg")
    val off = 1073741824L   // 2^30: keeps both packed indices positive
    val shift = 4294967296L // 2^32
    val key = (floor(col(latCol) / cellDeg).cast("long") + off) * shift +
      (floor(col(lonCol) / cellDeg).cast("long") + off)
    val withCell = pts.withColumn("cell", key)
    // The occupied-cell set is read by FOUR consumers (both sides of the
    // adjacency probe join, the CC node universe, and CC's isolated-node
    // anti-join), and `pts` is typically an expensive upstream (q84: the
    // whole stop-median pipeline). Without a persist each consumer
    // re-runs that upstream — measured ~1.5 s extra and 2x the variance
    // on q84 at sf0.1. The frame is tiny (one long per occupied cell),
    // so the persist is bounded by the grid occupancy, not the data.
    val cells = graft.CacheScope.track(
      withCell.select("cell").distinct().persist())
    // E, N, NE, NW: each undirected adjacency probed exactly once
    val probes = cells.select(col("cell").as("src"),
      explode(array(Seq(1L, shift, shift + 1L, shift - 1L)
        .map(o => col("cell") + o): _*)).as("dst"))
    val edges = probes.join(cells.select(col("cell").as("dst")), "dst")
    val comp = Graphs.connectedComponents(edges, "src", "dst",
      cells, "cell")
    withCell
      .join(comp.select(col("id").as("cell"),
        col("component").as("poi_id")), "cell")
      .groupBy("poi_id")
      .agg(count(lit(1)).as("n_stops"),
        countDistinct(col(userCol)).as("n_users"))
  }
}
