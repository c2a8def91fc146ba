package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column builders (SURVEY §2.7 F1-F4).
  *
  * All are compositions of codegen'd built-ins — they stay inside
  * whole-stage codegen and never leave the JVM. Semantics follow the
  * reference's expression forms:
  * haversine: src/polaroam/utils.py:290-313 (R = 6371000 m);
  * euclidean: src/polaroam/utils.py:315-329;
  * grid snap: src/polaroam/models.py:64-65.
  */
object GeoFunctions {

  val EarthRadiusMeters: Double = 6371000.0

  /** Great-circle distance in meters between (lat1,lon1) and (lat2,lon2),
    * inputs in degrees. Delegates to the native codegen'd Catalyst
    * expression (graft.plans.Haversine) — bit-identical to
    * [[haversineMetersComposed]], which stays as the parity reference.
    */
  def haversineMeters(lat1: Column, lon1: Column,
                      lat2: Column, lon2: Column): Column =
    graft.plans.Haversine.distanceMeters(lat1, lon1, lat2, lon2)

  /** Composed-builtin form (radians/sin/cos/asin/sqrt/pow), kept for
    * equivalence testing against the native expression.
    */
  def haversineMetersComposed(lat1: Column, lon1: Column,
                              lat2: Column, lon2: Column): Column = {
    val la1 = radians(lat1)
    val la2 = radians(lat2)
    val dLat = la2 - la1
    val dLon = radians(lon2) - radians(lon1)
    val a = pow(sin(dLat / 2), 2) + cos(la1) * cos(la2) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** Planar euclidean distance in degrees (the reference's alternate
    * metric).
    */
  def euclideanDegrees(lat1: Column, lon1: Column,
                       lat2: Column, lon2: Column): Column =
    sqrt(pow(lat2 - lat1, 2) + pow(lon2 - lon1, 2))

  /** Snap a coordinate to a grid of the given resolution (degrees).
    * resolution <= 0 leaves the coordinate untouched (reference behavior:
    * min_spacial_resolution=0 disables downsampling).
    */
  def gridSnap(coord: Column, resolution: Double): Column =
    if (resolution <= 0) coord
    else round(coord / resolution, 0) * resolution
}
