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

  private val geohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash cell string (even `chars` only, so lat and lon
    * split the bits equally — 6 chars = 30 bits = 15 per axis, ~±0.09°
    * cells). Bit layout per the geohash spec: longitude owns the MSB
    * and alternates down — which is exactly
    * [[graft.plans.InterleaveBits]] with lat on even (LSB-side) and
    * lon on odd output bits, so the whole key is one fused codegen
    * expression; the base32 digits are five-bit slices rendered
    * through substr. Quantization is floor((coord+offset)·2^b/span)
    * with the operand order fixed so both engines round identically
    * (IEEE, no transcendentals).
    *
    * Pure per-row projection — geohash cost is scan-linear; the cell
    * id is the standard spatial bucketing/join key (the q34 grid snap
    * with a portable, prefix-hierarchical name).
    */
  def geohash(lat: Column, lon: Column, chars: Int = 6): Column = {
    require(chars >= 2 && chars <= 6 && chars % 2 == 0,
      s"chars must be even in [2,6], got $chars")
    val bitsEach = chars * 5 / 2
    val scale = (1L << bitsEach).toDouble
    def q(c: Column, offset: Double, span: Double): Column =
      least(floor((c + lit(offset)) * lit(scale) / lit(span)),
        lit((1L << bitsEach) - 1L)).cast("long")
    val z = graft.plans.InterleaveBits(
      q(lat, 90.0, 180.0), q(lon, 180.0, 360.0), bitsEach)
    // the z subtree is inlined into each digit; codegen CSEs it
    val alphabet = typedlit(geohashAlphabet.toCharArray.map(_.toString).toSeq)
    concat((0 until chars).map { i =>
      val shift = 5 * (chars - 1 - i)
      element_at(alphabet,
        (shiftrightunsigned(z, shift).bitwiseAND(lit(31L)) + 1)
          .cast("int"))
    }: _*)
  }
}
