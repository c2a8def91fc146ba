package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) spatial data layout (beyond the reference's
  * surface). The mobility tables are always filtered by BOTH latitude and
  * longitude, but parquet row-group pruning only helps when a file's
  * min/max range for the filter column is tight — and sorting by (lat,
  * lon) lexicographically leaves lon ranges as wide as the dataset.
  * Interleaving the bits of the two quantized coordinates gives a single
  * sort key whose ranges are spatially square-ish: range-partitioning and
  * sorting by it makes EVERY file tight in BOTH dimensions, so a
  * `lat BETWEEN a AND b AND lon BETWEEN c AND d` scan skips all but the
  * touched tiles. At 100 TB this is the difference between reading a
  * city-sized slice and reading the planet.
  *
  * Everything is plain integer Column arithmetic (shifts/masks, fully
  * codegen'd); the layout write is `repartitionByRange(z) +
  * sortWithinPartitions(z)` — one range exchange, Spark's own machinery.
  */
object Layout {

  /** Quantize `v` from [min, min+range) to an integer cell in
    * [0, 2^bits). Out-of-range values clamp to the edge cells. `range` is
    * taken as a literal double (not computed max−min) so an external SQL
    * twin parsing the same decimal text gets the identical IEEE value.
    */
  def quantize(v: Column, min: Double, range: Double, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    least(greatest(floor((v - lit(min)) / lit(range) * lit(cells)),
      lit(0.0)), lit(cells - 1.0)).cast("long")
  }

  /** Morton interleave of two `bits`-bit non-negative ints: x occupies the
    * even result bits, y the odd ones. 2·bits ≤ 63.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && 2 * bits <= 63, s"bits out of range: $bits")
    (0 until bits).map { k =>
      shiftleft(shiftright(x, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(
          shiftleft(shiftright(y, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-value of a (lat, lon) pair over the given bounding box. */
  def zValue(lat: Column, lon: Column,
             latMin: Double, latRange: Double,
             lonMin: Double, lonRange: Double, bits: Int = 16): Column =
    interleave(quantize(lat, latMin, latRange, bits),
      quantize(lon, lonMin, lonRange, bits), bits)

  /** Lay `df` out in z-order: range-partition on the z key (tight,
    * non-overlapping z ranges per output partition/file) and sort inside
    * each so row groups are tight too. Follow with `.write.parquet(...)`.
    */
  def zorderByRange(df: DataFrame, z: Column, partitions: Int): DataFrame =
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
