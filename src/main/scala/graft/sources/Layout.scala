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
    * even result bits, y the odd ones. 2·bits ≤ 63. Up to 16 bits this is
    * the fused [[graft.plans.InterleaveBits]] magic-number ladder (one
    * codegen'd expression instead of a 2·bits-term Column tree); wider
    * keys keep the composed per-bit form.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && 2 * bits <= 63, s"bits out of range: $bits")
    if (bits <= 16) graft.plans.InterleaveBits(x, y, bits)
    else (0 until bits).map { k =>
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

  /** Per-bucket layout stats over FIXED curve cells: bucket = the top
    * `bucketBits` bit-pairs of the 32-bit z-key over (x, y) — both must
    * already be quantized into [0, 65536). Unlike [[zorderByRange]]
    * (sampled boundaries, one range exchange), the curve-cell bucket is
    * a stateless per-row expression — data-independent file assignment,
    * no global sort — and the returned min/max row per occupied bucket
    * is exactly the footer stats a parquet write of that cell would
    * carry: the bbox IS the proof the layout prunes two-dimensional
    * range predicates.
    */
  def zOrderBuckets(df: DataFrame, x: Column, y: Column,
                    bucketBits: Int = 3): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16,
      s"bucketBits must be in [1,16], got $bucketBits")
    val z = graft.plans.InterleaveBits(x.cast("long"), y.cast("long"))
    df.select(x.cast("long").as("qx"), y.cast("long").as("qy"),
        z.as("zval"))
      .withColumn("bucket",
        shiftright(col("zval"), 32 - 2 * bucketBits))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("qx").as("x_min"), max("qx").as("x_max"),
        min("qy").as("y_min"), max("qy").as("y_max"),
        min("zval").as("z_min"), max("zval").as("z_max"))
  }
}
