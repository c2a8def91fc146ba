package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — "which interval(s) contain this
  * timestamp" — as an equi-join Catalyst can plan well at scale.
  *
  * A raw `p.ts BETWEEN i.start AND i.end` join with no equality component
  * is a broadcast-nested-loop (quadratic) in Spark. The scalable rewrite
  * bins the time axis: points get the bin their timestamp falls in,
  * intervals are exploded to every bin they overlap (`sequence`), and the
  * join becomes an equi-join on (keys..., bin) with the BETWEEN as a
  * post-join filter. Each point carries exactly one bin row, so no
  * dedup pass is needed; interval duplication is bounded by
  * ceil(interval_length / binSize) + 1 — pick binSize near the typical
  * interval length so the blow-up stays ~2x. Both sides shuffle-hash on
  * (keys..., bin), the 100 TB-safe shape.
  */
object RangeJoin {

  /** Join `points` to the `intervals` that contain them.
    *
    * @param points    frame with `ptCol` (numeric timestamp)
    * @param intervals frame with `startCol`/`endCol` (inclusive bounds)
    * @param keys      equality key columns present on both sides (may be
    *                  empty: the bin alone provides the equi component)
    * @param binSize   bin width in timestamp units
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    def binOf(c: Column): Column = floor(c / binSize).cast("long")
    val p = points.withColumn("__bin", binOf(col(ptCol)))
    val iv = intervals
      .withColumn("__bin",
        explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(iv, keys :+ "__bin")
      .filter(col(ptCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
