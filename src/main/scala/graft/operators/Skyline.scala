package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) per group — the "no other row is at
  * least as good on both axes and strictly better on one" query
  * (Börzsönyi et al. ICDE'01's SKYLINE OF, which SQL engines still
  * lack): cheapest-vs-largest part, fastest-vs-freshest replica, every
  * two-criteria shortlist.
  *
  * Row p (minimize x, maximize y) is dominated iff some q in its group
  * has x_q <= x_p, y_q >= y_p, strict on at least one axis. Split by
  * the x-tie case and both tests become window maxima over integer
  * ranges:
  *   - strict-x dominator: max(y) over x' < x reaches y_p
  *     (RANGE UNBOUNDED..-1 on the integer x — exact strictness);
  *   - same-x dominator: max(y) over x' = x exceeds y_p.
  * Duplicate (x, y) points dominate each other on neither axis and all
  * stay on the frontier, matching the set definition.
  *
  * Scale shape: one exchange on the group key serves both windows (the
  * same-x window's ClusteredDistribution is satisfied by the group
  * HashPartitioning — the q169 subset rule); no self-join, no
  * quadratic pair step. A GLOBAL skyline (empty group) would funnel
  * into one partition — group it (per brand, per tenant, per shard +
  * merge) at scale, which is also the query users actually ask.
  */
object Skyline {

  /** Adds `on_frontier` to every row: x minimized, y maximized, both
    * integer columns (range frames need integral order keys).
    */
  def skyline2D(df: DataFrame, groupCols: Seq[Column],
                xCol: String, yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val wStrict = Window.partitionBy(groupCols: _*).orderBy(x)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(groupCols :+ x: _*)
    df.withColumn("on_frontier",
      !(coalesce(max(y).over(wStrict) >= y, lit(false)) ||
        coalesce(max(y).over(wSameX) > y, lit(false))))
  }
}
