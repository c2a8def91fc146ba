package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity generalization ladder — the privacy gate a training-data
  * pipeline runs before releasing user-derived records: each row is
  * published at the FINEST generalization level whose quasi-identifier
  * group (among rows published at that level) reaches size >= k, and
  * suppressed when no level qualifies.
  *
  * Recode semantics are LOCAL (per-row escalation): level i's group
  * count includes only the rows that fell through levels 0..i-1, so a
  * level-1 group is counted over exactly the population that will be
  * published in it — the count IS the published group size, which makes
  * the k-anonymity certificate (`every published (level, group) has
  * >= k rows`) checkable directly on the output.
  *
  * Scale: one window count per ladder level. Each window clusters by
  * that level's QI columns; when every level shares a common key prefix
  * (the q169 ladder keeps `nation` at all levels), pre-partitioning the
  * input on the shared prefix lets every window reuse the one exchange
  * — HashPartitioning on a subset of the partitionBy keys satisfies the
  * window's ClusteredDistribution, so the plan is exchange-once,
  * sort-per-level. No driver state, no collect; group cardinality is
  * unbounded.
  */
object Anonymize {

  /** Adds `gen_level`: the first index i into `levels` (each a list of
    * QI grouping columns) whose local-recode group count reaches k, or
    * `levels.size` if the row is suppressed.
    */
  def kAnonymityLevels(df: DataFrame, k: Int,
                       levels: Seq[Seq[Column]]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(levels.nonEmpty, "need at least one generalization level")
    // unresolved = rows that fell through every level so far; each pass
    // counts only those within the current level's QI partition.
    val start = df.withColumn("__lvl", lit(null).cast("int"))
    val laddered = levels.zipWithIndex.foldLeft(start) {
      case (acc, (qi, i)) =>
        val w = Window.partitionBy(qi: _*)
        val cnt = sum(when(col("__lvl").isNull, 1).otherwise(0)).over(w)
        acc.withColumn("__lvl",
          when(col("__lvl").isNull && cnt >= k, lit(i))
            .otherwise(col("__lvl")))
    }
    laddered
      .withColumn("gen_level",
        coalesce(col("__lvl"), lit(levels.size)).cast("long"))
      .drop("__lvl")
  }

  /** l-diversity report over a PUBLISHED (already generalized) frame —
    * the second privacy bar after k-anonymity: a k-sized group whose
    * sensitive attribute is constant still leaks it (homogeneity
    * attack), so every published QI group must carry at least `l`
    * DISTINCT sensitive values.
    *
    * One hash aggregate per QI group: size, exact distinct-sensitive
    * count, and the `diverse` certificate — checkable directly on the
    * output, like [[kAnonymityLevels]]'s group-size contract. Exact
    * count-distinct inside a group aggregate expands to the standard
    * two-phase plan (partial on (group, sensitive), final on group);
    * both phases are partial-agg friendly and share the group exchange.
    */
  def lDiversity(published: DataFrame, groupCols: Seq[Column],
                 sensitiveCol: Column, l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    published.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(sensitiveCol).as("l_distinct"))
      .withColumn("diverse", col("l_distinct") >= l)
  }
}
