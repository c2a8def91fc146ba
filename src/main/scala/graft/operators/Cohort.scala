package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: group users by the time bucket of their
  * first activity (the cohort), then count how many of each cohort are
  * still active n buckets later — the standard growth-analytics matrix
  * (beyond-reference operator, first-class per the build brief).
  *
  * The caller supplies the integer time-bucket column (e.g.
  * `ts div week`) so bucketing stays exact integer arithmetic — no
  * calendar/timezone seam between engines (the q125 oracle reproduces
  * the matrix bit-for-bit from the same division).
  *
  * Scale shape: one distinct over (user, bucket) — the only pass that
  * sees event-level volume, and a partial-aggregatable one; the cohort
  * assignment is a user-keyed min aggregate whose exchange the
  * subsequent user join reuses; the matrix and cohort sizes are
  * cohort-keyed aggregates over the already-contracted (user, bucket)
  * frame. No windows, no driver state.
  */
object Cohort {

  /** One row per (cohort, offset) with the distinct active-user count and
    * the cohort's size: cohort = the user's minimum bucket, offset =
    * bucket - cohort (offset 0 row counts the full cohort by
    * construction).
    */
  def retention(events: DataFrame, userCol: String, bucketCol: String)
  : DataFrame = {
    val active = events
      .select(col(userCol).as("user"),
        col(bucketCol).cast("long").as("bucket"))
      .distinct()
    val first = active.groupBy("user").agg(min("bucket").as("cohort"))
    val sizes = first.groupBy("cohort")
      .agg(count(lit(1)).as("cohort_size"))
    active.join(first, "user")
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("bucket_offset"))
      .agg(countDistinct("user").as("n_active"))
      .join(sizes, "cohort")
      .select("cohort", "bucket_offset", "n_active", "cohort_size")
  }
}
