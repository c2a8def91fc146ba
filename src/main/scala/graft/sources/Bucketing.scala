package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout — the shuffle-elimination lever for repeated
  * joins/aggregations on a stable key (uid, doc_id). Writing both sides
  * of a hot join bucketed+sorted by the key means every later
  * join/groupBy on it is exchange-free: Spark matches the table's
  * HashPartitioning to the join's requirement and skips the shuffle
  * entirely (and the sort, when sortBy matches).
  *
  * At 100 TB this is the difference between re-shuffling the full fact
  * table on every pipeline run and shuffling it ONCE at ingest: the
  * reference's day-partitioned parquet layout solves time pruning but
  * not join co-location — hive partitioning (K2, Ingest.scala) and
  * bucketing compose (partition by date, bucket by uid).
  *
  * BucketingSpec pins the contract: a self-join and a groupBy on the
  * bucket key read back from a bucketed table show NO Exchange in the
  * executed plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table registered in the
    * session catalog at `path`. Buckets must match on both sides of a
    * co-located join.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
