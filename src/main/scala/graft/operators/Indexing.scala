package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalable global row index (P8: the reference's with_row_index,
  * src/polaroam/models.py:75, testing.py:210).
  *
  * A global `row_number() over (order by ...)` collapses to a single
  * partition — a driver-sized bottleneck at 100 TB. Instead: range
  * partition by the sort key, sort within partitions, then add each
  * partition's starting offset. The per-partition ordinal comes from
  * `monotonically_increasing_id()` (pid << 33 | row-in-partition counter),
  * and the offsets come from one tiny per-partition count job — the plan
  * stays columnar and whole-stage-codegen throughout, unlike an
  * RDD zipWithIndex round-trip, which drops every downstream operator out
  * of codegen and re-encodes all rows.
  *
  * The sorted frame is persisted so the count pass and the indexed output
  * observe the identical partitioning (and the sort runs once). The cache
  * CANNOT be dropped before the caller materializes the result: a
  * recompute re-runs range-partitioner sampling on a fresh RDD id, which
  * may draw different boundaries than the counts pass observed and corrupt
  * the offsets. The caller therefore owns the cache lifecycle — call
  * `spark.catalog.clearCache()` (or unpersist via the catalog) once the
  * indexed output is materialized; Verify and Bench do exactly that
  * between queries.
  */
object Indexing {

  def globalRowIndex(df: DataFrame, indexCol: String,
                     sortCols: Column*): DataFrame = {
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.select(spark_partition_id().as("pid"))
      .groupBy("pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) { // empty input: no offsets to wire up
      return sorted.withColumn(indexCol, lit(0L)).filter(lit(false))
    }
    val offsets = new Array[Long](counts.keys.max + 1)
    var acc = 0L
    offsets.indices.foreach { p =>
      offsets(p) = acc; acc += counts.getOrElse(p, 0L)
    }
    val offsetOfPid =
      element_at(array(offsets.map(lit): _*), spark_partition_id() + 1)
    val inPartitionOrdinal =
      monotonically_increasing_id().bitwiseAND((1L << 33) - 1)
    sorted.withColumn(indexCol, offsetOfPid + inPartitionOrdinal)
  }
}
