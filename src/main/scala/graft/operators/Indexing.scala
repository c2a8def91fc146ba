package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Scalable global row index (P8: the reference's with_row_index,
  * src/polaroam/models.py:75, testing.py:210).
  *
  * A global `row_number() over (order by ...)` collapses to a single
  * partition — a driver-sized bottleneck at 100 TB. Instead: range
  * partition by the sort key, sort within partitions, then add each
  * partition's starting offset (one tiny job to count per-partition rows).
  * Total order is identical; no single-partition stage.
  */
object Indexing {

  def globalRowIndex(df: DataFrame, indexCol: String,
                     sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val indexed = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(indexed,
      sorted.schema.add(StructField(indexCol, LongType, nullable = false)))
  }
}
