package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Training-sequence packing (beyond-reference, LLM-pipeline operator):
  * concatenate documents in a deterministic order and chunk the stream
  * into fixed token-budget packs — the "concat then chunk" packing used
  * to build pretraining batches. Each doc is assigned the pack where its
  * first token lands (`pack_id = start_offset / budget`), with its offset
  * inside that pack and the number of packs it spans (a doc longer than
  * the remaining space straddles pack boundaries; the trainer's loader
  * slices it).
  *
  * Scale shape: the global running token offset is NOT a
  * `sum(...) over (order by ...)` window — that collapses to a single
  * partition at 100 TB. Instead [[globalCumSum]] range-partitions by the
  * order key, takes one tiny per-partition-totals job (one row per
  * partition to the driver), and adds each partition's starting offset to
  * a per-partition running sum (a window PARTITIONED by the physical
  * partition id — parallel, never global). Same mechanics as
  * Indexing.globalRowIndex, generalized from count to sum.
  *
  * Cache contract matches globalRowIndex: the range-partitioned frame is
  * persisted so the totals pass and the output observe identical
  * boundaries; the caller clears the cache after materializing.
  */
object Packing {

  /** Adds `cumCol` = exclusive prefix sum of `valueCol` in `orderCols`
    * order (the value of the FIRST row is 0). Values must be non-negative
    * longs.
    */
  def globalCumSum(df: DataFrame, cumCol: String, valueCol: Column,
                   orderCols: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sorted = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totals = sorted.groupBy("__pid").agg(sum("__v").as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (totals.isEmpty)
      return sorted.withColumn(cumCol, lit(0L)).drop("__v", "__pid")
        .filter(lit(false))
    val offsets = new Array[Long](totals.keys.max + 1)
    var acc = 0L
    offsets.indices.foreach { p =>
      offsets(p) = acc; acc += totals.getOrElse(p, 0L)
    }
    val partOffset =
      element_at(array(offsets.map(lit): _*), col("__pid") + 1)
    // per-PARTITION running sum: parallel across partitions by
    // construction (the window key is the partition id, so no partition
    // of the window exceeds one task's rows)
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      .withColumn(cumCol, partOffset + sum(col("__v")).over(w) - col("__v"))
      .drop("__v", "__pid")
  }

  /** docs + (pack_id, offset_in_pack, n_packs_spanned) under
    * `budgetTokens`, packing in `orderCols` order. Zero-token docs get
    * the pack where their offset falls and span 1.
    */
  def packChunks(docs: DataFrame, tokensCol: Column, budgetTokens: Long,
                 orderCols: Column*): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive: $budgetTokens")
    val withStart =
      globalCumSum(docs.withColumn("n_tokens", tokensCol.cast("long")),
        "__start", col("n_tokens"), orderCols: _*)
    // integral div/mod throughout: `/` on longs is DOUBLE division in
    // Spark, which silently loses precision past 2^53 total tokens
    withStart
      .withColumn("pack_id", expr(s"__start div ${budgetTokens}L"))
      .withColumn("offset_in_pack", col("__start") % budgetTokens)
      .withColumn("n_packs_spanned",
        when(col("n_tokens") > 0,
          expr(s"(offset_in_pack + n_tokens - 1) div ${budgetTokens}L")
            + lit(1L))
          .otherwise(lit(1L)))
      .drop("__start")
  }
}
