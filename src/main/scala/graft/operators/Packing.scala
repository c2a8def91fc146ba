package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * partition to the driver), and adds each partition's starting offset
  * to an imperative per-partition running sum — no further shuffle, no
  * window. Same mechanics as Indexing.globalRowIndex, generalized from
  * count to sum.
  *
  * Cache contract matches globalRowIndex: the range-partitioned frame is
  * lazily local-checkpointed so the totals pass and the output observe
  * identical boundaries; blocks free via the ContextCleaner — no
  * caller-side cache lifecycle (see Indexing's scaladoc for why
  * checkpoint beats persist here: an evicted-then-recomputed cache could
  * resample different range boundaries and corrupt offsets).
  */
object Packing {

  /** Adds `cumCol` = exclusive prefix sum of `valueCol` in `orderCols`
    * order (the value of the FIRST row is 0). Values must be non-negative
    * longs, and `orderCols` must be a TOTAL order (e.g. include a unique
    * id): ties would make the prefix sums of the tied rows
    * recompute-order-dependent.
    *
    * ZERO shuffles beyond the range exchange: the obvious per-partition
    * window (`partitionBy(spark_partition_id())`) would re-shuffle the
    * whole frame by pid — Catalyst cannot know the rows are already
    * partition-aligned — so the running sum is instead an imperative
    * per-partition pass over `toRdd` (one JoinedRow append per row,
    * partition index = the same physical partition the totals pass
    * observed through the persisted frame).
    */
  def globalCumSum(df: DataFrame, cumCol: String, valueCol: Column,
                   orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .localCheckpoint(eager = false)
    // one tiny job: per-partition totals (one row per partition)
    val totals = sorted
      .select(spark_partition_id().as("p"), col("__v"))
      .groupBy("p").agg(sum("__v").as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (totals.isEmpty)
      return sorted.withColumn(cumCol, lit(0L)).drop("__v")
        .filter(lit(false))
    val inner = sorted.queryExecution.toRdd
    val offsets = new Array[Long](inner.getNumPartitions)
    var acc = 0L
    offsets.indices.foreach { p =>
      offsets(p) = acc; acc += totals.getOrElse(p, 0L)
    }
    val schema = sorted.schema
    val vIdx = schema.fieldIndex("__v")
    val outSchema = schema.add(cumCol,
      org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = inner.mapPartitionsWithIndex { (pid, it) =>
      var running = offsets(pid)
      it.map[org.apache.spark.sql.catalyst.InternalRow] { row =>
        val v = row.getLong(vIdx)
        val out = new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          row.copy(), // scan buffers are reused; the copy is ours
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](running)))
        running += v
        out
      }
    }
    org.apache.spark.sql.GraftBridge.internalDataFrame(spark, rdd, outSchema)
      .drop("__v")
  }

  /** Sliding-window chunking for long-context training: each document
    * becomes windows of up to `window` tokens starting every `stride`
    * tokens (`stride < window` gives overlapping context windows; the
    * final window is the sub-`window`-length tail). Output = one row per
    * chunk: (id, chunk_idx, tok_start, tok_len).
    *
    * Purely per-document — a generate/explode over a bounded integer
    * sequence (at most ceil(n/stride) rows per doc), no shuffle, no
    * state, full codegen: the shape that scales embarrassingly to 100 TB.
    * Zero-token docs emit no chunks (there is nothing to train on);
    * compose with a left join when a doc manifest must stay total.
    */
  def chunkWindows(docs: DataFrame, idCol: String, tokensCol: Column,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val n = coalesce(tokensCol.cast("long"), lit(0L))
    docs
      .select(col(idCol).as("id"), n.as("__n"))
      .filter(col("__n") > 0L)
      .select(col("id"), col("__n"),
        posexplode(sequence(lit(0L), col("__n") - 1L, lit(stride.toLong))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("tok_start"),
        least(lit(window.toLong), col("__n") - col("col")).as("tok_len"))
  }

  /** Materialized training sequences: assign each doc to the pack where
    * its first token lands ([[packChunks]]), then concatenate the pack's
    * documents in order into one text per pack — the actual "build the
    * batch file" step, not just the id manifest. Output: (pack_id, text,
    * n_docs, n_tokens).
    *
    * Scale shape: one shuffle on pack_id; each pack's group is bounded by
    * `budgetTokens` of text BY CONSTRUCTION (a pack holds only docs whose
    * first token lands inside its budget window, plus at most one
    * straddler tail), so the per-group collect can never see an unbounded
    * group — the safety argument a bare collect_list(text) lacks.
    * Ordering inside the pack uses `orderKey`, which must be UNIQUE per
    * row (it is the packing's entire order, and ties would make both the
    * pack assignment and the concatenation order
    * recompute-order-dependent).
    */
  def materializePacks(docs: DataFrame, textCol: Column, tokensCol: Column,
                       budgetTokens: Long, orderKey: Column,
                       sep: String = " "): DataFrame = {
    val packed = packChunks(
      docs.withColumn("__ok", orderKey).withColumn("__tx", textCol),
      tokensCol, budgetTokens, col("__ok"))
    packed
      .groupBy(col("pack_id"))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(struct(col("__ok"), col("__tx")))),
            x => x.getField("__tx")),
          sep).as("text"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
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

  /** Per-key DELTA encoding of an ordered integer series — the
    * timestamp-compression layout a time-series store ships (a sorted
    * epoch column delta-encodes to single-digit varints): one row per
    * key with the base value, the comma-joined delta string (a STRING,
    * not an array — portable to every engine and sink), count, and the
    * reconstruction certificate `span = last − base = sum(deltas)`,
    * which a decoder (or the oracle) re-checks without trusting the
    * encoder.
    *
    * One sort_array(collect_list) hash aggregate per key (the q197
    * assembly — no window, no sort exchange); the delta walk is
    * per-row array arithmetic on the contracted key-sized frame.
    */
  def deltaEncode(df: DataFrame, keys: Seq[String], orderCol: String)
  : DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols: _*)
      .agg(sort_array(collect_list(col(orderCol))).as("__vs"))
      .select(keyCols ++ Seq(
        element_at(col("__vs"), 1).as("base"),
        size(col("__vs")).cast("long").as("n"),
        (element_at(col("__vs"), -1) - element_at(col("__vs"), 1))
          .as("span"),
        concat_ws(",", transform(
          sequence(lit(2), greatest(size(col("__vs")), lit(2))),
          i => when(i <= size(col("__vs")),
            element_at(col("__vs"), i) - element_at(col("__vs"), i - 1))))
          .as("deltas")): _*)
  }
}
