package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational MERGE INTO and golden-record survivorship — the keyed
  * table-maintenance surface (beyond the reference's scope — first-class
  * per the build brief). Spark has no MERGE over plain parquet (that
  * lives in table formats); both operators here express the semantics
  * with one keyed outer join so they run on anything Spark can read.
  */
object MergeOps {

  /** MERGE INTO semantics over a keyed target:
    *   - key in both:   apply `updateSet` (expressions may read both
    *     sides: target columns as-is, source columns via `src` prefix),
    *     then drop the row if `deleteWhen` holds on the updated image;
    *   - key only in source: insert `insertSet`;
    *   - key only in target: keep unchanged.
    *
    * One full-outer hash join on the keys — the scale shape of every
    * table-format MERGE (they add file pruning on top; semantics are
    * this). Deterministic: both inputs must be key-unique (the caller's
    * contract, as in SQL MERGE where a duplicate source key is an
    * error). Key columns pass through (USING-join coalesced); every
    * non-key target column needs an `insertSet` value.
    *
    * `updateSet`/`insertSet` list (targetColumn -> expression); columns
    * absent from `updateSet` keep their target value; every target
    * column must get a value on insert (nulls are explicit).
    */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
                updateSet: Seq[(String, Column)],
                insertSet: Seq[(String, Column)],
                deleteWhen: Option[Column] = None): DataFrame = {
    val tCols = target.columns.toSeq
    val unknown = updateSet.map(_._1).filterNot(tCols.contains) ++
      insertSet.map(_._1).filterNot(tCols.contains)
    require(unknown.isEmpty,
      s"mergeInto: not target columns: ${unknown.mkString(", ")}")
    val srcPrefixed = source.columns.foldLeft(source) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, s"src_$c")
    }
    val j = target.withColumn("_t", lit(1))
      .join(srcPrefixed.withColumn("_s", lit(1)), keys, "full_outer")
    val updated = tCols.map { c =>
      if (keys.contains(c)) col(c).as(c) // USING-join keys are coalesced
      else {
        val upd = updateSet.toMap.get(c)
        val ins = insertSet.toMap.getOrElse(c,
          throw new IllegalArgumentException(s"mergeInto: no insert value for $c"))
        when(col("_t").isNotNull && col("_s").isNotNull,
          upd.getOrElse(col(c)))
          .when(col("_t").isNull, ins)
          .otherwise(col(c)).as(c)
      }
    }
    val merged = j.select(col("_t") +: col("_s") +: updated: _*)
    // delete fires only when the condition is TRUE on the updated image
    // (SQL MERGE semantics: an unknown/NULL condition does NOT delete) —
    // a bare !d would silently drop rows whose tested column is null
    deleteWhen
      .map(d => merged.filter(
        col("_t").isNull || col("_s").isNull || !(d <=> lit(true))))
      .getOrElse(merged)
      .drop("_t", "_s")
  }

  /** CDC change-feed application ("apply changes into"): collapse a
    * multi-change-per-key feed to the LATEST change under `seqCol`, then
    * apply it to the keyed base snapshot — latest op `D` drops the key
    * (even if the base never had it), any other op upserts the change's
    * image, keys without changes pass through. The one piece of CDC
    * [[mergeInto]] cannot express: a key may arrive many times per batch
    * (insert then update then delete), and only the feed ORDER decides.
    *
    * Determinism: the collapse is a max over the (seq, op, image) struct,
    * so even a (key, seq) tie resolves by a total order rather than
    * arrival order; the caller's CDC contract (unique (key, seq)) makes
    * the struct tie-break unreachable in well-formed feeds.
    *
    * Scale shape: one partial-aggregatable struct-max keyed on the
    * change key (executors contract each partition to one candidate per
    * key before the shuffle — feed volume never crosses the wire), then
    * one full-outer hash join against the base on the same key. Nothing
    * collects; nothing windows.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   seqCol: String, opCol: String): DataFrame = {
    val valueCols = base.columns.toSeq.filterNot(keys.contains)
    require(valueCols.forall(changes.columns.contains),
      "applyChanges: the feed must carry every base value column")
    val latest = changes
      .groupBy(keys.map(col): _*)
      .agg(max(struct(col(seqCol).as("_seq") +: col(opCol).as("_op") +:
        valueCols.map(c => col(c).as(c)): _*)).as("m"))
      .select(keys.map(col) ++
        Seq(col("m._op").as("_op")) ++
        valueCols.map(c => col(s"m.$c").as(s"_chg_$c")): _*)
    val j = base.withColumn("_t", lit(1))
      .join(latest.withColumn("_c", lit(1)), keys, "full_outer")
    val outCols = keys.map(col) ++ valueCols.map(c =>
      when(col("_c").isNotNull, col(s"_chg_$c")).otherwise(col(c)).as(c))
    // `_c IS NULL ||` keeps unchanged base rows: a bare `_op =!= 'D'`
    // would be NULL for them and filter every one out
    j.filter(col("_c").isNull || col("_op") =!= lit("D"))
      .select(outCols: _*)
  }

  /** Golden-record survivorship: collapse a key's rows into one record
    * where EACH column independently takes its best survivor —
    * `max_by`-style "latest non-null wins" under a caller-chosen recency
    * order, with the (order, value) pair made total so ties are
    * deterministic. The master-data dedup that [[Dedup]]'s keep-one
    * cannot express: the winning row may not exist (columns come from
    * DIFFERENT rows).
    *
    * Implementation is one hash aggregate: per column, max of the
    * (hasValue, order, tieBreak, value) struct — null values sort below
    * present ones, so a null never beats data; struct max is a single
    * partial-aggregable min/max, no window, no self-join.
    */
  def goldenRecord(df: DataFrame, key: String, orderCol: String,
                   tieBreakCol: String, valueCols: Seq[String])
  : DataFrame = {
    val picks = valueCols.map { c =>
      max(struct(col(c).isNotNull.as("has"), col(orderCol).as("o"),
        col(tieBreakCol).as("t"), col(c).as("v")))
        .getField("v").as(c)
    }
    df.groupBy(col(key))
      .agg(picks.head, picks.tail: _*)
  }

  /** Slowly-changing-dimension type 2: collapse a keyed snapshot
    * timeline into versioned validity rows. A version starts at every
    * observation where ANY tracked attribute differs from the previous
    * observation (null-safe compare, so a first-null attribute still
    * opens a version); `valid_from` = that observation's order value,
    * `valid_to` = the next version's start (null on the open version,
    * flagged `is_current`). Input contract: one row per (keys, order) —
    * pre-aggregate snapshots first.
    *
    * Scale shape: one key exchange serves both window passes (the
    * change-flag lag and the close-out lead are on the same
    * partitioning); no joins, no state beyond the windows.
    */
  def scd2(df: DataFrame, keys: Seq[String], orderCol: String,
           attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val isFirst = lag(col(orderCol), 1).over(w).isNull
    val changed = attrCols.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    df.withColumn("_start", isFirst || changed)
      .filter(col("_start"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead("valid_from", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .select(keys.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Snapshot content diff — the audit report between two corpus
    * snapshots: per key, `added` (only in new), `removed` (only in
    * old), `changed` (present in both, fingerprint differs); identical
    * rows are NOT emitted, so the output is delta-sized. This is the
    * inverse direction of cdcApply: that operator APPLIES a known
    * change feed; this one DERIVES the change feed from two states —
    * the "what did this recrawl/reprocess actually touch" question.
    *
    * One co-partitioned full-outer join on the key — both sides shuffle
    * once on the same key (or none with bucketed snapshots); the
    * fingerprint comparison is null-safe so a snapshot with null
    * fingerprints can never alias `changed`.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   fpCol: String): DataFrame = {
    val o = oldDf.select(col(keyCol), col(fpCol).as("fp_old"),
      lit(true).as("in_old"))
    val n = newDf.select(col(keyCol), col(fpCol).as("fp_new"),
      lit(true).as("in_new"))
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(!(col("fp_old") <=> col("fp_new")), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .select(col(keyCol), col("status"))
  }
}
