package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length interval coalescing (W10): merge a user's consecutive
  * same-label rows into [label, t_start, t_end] intervals, splitting when
  * the inter-row gap reaches maxGap.
  *
  * Relational rewrite of the reference's row-iterative NumPy loop
  * (src/polaroam/postprocess.py:3-40): lag -> new-interval flag ->
  * cumulative sum -> group aggregate. One shuffle on the key column; the
  * batch analog of a streaming session_window.
  */
object Intervals {

  /** @param df     input rows
    * @param key    grouping column, e.g. uid
    * @param label  run label column, e.g. stop_events / event_type
    * @param ts     ordering timestamp column (numeric)
    * @param tiebreak extra ordering column for deterministic order when ts
    *                 values can tie (pass the row id)
    * @param maxGap  gap >= maxGap forces a new interval even if the label
    *                repeats (reference max_time_between)
    */
  def coalesceRuns(df: DataFrame, key: Column, label: Column, ts: Column,
                   tiebreak: Column, maxGap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new",
        when(lag(label, 1).over(w).isNull ||
          lag(label, 1).over(w) =!= label ||
          ts - lag(ts, 1).over(w) >= maxGap, 1).otherwise(0))
      .withColumn("interval_id", sum(col("__new")).over(cum))
      .groupBy(key.as("key"), col("interval_id"))
      .agg(
        first(label).as("label"),
        min(ts).as("t_start"),
        max(ts).as("t_end"),
        count(lit(1)).as("n_rows"))
  }
}
