package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Per-day batch orchestration — the reference's operational driver loop
  * (get_stops_and_clusters.py:25-71, testing_artemis.py:103-108): discover
  * date partitions, run the pipeline per day, write one output per day.
  *
  * Spark-first note: when the whole history is processed at once, ONE job
  * over the hive-partitioned dataset (with date in the grouping keys) beats
  * a day loop — Spark parallelizes across days natively. This helper exists
  * for the flows where per-day isolation is the point: incremental daily
  * runs, backfills of selected dates, and keeping per-day outputs
  * independently re-writable. Each day's read is partition-pruned (the
  * filter on the partition column reaches the scan), so a one-day run
  * never touches other days' files.
  */
object DailyBatch {

  /** Date values present in a hive-partitioned dataset, from directory
    * names (`partitionCol=value`) — no data files are opened.
    */
  def partitionDates(spark: SparkSession, path: String,
                     partitionCol: String = "date_trunc"): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$partitionCol="))
      .map(_.stripPrefix(s"$partitionCol="))
      .sorted
  }

  /** Run `pipeline(dayFrame, date)` for each date partition (or the given
    * subset) and write each result under `outPath/partitionCol=date`.
    * Failures are collected per day rather than aborting the loop, so a
    * bad day cannot block a backfill; the caller gets (date -> error).
    */
  def forEachDay(spark: SparkSession, inPath: String, outPath: String,
                 partitionCol: String = "date_trunc",
                 dates: Option[Seq[String]] = None)
                (pipeline: (DataFrame, String) => DataFrame)
  : Map[String, String] = {
    val all = dates.getOrElse(partitionDates(spark, inPath, partitionCol))
    val errors = scala.collection.mutable.Map.empty[String, String]
    all.foreach { d =>
      try {
        val day = spark.read.parquet(inPath)
          .filter(col(partitionCol) === d)
        pipeline(day, d).write.mode("overwrite")
          .parquet(s"$outPath/$partitionCol=$d")
      } catch {
        // NonFatal only: an OutOfMemoryError / VM error must propagate —
        // continuing to drive jobs on a broken JVM corrupts the backfill.
        case scala.util.control.NonFatal(e) =>
          errors += d -> Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    errors.toMap
  }
}
