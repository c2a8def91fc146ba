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

  /** Upsert-by-key into versioned snapshots: merge `updates` into the
    * latest snapshot under `stateRoot` (rows whose key appears in
    * `updates` are replaced, others carried forward) and write the
    * result as snapshot `v{n+1}`. Returns the new snapshot path; the
    * previous snapshot is never touched, so readers keep a consistent
    * view and a failed write leaves no partial state visible (the new
    * version only "exists" once its _SUCCESS marker is written —
    * [[latestSnapshot]] ignores unfinished directories). This is the
    * plain-parquet MERGE pattern for the daily flow: each day's stop
    * medians/labels replace that user-day's prior rows. Old versions are
    * the caller's retention policy.
    */
  def upsertSnapshot(spark: SparkSession, stateRoot: String,
                     updates: DataFrame, keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty, "at least one key column required")
    val next = latestSnapshot(spark, stateRoot) match {
      case None => updates
      case Some(prev) =>
        val carried = spark.read.parquet(prev)
          .join(updates.select(keyCols.map(col): _*).distinct(),
            keyCols, "left_anti")
        carried.unionByName(updates)
    }
    val version = latestVersion(spark, stateRoot) + 1
    val path = s"$stateRoot/v$version"
    next.write.mode("errorifexists").parquet(path)
    path
  }

  /** Latest complete (_SUCCESS-marked) snapshot directory, if any. */
  def latestSnapshot(spark: SparkSession, stateRoot: String)
  : Option[String] = {
    val v = latestVersion(spark, stateRoot)
    if (v < 0) None else Some(s"$stateRoot/v$v")
  }

  private def latestVersion(spark: SparkSession, stateRoot: String): Int = {
    val p = new Path(stateRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(d => fs.exists(new Path(d, "_SUCCESS")))
      .map(_.getName)
      .filter(_.matches("v\\d+"))
      .map(_.stripPrefix("v").toInt)
      .sorted.lastOption.getOrElse(-1)
  }
}
