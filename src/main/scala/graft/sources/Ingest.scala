package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest layer (EP3, src/polaroam/read_localize_write.py): raw ping
  * CSV/Parquet -> clean -> timezone-localize -> hive-partitioned Parquet.
  *
  * Scale design: every step is a narrow transformation over the scan
  * except the optional active-days filter (one aggregate + semi join) and
  * the partitioned write (hash repartition on the partition column keeps
  * one file per partition per task instead of a small-files explosion).
  */
object Ingest {

  /** Positional raw schema of the reference's parquet drops
    * (read_localize_write.py:11-13: _c0=uid, _c2=lat, _c3=lon, _c5=ts,
    * _c4=error).
    */
  def renameRaw(raw: DataFrame,
                mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(raw) { case (df, (from, to)) =>
      df.withColumnRenamed(from, to)
    }

  /** Headerless (optionally gzipped) CSV scan; codec inferred from the
    * file extension (S3: read_localize_write.py:50).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "false").csv(path)

  /** GPS accuracy filter (P4: error < 20/30 m). */
  def filterAccuracy(df: DataFrame, maxError: Double): DataFrame =
    df.filter(col("error") < maxError)

  /** Anonymize a string uid to a 60-bit non-negative Long: the low 15 hex
    * digits of sha256. The reference intends int.from_bytes(sha256(x)) %
    * 2^63 (read_localize_write.py:38-46 — note it hashes the literal
    * string "uid", a latent bug; we implement the intended per-value
    * semantics) — we take 60 bits instead of 63 so the value fits a
    * non-negative Long from a 15-hex-digit parse in any engine.
    */
  def uidHash(uid: Column): Column =
    conv(substring(sha2(uid.cast("binary"), 256), 50, 15), 16, 10)
      .cast("long")

  /** Epoch-seconds -> UTC-stamped -> tz-localized wall-clock timestamp +
    * date partition string (read_localize_write.py:19-27). The returned
    * datetime column carries the LOCAL wall clock (the reference's
    * convert_time_zone trick); date_trunc is its yyyy-MM-dd.
    */
  def localize(df: DataFrame, tsCol: String, tz: String): DataFrame =
    df.withColumn("datetime",
        from_utc_timestamp(timestamp_seconds(col(tsCol)), tz))
      .withColumn("date_trunc", date_format(col("datetime"), "yyyy-MM-dd"))

  /** Keep only users active on more than `minDays` distinct partition days
    * (read_localize_write.py:71-83) — aggregate + broadcast-able semi
    * join, the relational form of the reference's count+join+drop.
    */
  def filterActiveDays(df: DataFrame, minDays: Int): DataFrame = {
    val active = df.groupBy("uid")
      .agg(countDistinct(col("date_trunc")).as("n_days"))
      .filter(col("n_days") > minDays)
      .select("uid")
    df.join(active, Seq("uid"), "left_semi")
  }

  /** Hive-partitioned sink (K2). maxRecordsPerFile guards against
    * single-partition whales at scale.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String = "date_trunc"): Unit =
    df.repartition(col(partitionCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", 5000000)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Full parquet-drop pipeline (read_localize_write.py:6-33). */
  def localizeParquet(spark: SparkSession, inPath: String, outPath: String,
                      tz: String, maxError: Double = 20.0): Unit = {
    val raw = spark.read.parquet(inPath)
    val renamed = renameRaw(raw, Map(
      "_c0" -> "uid", "_c2" -> "latitude", "_c3" -> "longitude",
      "_c5" -> "timestamp", "_c4" -> "error"))
    val cleaned = filterAccuracy(renamed, maxError)
    writePartitioned(localize(cleaned, "timestamp", tz), outPath)
  }
}
