package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided test tables (`/root/repo/TESTDATA.md`)
  * plus the deterministic `pings` trajectory view that the mobility
  * operators (stop detection, clustering, home/work) run on.
  *
  * The pings view is derived from the `events` table with pure integer
  * arithmetic so that the Spark side and the DuckDB oracle side compute
  * bit-identical doubles (int -> double is exact; add/mul are
  * IEEE-identical).
  * Schema matches the reference's canonical `pings` input:
  * uid String, latitude Double, longitude Double, timestamp Long
  * (reference: src/polaroam/read_localize_write.py:11-13).
  */
object Tables {

  /** Session settings every entry point needs. The driver tables store
    * `events.ts` as parquet TIMESTAMP(NANOS), which Spark only reads as a
    * nanosecond Long via this legacy flag (DuckDB truncates the same values
    * to microseconds — both floor, so derived epoch math agrees).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    tune(spark).read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events` with the ts contract every consumer assumes: a NANOSECOND
    * epoch Long. Fixture generations have stored ts as parquet
    * TIMESTAMP(NANOS) (read as Long via the nanosAsLong flag) and as
    * TIMESTAMP(MICROS) (read as TimestampNTZ) — normalize the latter here
    * (session tz is UTC in every entry point, so the NTZ wall clock IS
    * the epoch instant; µs → ns is exact integer math and matches the
    * oracle's `epoch_us(ts) * 1000` to the µs resolution the file holds).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Deterministic synthetic trajectory derived from `events`.
    *
    * Each user's pings are ordered by (ts, event_id); the user dwells ~8
    * consecutive pings at one of 4 sites laid out on a ~1.1 km grid, with a
    * sub-meter jitter, then jumps to the next site. This yields a mix of
    * stationary runs and transitions for the stop-detection operators.
    * All coordinate math is integer-derived so DuckDB reproduces it exactly.
    */
  def pings(spark: SparkSession, sfDir: String): DataFrame = {
    // Materialize the STRING uid before the ordinal window and partition
    // by that attribute: downstream stop-detection windows partition by
    // the same uid attribute, so Catalyst reuses ONE exchange for the
    // whole pings -> stop_events -> medians pipeline (verified in
    // explain()).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("uid")).orderBy(col("ts"), col("event_id"))
    events(spark, sfDir)
      .select(
        col("user_id").cast("string").as("uid"),
        col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w).cast("long") - lit(1L))
      .select(
        col("uid"),
        // ts is a nanosecond Long (see tune()); ns -> s truncation matches
        // the oracle's epoch_us(ts) // 1000000.
        expr("ts div 1000000000").as("timestamp"),
        col("event_id"),
        col("rn"))
      .select(
        col("uid"),
        col("timestamp"),
        (lit(19.0) + ((col("rn") / lit(8L)).cast("long") % 4).cast("double") * lit(0.01)
          + (col("event_id") % 5).cast("double") * lit(0.000002)).as("latitude"),
        (lit(-99.0) + ((col("rn") / lit(8L)).cast("long") % 4).cast("double") * lit(0.01)
          + (col("event_id") % 7).cast("double") * lit(0.000002)).as("longitude"),
        col("event_id"))
  }

  /** DuckDB CTE computing exactly [[pings]] — compose as
    * s"WITH $pingsSql SELECT ...". Table names resolve because the driver
    * registers each parquet as a view named after the table.
    */
  val pingsSql: String =
    """pings AS (
      |  SELECT uid, "timestamp",
      |    CAST(19.0 AS DOUBLE) + CAST((rn // 8) % 4 AS DOUBLE) * CAST(0.01 AS DOUBLE)
      |      + CAST(event_id % 5 AS DOUBLE) * CAST(0.000002 AS DOUBLE) AS latitude,
      |    CAST(-99.0 AS DOUBLE) + CAST((rn // 8) % 4 AS DOUBLE) * CAST(0.01 AS DOUBLE)
      |      + CAST(event_id % 7 AS DOUBLE) * CAST(0.000002 AS DOUBLE) AS longitude,
      |    event_id
      |  FROM (
      |    SELECT CAST(user_id AS VARCHAR) AS uid,
      |      epoch_us(ts) // 1000000 AS "timestamp",
      |      event_id,
      |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
      |    FROM events
      |  )
      |)""".stripMargin
}
