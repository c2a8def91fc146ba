package graft

import graft.operators.StopDetect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY §2 against
  * the driver tables (TESTDATA.md); `oracleSql` holds the DuckDB-equivalent
  * SQL. Column names are aliased identically on both sides (driver compare
  * sorts columns by name). Floating-point outputs are either exact by
  * construction (integer-derived doubles, medians of exact values) or
  * rounded on both sides so IEEE summation-order differences cannot flip
  * the hash.
  */
object SparkEntry {

  /** Flagship: stop-detection pipeline end-to-end on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_event_medians")(spark, "/root/testdata/sf0.001")

  // Stop-detection parameters tuned for the synthetic pings view (Tables
  // .pings): dwell sites ~8 consecutive pings, inter-ping gaps are hours.
  private val stopParams = StopDetect.Params(
    rC = 100.0, minSize = 3L, minStayingTime = 3600L,
    maxStayingTime = 7 * 86400L, metric = "haversine")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S2/P1/P4: pruned scan + filter + projection
    "q01_scan_filter" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 5)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")),

    // A1/A5: hash aggregate, partial+final
    "q02_agg_group" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))),

    // A2: exact group median
    "q03_median" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          median(col("l_quantity")).as("med_qty"),
          median(col("l_discount")).as("med_disc"))),

    // A3: group min/max on timestamps
    "q04_minmax" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))),

    // A4: exact count-distinct
    "q05_count_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))),

    // J3: enrich join (dim side broadcast) + aggregate
    "q06_join_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))),

    // J2: anti-join (NOT EXISTS)
    "q07_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // P6/P7: conditional expression buckets
    "q08_case_buckets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(
          when(col("l_quantity") <= 10, lit("small"))
            .when(col("l_quantity") <= 30, lit("mid"))
            .otherwise(lit("large")).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))),

    // W9: deterministic top-1 per group (row_number, NOT dropDuplicates)
    "q09_top1_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // W1/W3: lead over (user, time) — inter-event gap in microseconds
    "q10_lead_gap" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"))
        .withColumn("gap_us", lead("ts_us", 1).over(w) - col("ts_us"))
        .select("user_id", "event_id", "gap_us")
    }),

    // W2/W4/W5: sessionization (lag + run-start flag + cumulative sum)
    "q11_sessions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"))
        .withColumn("new_sess",
          when(col("ts_us") - lag("ts_us", 1).over(w) > 1800L * 1000000L
            || lag("ts_us", 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session_id", sum("new_sess").over(cum))
        .groupBy("user_id")
        .agg(max(col("session_id")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // Core mobility operator: stationary-event segmentation (W1-W5 + A1)
    "q12_stop_events" -> ((s, d) =>
      StopDetect.stopEvents(Tables.pings(s, d), stopParams)
        .select("uid", "timestamp", "stop_events", "latitude", "longitude")),

    // A2/A3 over the segmentation: per-stop median coords + span
    "q13_event_medians" -> ((s, d) =>
      StopDetect.eventMedians(
        StopDetect.stopEvents(Tables.pings(s, d), stopParams))),

    // R4: pivot long->wide (explicit values; conditional agg in oracle)
    "q14_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"),
          col("view").as("n_view"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("error").as("n_error"))),

    // Dedup (exact): canonical row per text key
    "q15_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies"))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity < 5""".stripMargin,

    "q02_agg_group" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_median" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty,
        |  median(l_discount) AS med_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q04_minmax" ->
      """SELECT l_linestatus, min(l_shipdate) AS min_ship,
        |  max(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q05_count_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q06_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q08_case_buckets" ->
      """SELECT CASE WHEN l_quantity <= 10 THEN 'small'
        |  WHEN l_quantity <= 30 THEN 'mid' ELSE 'large' END AS bucket,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q09_top1_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "q10_lead_gap" ->
      """SELECT user_id, event_id,
        |  lead(ts_us) OVER w - ts_us AS gap_us
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin,

    "q11_sessions" ->
      """SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT user_id, event_id, ts_us,
        |      CASE WHEN ts_us - lag(ts_us) OVER w > 1800 * 1000000
        |        OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |    FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
        |    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)))
        |GROUP BY user_id""".stripMargin,

    "q12_stop_events" -> (s"WITH ${Tables.pingsSql},\n" + stopEventsSql +
      """SELECT uid, "timestamp", stop_events, latitude, longitude
        |FROM stop_events""".stripMargin),

    "q13_event_medians" -> (s"WITH ${Tables.pingsSql},\n" + stopEventsSql +
      """SELECT uid, stop_events,
        |  median(latitude) AS latitude, median(longitude) AS longitude,
        |  min("timestamp") AS start_timestamp,
        |  max("timestamp") AS end_timestamp
        |FROM stop_events WHERE stop_events != -1
        |GROUP BY uid, stop_events""".stripMargin),

    "q14_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
        |FROM events GROUP BY user_id""".stripMargin,

    "q15_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin
  )

  /** DuckDB CTEs replicating StopDetect.stopEvents over the pings CTE —
    * shared by the mobility oracle queries. Mirrors stopParams above.
    */
  private def stopEventsSql: String =
    s"""base AS (
       |  SELECT uid, latitude, longitude, "timestamp",
       |    2 * 6371000.0 * asin(sqrt(
       |      pow(sin((radians(lead(latitude) OVER w) - radians(latitude)) / 2), 2)
       |      + cos(radians(latitude)) * cos(radians(lead(latitude) OVER w))
       |        * pow(sin((radians(lead(longitude) OVER w) - radians(longitude)) / 2), 2)
       |    )) AS distance,
       |    lead("timestamp") OVER w - "timestamp" AS time_diff
       |  FROM pings
       |  WINDOW w AS (PARTITION BY uid ORDER BY "timestamp")
       |),
       |flagged AS (
       |  SELECT *,
       |    (distance <= ${stopParams.rC}
       |      AND (time_diff IS NULL OR time_diff <= ${stopParams.maxStayingTime}))
       |      AS stationary
       |  FROM base
       |),
       |changes AS (
       |  SELECT *, CASE WHEN stationary AND NOT coalesce(
       |      lag(stationary) OVER (PARTITION BY uid ORDER BY "timestamp"),
       |      false) THEN 1 ELSE 0 END AS event_change
       |  FROM flagged
       |),
       |ids AS (
       |  SELECT *, CAST(CASE WHEN stationary THEN
       |      sum(event_change)
       |        OVER (PARTITION BY uid ORDER BY "timestamp"
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    ELSE -1 END AS BIGINT) AS event_id
       |  FROM changes
       |),
       |stop_events AS (
       |  SELECT uid, latitude, longitude, "timestamp",
       |    CAST(CASE WHEN event_id != -1
       |      AND count(*) OVER e >= ${stopParams.minSize}
       |      AND sum(time_diff) OVER e >= ${stopParams.minStayingTime}
       |    THEN event_id ELSE -1 END AS BIGINT) AS stop_events
       |  FROM ids
       |  WINDOW e AS (PARTITION BY uid, event_id)
       |)
       |""".stripMargin
}
