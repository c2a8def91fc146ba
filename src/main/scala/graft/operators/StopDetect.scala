package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stationary-event segmentation — the heart of the reference engine
  * (Stopdetect.fit_predict, src/polaroam/models.py:112-161 wrapping
  * get_stationary_events, src/polaroam/utils.py:350-413).
  *
  * Spark-first design: the reference's global sort + per-user map_groups
  * becomes window frames over (uid, timestamp) — ONE hash exchange on uid,
  * sort within partitions only, and the event-stats aggregation is a window
  * over (uid, event_id) whose required distribution is already satisfied by
  * the uid exchange, so the whole operator is a single-shuffle pipeline.
  * No joins, no per-group materialization: safe for whale users at 100 TB.
  *
  * Semantics preserved exactly (SURVEY §7 traps 3-4):
  *  - distance/time_diff are to the NEXT point (lead); the last point of a
  *    trajectory has null distance -> null stationary -> event -1;
  *  - within_time treats null time_diff as true (utils.py:358);
  *  - event ids are 1-based cumulative run starts per uid, -1 when not
  *    stationary;
  *  - an event's total_time sums forward diffs, i.e. includes the gap from
  *    the event's last row to the next (non-stop) point (utils.py:383-387);
  *  - events failing min_size/min_staying_time are invalidated to -1. The
  *    reference's left-join-on-key version (utils.py:390-400) no-ops in
  *    Polars; we implement the documented intent.
  */
object StopDetect {

  /** @param rC              stationarity radius in meters (r1)
    * @param minSize         min #pings per kept event
    * @param minStayingTime  min total event duration, seconds
    * @param maxStayingTime  max gap between consecutive stationary pings, s
    * @param metric          "haversine" (meters) or "euclidean" (degrees)
    */
  final case class Params(
      rC: Double = 20.0,
      minSize: Long = 2L,
      minStayingTime: Long = 300L,
      maxStayingTime: Long = 3600L,
      metric: String = "haversine")

  /** pings(uid, latitude, longitude, timestamp [, ...]) ->
    * (uid, stop_events, latitude, longitude, timestamp).
    *
    * `stop_events` is -1 for non-stationary rows. Unlike the reference we
    * keep latitude/longitude as flat columns rather than the 2-array
    * `event_maps` (models.py:136) — the array was a Polars schema artifact;
    * [[withEventMaps]] restores it for API parity.
    */
  def stopEvents(pings: DataFrame, p: Params): DataFrame = {
    val byUser = Window.partitionBy("uid").orderBy("timestamp")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Same uid-hash distribution as `byUser` => no second exchange.
    val byEvent = Window.partitionBy("uid", "event_id")

    val dist = p.metric match {
      case "euclidean" => GeoFunctions.euclideanDegrees(
        col("latitude"), col("longitude"),
        lead("latitude", 1).over(byUser), lead("longitude", 1).over(byUser))
      case _ => GeoFunctions.haversineMeters(
        col("latitude"), col("longitude"),
        lead("latitude", 1).over(byUser), lead("longitude", 1).over(byUser))
    }

    pings
      .select(col("uid"), col("latitude"), col("longitude"), col("timestamp"))
      .withColumn("distance", dist)
      .withColumn("time_diff",
        lead("timestamp", 1).over(byUser) - col("timestamp"))
      // null distance (trajectory end) -> null stationary -> not an event
      .withColumn("stationary",
        (col("distance") <= p.rC) &&
          (col("time_diff").isNull || col("time_diff") <= p.maxStayingTime))
      .withColumn("event_change",
        (col("stationary") &&
          !coalesce(lag("stationary", 1).over(byUser), lit(false)))
          .cast("int"))
      .withColumn("event_id",
        when(col("stationary"), sum("event_change").over(cum)).otherwise(-1L))
      .withColumn("event_size", count(lit(1)).over(byEvent))
      .withColumn("total_time", sum("time_diff").over(byEvent))
      .withColumn("stop_events",
        when(col("event_id") =!= -1L &&
          col("event_size") >= p.minSize &&
          col("total_time") >= p.minStayingTime, col("event_id"))
          .otherwise(-1L).cast("long"))
      .select("uid", "stop_events", "latitude", "longitude", "timestamp")
  }

  /** Reference-shaped output with event_maps = [lat, lon]
    * (models.py:133-138).
    */
  def withEventMaps(stopEvents: DataFrame): DataFrame =
    stopEvents.select(
      col("uid"), col("stop_events"),
      array(col("latitude"), col("longitude")).as("event_maps"),
      col("timestamp"))

  /** Per-(uid, stop_events) median coordinates and time span
    * (compute_label_medians, src/polaroam/models.py:163-177).
    * Exact median — required for oracle parity (SURVEY §7 trap 9).
    */
  def eventMedians(stopEvents: DataFrame): DataFrame =
    stopEvents
      .filter(col("stop_events") =!= -1L)
      .groupBy("uid", "stop_events")
      .agg(
        median(col("latitude")).as("latitude"),
        median(col("longitude")).as("longitude"),
        min(col("timestamp")).as("start_timestamp"),
        max(col("timestamp")).as("end_timestamp"))
}
