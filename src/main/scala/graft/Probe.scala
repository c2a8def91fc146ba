package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE coalescing floor (see Bench.scala): keeps CPU-dense tiny
      // shuffles parallel at gate scale; inert at production sizes
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "128k")
      // cached-plan AQE re-partitioning (see Bench.scala)
      .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    ev.printSchema()
    ev.show(3, truncate = false)
    Tables.pings(spark, d).show(5, truncate = false)
    val se = SparkEntry.queries("q12_stop_events")(spark, d)
    println("q12 rows=" + se.count())
    se.groupBy("stop_events").count().orderBy("stop_events").show(20)
    se.show(10)
    val em = SparkEntry.queries("q13_event_medians")(spark, d)
    println("q13 rows=" + em.count())
    em.show(10)
    spark.stop()
  }
}
