package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for the heavy queries. */
object Plans {
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
    val which = if (args.nonEmpty) args.toSeq
      else Seq("q12_stop_events", "q13_event_medians", "q16_stop_clusters",
        "q17_home_work", "q01_scan_filter", "q24_cosine_topk")
    which.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
