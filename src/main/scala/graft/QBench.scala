package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual queries. Usage: QBench <sfDir> <name...> */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE coalescing floor (see Bench.scala): keeps CPU-dense tiny
      // shuffles parallel at gate scale; inert at production sizes
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "128k")
      // Let AQE re-partition cached-plan materializations too (default
      // false): the repo's operator persists otherwise materialize at the
      // session's full shuffle width and every InMemoryTableScan consumer
      // inherits it — measured r13: q17 3.3->2.5 s, q245 2.9->1.9 s with
      // the flag on, no regressions (results are partitioning-blind).
      .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    args.tail.foreach { name =>
      val t0 = System.nanoTime(); val g0 = gcMs
      val h = Bench.force(SparkEntry.queries(name)(spark, sfDir))
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"(gc ${gcMs - g0} ms, hash $h)")
    }
    spark.stop()
  }
}
