package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("join and groupBy on the bucket key are exchange-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket")
      .toFile.getAbsolutePath
    val facts = (1L to 5000L).map(i => (i % 97, i)).toDF("uid", "v")
    val dims = (0L to 96L).map(i => (i, s"u$i")).toDF("uid", "name")
    try {
      Bucketing.writeBucketed(facts, "b_facts", s"$dir/facts", "uid", 8)
      Bucketing.writeBucketed(dims, "b_dims", s"$dir/dims", "uid", 8)
      val f = spark.table("b_facts")
      val d = spark.table("b_dims")

      // co-located join: both sides bucketed by uid x8 -> no shuffle on
      // either side (disable auto-broadcast so the join is sort-merge)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = f.join(d, "uid").groupBy("name")
          .agg(sum("v").as("total"))
        assert(joined.count() === 97)
        val plan = joined.queryExecution.executedPlan.toString
        // one exchange for the groupBy on name is allowed; the JOIN
        // itself must not shuffle either bucketed side
        val joinOnly = f.join(d, "uid").select("uid", "v", "name")
        assert(exchanges(joinOnly) === 0,
          s"expected exchange-free bucketed join:\n" +
            joinOnly.queryExecution.executedPlan.toString)
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      // groupBy on the bucket key: partial+final collapse, no exchange
      val agg = f.groupBy("uid").agg(count(lit(1)).as("n"))
      assert(exchanges(agg) === 0,
        s"expected exchange-free bucketed agg:\n" +
          agg.queryExecution.executedPlan.toString)
      assert(agg.count() === 97)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("q105 rebuilds its bucketed tables when the catalog entry " +
    "outlives the staged data") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q105_bucketed_join")
    val first = q(spark, d)
    assert(first.count() === 5)
    // simulate the cross-session failure mode: the derby metastore
    // persists in the working dir, but Staging's shutdown hook removes
    // the staged temp dirs at JVM exit — the next session then sees
    // tableExists=true over a deleted location and scans empty. Here:
    // empty both table locations in-place, then re-run the query.
    val tag = d.replaceAll("[^a-zA-Z0-9]", "_")
    for (t <- Seq(s"graft_q105_orders$tag", s"graft_q105_li$tag")) {
      val loc = new java.net.URI(spark.sql(s"DESCRIBE FORMATTED $t")
        .filter(col("col_name") === "Location")
        .select("data_type").head().getString(0))
      val dir = new java.io.File(loc.getPath)
      assert(dir.exists(), s"expected a live location for $t at $dir")
      graft.streaming.StreamSessions.deleteRecursively(dir)
      assert(!dir.exists())
    }
    // refresh cached file listings so the scan reflects the deletion
    // (a fresh session has no such cache; this keeps the simulation
    // honest inside one JVM)
    spark.sql("CLEAR CACHE")
    val again = q(spark, d)
    assert(again.count() === 5,
      "q105 must detect the stale catalog entry and rebuild")
  }
}
