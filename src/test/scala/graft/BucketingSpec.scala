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
}
