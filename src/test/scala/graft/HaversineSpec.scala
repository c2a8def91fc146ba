package graft

import graft.functions.GeoFunctions
import graft.plans.Haversine
import org.apache.spark.sql.functions._

class HaversineSpec extends SparkSpec {
  import spark.implicits._

  test("native expression is bit-identical to the composed builtins") {
    val pts = Tables.pings(spark, "/root/testdata/sf0.001")
      .limit(500)
      .select(col("latitude").as("a"), col("longitude").as("b"),
        (col("latitude") + 0.01).as("c"), (col("longitude") - 0.02).as("d"))
    val diff = pts.select(
      Haversine.distanceMeters(col("a"), col("b"), col("c"), col("d"))
        .as("native"),
      GeoFunctions.haversineMetersComposed(col("a"), col("b"), col("c"),
        col("d")).as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(diff === 0L)
  }

  test("null propagation and known value") {
    val r = Seq((19.0, -99.0, 19.1, -99.1))
      .toDF("a", "b", "c", "d")
      .select(
        Haversine.distanceMeters(col("a"), col("b"), col("c"), col("d"))
          .as("d1"),
        Haversine.distanceMeters(lit(null).cast("double"), col("b"),
          col("c"), col("d")).as("d2"))
      .collect().head
    // ~15.3 km for 0.1 deg lat + 0.1 deg lon at 19N
    assert(r.getDouble(0) > 15000 && r.getDouble(0) < 16000)
    assert(r.isNullAt(1))
  }

  test("stays inside whole-stage codegen") {
    // needs a real scan: a literal LocalRelation constant-folds away
    val df = Tables.pings(spark, "/root/testdata/sf0.001")
      .select(Haversine.distanceMeters(col("latitude"), col("longitude"),
        lit(19.0), lit(-99.0)).as("h"))
      .filter(col("h") > 0)
    // collect() (not count()) so THIS frame's query execution finalizes;
    // AQE's final plan marks whole-stage-codegen membership with "*(n)"
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) (Project|Filter) \[?haversine""".r
      .findFirstIn(plan).isDefined, s"no codegen'd haversine in:\n$plan")
  }
}

class GraftExtensionsSpec extends SparkSpec {
  test("haversine_m available from SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT haversine_m(19.0D, -99.0D, 19.1D, -99.0D) AS d")
      .collect().head.getDouble(0)
    assert(r > 11000 && r < 11200) // ~11.1 km per 0.1 deg latitude
  }

  test("cosine_sim available from SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val o = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS s")
      .collect().head.getDouble(0)
    assert(math.abs(o) < 1e-12)
  }
}
