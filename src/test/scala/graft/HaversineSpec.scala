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

  test("jaro_winkler available from SQL after registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s")
      .collect().head.getDouble(0)
    assert(math.abs(r - 0.9611111111111111) < 1e-12)
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

  test("vector/dedup expressions available from SQL; SQL = Column API") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT
        long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        cosine_ge(array(3L, 4L), array(3L, 4L), 25L, 25L, 1L, 1L) AS exact1,
        cosine_ge(array(3L, 4L), array(4L, -3L), 25L, 25L, 1L, 10L) AS orth,
        int8_cosine(array(127, 0), array(127, 0)) AS i8
      """).collect().head
    assert(r.getLong(0) === 32L)
    assert(r.getBoolean(1))   // cos = 1 >= 1
    assert(!r.getBoolean(2))  // dot = 0 -> false
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    // SQL minhash/lsh/shingles equal the Column-API expressions the
    // dedup/ANN operators run — same class, same literals
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(("w1 w2 w3 w4 w5", Seq(0.3, -0.7, 0.2)),
      ("a b c d e f", Seq(-0.1, 0.9, 0.4))).toDF("text", "emb")
    docs.createOrReplaceTempView("graft_ext_docs")
    val viaSql = spark.sql("""
      SELECT minhash_signature(text, 3, 8) AS sig,
             lsh_bucket(emb, 2, 7L) AS b,
             word_shingle_hashes(split(text, ' '), 2) AS sh
      FROM graft_ext_docs""").collect()
    val viaCol = docs.select(
      graft.plans.MinhashSignature(col("text"), 3, 8).as("sig"),
      graft.plans.LshBucket(col("emb"), 2, 7L).as("b"),
      graft.plans.WordShingleHashes(split(col("text"), " "), 2).as("sh"))
      .collect()
    assert(viaSql.map(_.toString) === viaCol.map(_.toString))
    spark.catalog.dropTempView("graft_ext_docs")
  }

  test("config parameters must be literals: clear resolution error") {
    graft.plans.GraftExtensions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT minhash_signature('x', cast(rand() * 3 as int), 8)")
        .collect()
    }
    assert(ex.getMessage.contains("literal"))
  }
}
