package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Clustering

/** SemDeDup (q154's operator): intra-cluster cosine pruning on top of
  * the q145 clusters. The fixtures steer the k-means seed with vector
  * geometry (k = 1 or 2 collapses the trajectory), so the assertions
  * target the PRUNE contract — KMeansSpec already pins the clustering.
  */
class SemDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def df(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v) }, 2),
      schema)

  private def keptMap(out: org.apache.spark.sql.DataFrame)
  : Map[Long, Boolean] =
    out.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("positive scalar multiples are cosine-1 dups; smallest id wins") {
    // 1 and 2 are parallel (cos = 1 > any tau); 3 is orthogonal.
    val d = df(Seq(
      1L -> Seq(0.5f, 0.0f, 0.0f, 0.0f),
      2L -> Seq(0.9f, 0.0f, 0.0f, 0.0f),
      3L -> Seq(0.0f, 0.8f, 0.0f, 0.0f)))
    val out = Clustering.semDedup(d, "vec_id", "embedding",
      k = 1, dim = 4, rounds = 1, tauNum = 19, tauDen = 20)
    assert(keptMap(out) === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("the drop rule is transitive through the smallest id, not chained") {
    // Three mutual near-dups in one cluster: only the smallest survives
    // (2 and 3 each have a smaller near-dup, regardless of each other).
    val d = df(Seq(
      1L -> Seq(1.0f, 0.01f, 0.0f, 0.0f),
      2L -> Seq(1.0f, 0.0f, 0.01f, 0.0f),
      3L -> Seq(1.0f, 0.0f, 0.0f, 0.01f)))
    val out = Clustering.semDedup(d, "vec_id", "embedding",
      k = 1, dim = 4, rounds = 1, tauNum = 9, tauDen = 10)
    assert(keptMap(out) === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("identical vectors in different clusters are never pruned") {
    // Two tight groups far apart; with k = 2 the trajectory separates
    // them. Ids 10/20 are identical but land in different clusters, so
    // both survive; their in-cluster copies (11/21) are pruned against
    // them only.
    val d = df(Seq(
      10L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      11L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      20L -> Seq(-1.0f, 0.0f, 0.0f, 0.0f),
      21L -> Seq(-1.0f, 0.0f, 0.0f, 0.0f)))
    val out = Clustering.semDedup(d, "vec_id", "embedding",
      k = 2, dim = 4, rounds = 2, tauNum = 19, tauDen = 20)
    val m = keptMap(out)
    val clusters = out.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(10L) !== clusters(20L))
    assert(clusters(10L) === clusters(11L))
    assert(m(10L) && m(20L))
    assert(!m(11L) && !m(21L))
    // Opposite vectors have dot < 0: never dups even at tau = 0.
    val loose = Clustering.semDedup(d, "vec_id", "embedding",
      k = 1, dim = 4, rounds = 1, tauNum = 0L max 1L, tauDen = 1000L)
    val lm = keptMap(loose)
    assert(lm(10L) && lm(20L) && !lm(11L) && !lm(21L))
  }

  test("threshold boundary is exact: cos = tau prunes, just under keeps") {
    // a = (3,4)/5 and b = (1,0): cos = 3/5 exactly (integers survive the
    // x1000 quantization exactly). tau = 3/5 -> drop; tau = 601/1000 ->
    // keep. No float epsilon on the boundary.
    val d = df(Seq(
      1L -> Seq(0.6f, 0.8f, 0.0f, 0.0f),
      2L -> Seq(1.0f, 0.0f, 0.0f, 0.0f)))
    val at = Clustering.semDedup(d, "vec_id", "embedding",
      k = 1, dim = 4, rounds = 1, tauNum = 3, tauDen = 5)
    assert(keptMap(at) === Map(1L -> true, 2L -> false))
    val above = Clustering.semDedup(d, "vec_id", "embedding",
      k = 1, dim = 4, rounds = 1, tauNum = 601, tauDen = 1000)
    assert(keptMap(above) === Map(1L -> true, 2L -> true))
  }

  test("LongDot equals the composed zip_with/aggregate form; null rules") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(200) { i =>
      Row(i.toLong,
        Seq.fill(16)(rnd.nextInt(4001).toLong - 2000L),
        Seq.fill(16)(rnd.nextInt(4001).toLong - 2000L))
    }
    val sch = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(LongType)),
      StructField("b", ArrayType(LongType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), sch)
    val both = df.select(col("id"),
      graft.plans.LongDot(col("a"), col("b")).as("fused"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() === 0L)
    // null array, null element, length mismatch => null
    val edge = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null, Seq(1L, 2L), null),
        Row(2L, Seq(1L, null), Seq(1L, 2L), null),
        Row(3L, Seq(1L, 2L, 3L), Seq(1L, 2L), null)), 1),
      StructType(sch.fields :+ StructField("exp", LongType)))
    val out = edge.select(
      graft.plans.LongDot(col("a"), col("b")).as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("CosineGE equals the composed decimal cross-multiplication") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300) { i =>
      Row(i.toLong,
        Seq.fill(16)(rnd.nextInt(2001).toLong - 1000L),
        Seq.fill(16)(rnd.nextInt(2001).toLong - 1000L))
    }
    val sch = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(LongType)),
      StructField("b", ArrayType(LongType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), sch)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // random taus straddle the observed cosine range, including exact hits
    for ((tn, td) <- Seq((1L, 100L), (1L, 5L), (2L, 5L), (9L, 10L))) {
      val na2 = graft.plans.LongDot(col("a"), col("a"))
      val nb2 = graft.plans.LongDot(col("b"), col("b"))
      val dot = graft.plans.LongDot(col("a"), col("b"))
      val both = df.select(
        graft.plans.CosineGE(col("a"), col("b"), na2, nb2, tn, td)
          .as("fused"),
        (dot > 0 &&
          dec(lit(td * td)) * dec(dot) * dec(dot) >=
            dec(lit(tn * tn)) * dec(na2) * dec(nb2)).as("composed"))
      assert(both.filter(col("fused") =!= col("composed")).count() === 0L,
        s"tau = $tn/$td")
      assert(both.filter(col("fused")).count() > 0L ||
        tn * 10 >= td * 9, s"dead accept arm at tau = $tn/$td")
    }
    // ragged/null-element pairs are FALSE (join predicate semantics);
    // null arrays are NULL
    val edge = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1L, 2L, 3L), Seq(1L, 2L), java.lang.Boolean.FALSE),
        Row(2L, Seq(1L, null), Seq(1L, 2L), java.lang.Boolean.FALSE),
        Row(3L, null, Seq(1L, 2L), null)), 1),
      StructType(Seq(
        StructField("id", LongType),
        StructField("a", ArrayType(LongType)),
        StructField("b", ArrayType(LongType)),
        StructField("exp", BooleanType))))
    val out = edge.select(col("exp"),
      graft.plans.CosineGE(col("a"), col("b"), lit(14L), lit(5L), 1L, 2L)
        .as("got")).collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getBoolean(0) === r.getBoolean(1))
    }
  }

  test("maxClusterSize guard trips before the pair join") {
    val d = df((1L to 10L).map(i => i -> Seq(1.0f, 0.0f, 0.0f, 0.0f)))
    val ex = intercept[IllegalArgumentException] {
      Clustering.semDedup(d, "vec_id", "embedding",
        k = 1, dim = 4, rounds = 1, maxClusterSize = 5)
    }
    assert(ex.getMessage.contains("largest cluster"))
  }
}
