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

  test("maxClusterSize guard trips before the pair join") {
    val d = df((1L to 10L).map(i => i -> Seq(1.0f, 0.0f, 0.0f, 0.0f)))
    val ex = intercept[IllegalArgumentException] {
      Clustering.semDedup(d, "vec_id", "embedding",
        k = 1, dim = 4, rounds = 1, maxClusterSize = 5)
    }
    assert(ex.getMessage.contains("largest cluster"))
  }
}
