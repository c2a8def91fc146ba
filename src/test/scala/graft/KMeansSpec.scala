package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Clustering

/** Integer-exact Lloyd k-means (q145's operator).
  *
  * The random-parity test re-implements the ENTIRE contract in plain
  * Scala — same quantization rounding (BigDecimal HALF_UP, Spark's round
  * semantics), same md5-ordered seed, same integer argmin with ties to
  * the smaller centroid, same (2s+n)/(2n) round-half-up mean, same
  * keep-previous empty-centroid rule — and demands bit-identical
  * (cluster, dist) per vector. Any nondeterminism (float drift,
  * partition-order sums, tie instability) fails it.
  */
class KMeansSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def df(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, v) => Row(id, v) }, 2),
      schema)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Spark-round-parity quantization: HALF_UP on the exact double. */
  private def quant(x: Double, offset: Double, scale: Double): Long =
    new JBigDecimal((x + offset) * scale)
      .setScale(0, RoundingMode.HALF_UP).longValue()

  /** Independent in-memory twin of the full Lloyd contract. */
  private def naive(rows: Seq[(Long, Seq[Float])], k: Int, dim: Int,
                    rounds: Int, offset: Double = 1.0,
                    scale: Double = 10000.0): Map[Long, (Long, Long)] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => quant(x.toDouble, offset, scale)).toArray
    }
    var cents: Array[Array[Long]] = q
      .sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k).map(_._2.map(identity)).toArray
    def dist(a: Array[Long], b: Array[Long]): Long =
      (0 until dim).map(d => (a(d) - b(d)) * (a(d) - b(d))).sum
    def assign(v: Array[Long]): (Int, Long) =
      cents.zipWithIndex
        .map { case (c, j) => (j, dist(v, c)) }
        .minBy { case (j, dd) => (dd, j) } match { case (j, dd) => (j, dd) }
    for (_ <- 1 to rounds) {
      val byCl = q.groupBy { case (_, v) => assign(v)._1 }
      cents = cents.zipWithIndex.map { case (old, j) =>
        byCl.get(j) match {
          case None => old
          case Some(pts) =>
            val n = pts.size.toLong
            Array.tabulate(dim) { d =>
              val s = pts.map(_._2(d)).sum
              (2L * s + n) / (2L * n)
            }
        }
      }
    }
    q.map { case (id, v) =>
      val (j, dd) = assign(v)
      id -> ((j + 1).toLong, dd)
    }.toMap
  }

  private def run(rows: Seq[(Long, Seq[Float])], k: Int, dim: Int,
                  rounds: Int): Map[Long, (Long, Long)] = {
    val out = Clustering.kMeansLloyd(df(rows), "vec_id", "embedding",
      k = k, dim = dim, rounds = rounds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    CacheScope.releaseAll()
    out
  }

  test("two obvious blobs separate, regardless of seed draw") {
    val blobA = (0L until 10L).map(i =>
      i -> Seq(0.4f + 0.001f * i, 0.4f))
    val blobB = (10L until 20L).map(i =>
      i -> Seq(-0.4f - 0.001f * (i - 10), -0.4f))
    val got = run(blobA ++ blobB, k = 2, dim = 2, rounds = 4)
    val clustersA = blobA.map(p => got(p._1)._1).toSet
    val clustersB = blobB.map(p => got(p._1)._1).toSet
    assert(clustersA.size == 1 && clustersB.size == 1)
    assert(clustersA != clustersB)
  }

  test("random-parity: bit-identical to the in-memory twin") {
    val rnd = new scala.util.Random(42)
    val dim = 8
    val rows = (0L until 200L).map(i =>
      i -> Seq.fill(dim)(rnd.nextFloat() - 0.5f))
    val want = naive(rows, k = 5, dim = dim, rounds = 3)
    val got = run(rows, k = 5, dim = dim, rounds = 3)
    assert(got == want)
  }

  test("deterministic across runs") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map(i =>
      i -> Seq.fill(4)(rnd.nextFloat() - 0.5f))
    val a = run(rows, k = 3, dim = 4, rounds = 2)
    val b = run(rows, k = 3, dim = 4, rounds = 2)
    assert(a == b)
  }

  test("train/apply split: assignWithModel on the training frame equals " +
    "kMeansLloyd; a held-out vector scores against the trained model") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 80L).map(i =>
      i -> Seq.fill(4)(rnd.nextFloat() - 0.5f))
    val fitted = run(rows, k = 3, dim = 4, rounds = 3)
    val cents = Clustering.lloydCentroids(df(rows), "vec_id", "embedding",
      k = 3, dim = 4, rounds = 3)
    CacheScope.releaseAll()
    val applied = Clustering.assignWithModel(
        df(rows), "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(applied === fitted)
    // a held-out vector equal to centroid 0 (de-quantized) must land in
    // a cluster at distance <= the quantization residual bound: dim *
    // ceil(scale-rounding error)^2 — with components taken EXACTLY on
    // the grid, distance 0 at its own centroid or a tie-winner
    val c0 = cents(0).map(q => (q / 10000.0 - 1.0).toFloat).toSeq
    val held = Clustering.assignWithModel(
        df(Seq(999L -> c0)), "vec_id", "embedding", cents)
      .collect().head
    assert(held.getLong(0) === 999L)
    assert(held.getLong(2) <= 4L) // per-dim re-quantize residual <= 1
  }

  test("fused ArgminDistance key matches the composed least-of-sums form") {
    val rnd = new scala.util.Random(99)
    val dim = 7
    val cents = Array.fill(4)(Array.fill(dim)(rnd.nextInt(2000).toLong))
    val rows = (0L until 100L).map(i =>
      i -> Seq.fill(dim)(rnd.nextFloat() - 0.5f))
    val q = df(rows).select(col("vec_id"),
      Clustering.quantize(col("embedding"), 1.0, 10000.0).as("qv"))
    val both = q.select(col("vec_id"),
      graft.plans.ArgminDistance(col("qv"), cents).as("fused"),
      Clustering.composedAkey(col("qv"), cents).as("composed"))
      .collect()
    assert(both.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("ArgminDistance: null element and ragged width return null") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cents = Array(Array(1L, 2L))
    assert(graft.plans.ArgminDistance.compute(
      new GenericArrayData(Array[Any](1L, null)), cents) == null)
    assert(graft.plans.ArgminDistance.compute(
      new GenericArrayData(Array[Any](1L, 2L, 3L)), cents) == null)
    assert(graft.plans.ArgminDistance.compute(
      new GenericArrayData(Array[Any](1L, 2L)), cents) == 0L)
  }

  test("empty centroid keeps its seed position") {
    // two tight far-apart blobs, k=3: one seed centroid starves after
    // round 1 (both blobs capture everything) and must stay put — the
    // in-memory twin implements the same rule, so parity covers it, but
    // this pins the behavior on a case CONSTRUCTED to starve.
    val blobA = (0L until 8L).map(i => i -> Seq(0.45f, 0.45f))
    val blobB = (8L until 16L).map(i => i -> Seq(-0.45f, -0.45f))
    val rows = blobA ++ blobB
    val want = naive(rows, k = 3, dim = 2, rounds = 3)
    val got = run(rows, k = 3, dim = 2, rounds = 3)
    assert(got == want)
    assert(got.values.map(_._1).toSet.size <= 3)
  }
}
