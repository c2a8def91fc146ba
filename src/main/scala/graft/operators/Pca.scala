package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leading-principal-component extraction over an embedding column —
  * the whitening / dominant-direction-removal step of embedding
  * pipelines (e.g. post-processing sentence embeddings by removing the
  * top PCA direction).
  *
  * Exactness split, in the repo's certificate style (cf. q82's CC
  * certificate): the COVARIANCE MATRIX is integer-exact — coordinates
  * quantize to round(x·10^6) longs in one distributed pass, and
  * cov_ij = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / (n²·10^12) is an exact integer
  * rational that the oracle recomputes bit-for-bit (DECIMAL numerator,
  * one double division, round 6). The EIGENVECTOR is driver math on the
  * dims×dims matrix (power iteration, deterministic start/iteration
  * count) and is certified, not oracled: `pc1_ok` asserts the residual
  * ‖Cv − λv‖∞ ≤ tol·max(|λ|,1) and the oracle pins it true.
  *
  * Scale: the only distributed work is ONE aggregate producing
  * 1 + dims + dims(dims+1)/2 longs — no shuffle of vectors, nothing
  * driver-side but the k×k matrix. Quantized cross-products stay exact
  * in BIGINT while n·(qmax)² < 2^63 (qmax ~ 4e5 here → n up to ~5e7;
  * past that, widen the sums to DECIMAL).
  */
object Pca {

  /** Upper-triangle covariance rows (i, j, cov, pc1_ok) over the first
    * `dims` coordinates of `vecCol`.
    */
  def leadingComponentCertified(spark: SparkSession, df: DataFrame,
                                vecCol: String, dims: Int,
                                maxIters: Int = 100000,
                                tol: Double = 1e-9): DataFrame = {
    require(dims > 1, "need at least 2 dims")
    val q: Seq[Column] = (0 until dims).map { i =>
      round(element_at(col(vecCol), i + 1).cast("double") * 1e6, 0)
        .cast("long").as(s"q$i")
    }
    val base = df.select(q: _*)
    val pairs = for { i <- 0 until dims; j <- i until dims } yield (i, j)
    val aggs: Seq[Column] =
      count(lit(1)).as("n") +:
        (0 until dims).map(i => sum(col(s"q$i")).as(s"s$i")) ++:
        pairs.map { case (i, j) =>
          sum(col(s"q$i") * col(s"q$j")).as(s"p${i}_$j")
        }
    val row = base.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getAs[Long]("n")
    require(n > 0, "empty input")
    val s = (0 until dims).map(i => row.getAs[Long](s"s$i"))
    // exact integer numerator in BigInt; ONE double division at the end
    // (cast + divide are correctly rounded IEEE ops — engine-portable)
    val cov = Array.tabulate(dims, dims) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      val p = row.getAs[Long](s"p${lo}_$hi")
      val num = BigInt(n) * BigInt(p) - BigInt(s(i)) * BigInt(s(j))
      val den = BigInt(n) * BigInt(n) * BigInt(1000000000000L)
      num.toDouble / den.toDouble
    }
    // power iteration from a deterministic start until the residual
    // certificate holds (convergence rate is (λ2/λ1)^k, so a small
    // spectral gap needs many rounds — each is 2·dims² driver flops,
    // negligible); dims×dims driver math, fully deterministic doubles
    def matVec(x: Array[Double]): Array[Double] =
      Array.tabulate(dims)(i => (0 until dims).map(j => cov(i)(j) * x(j)).sum)
    var v = Array.tabulate(dims)(i => if (i == 0) 1.0 else 0.0)
    var it = 0
    var resid = Double.MaxValue
    var lambda = 0.0
    while (it < maxIters && !(resid <= tol * math.max(math.abs(lambda), 1.0))) {
      val w = matVec(v)
      val norm = math.sqrt(w.map(x => x * x).sum)
      require(norm > 0, "zero covariance matrix")
      v = w.map(_ / norm)
      val cv = matVec(v)
      lambda = (0 until dims).map(i => v(i) * cv(i)).sum
      resid = (0 until dims).map(i => math.abs(cv(i) - lambda * v(i))).max
      it += 1
    }
    val ok = resid <= tol * math.max(math.abs(lambda), 1.0)
    import spark.implicits._
    pairs.map { case (i, j) =>
      (i.toLong, j.toLong,
        BigDecimal(cov(i)(j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, ok)
    }.toDF("i", "j", "cov", "pc1_ok")
  }
}
