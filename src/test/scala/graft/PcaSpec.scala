package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matches a hand computation on a tiny exact input") {
    // values chosen exactly representable at the 1e6 quantization
    val df = Seq(
      (Array(1.0f, 0.0f), 0),
      (Array(2.0f, 1.0f), 0),
      (Array(3.0f, 2.0f), 0),
      (Array(4.0f, 7.0f), 0))
      .toDF("embedding", "label")
    val out = Pca.leadingComponentCertified(spark, df, "embedding", dims = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // means: x=2.5, y=2.5; cov_xx = E[x^2]-25/4 = (1+4+9+16)/4 - 6.25 = 1.25
    // cov_xy = E[xy]-6.25 = (0+2+6+28)/4 - 6.25 = 2.75
    // cov_yy = (0+1+4+49)/4 - 6.25 = 7.25
    assert(math.abs(out((0L, 0L)) - 1.25) < 1e-9)
    assert(math.abs(out((0L, 1L)) - 2.75) < 1e-9)
    assert(math.abs(out((1L, 1L)) - 7.25) < 1e-9)
  }

  test("certificate holds on the real embeddings table") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Pca.leadingComponentCertified(spark, df, "embedding", 8)
      .collect()
    assert(rows.length === 36) // upper triangle of 8x8
    assert(rows.forall(_.getBoolean(3)), "pc1 residual certificate")
    // diagonal variances are positive
    val diag = rows.filter(r => r.getLong(0) == r.getLong(1))
    assert(diag.length === 8)
    diag.foreach(r => assert(r.getDouble(2) > 0))
  }
}
