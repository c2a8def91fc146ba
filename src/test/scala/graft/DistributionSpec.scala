package graft

import graft.operators.Distribution
import org.apache.spark.sql.functions._

class DistributionSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation: independent facets -> ~0, identical -> NMI 1") {
    // a uniform over 4, b = a (identical) vs b independent of a
    val rows = for (i <- 0 until 256) yield (s"a${i % 4}", s"b${i % 4}",
      s"c${(i / 4) % 4}")
    val df = rows.toDF("a", "same", "indep")
    val ident = Distribution.mutualInformation(df, "a", "same")
      .collect().head
    // identical facets: MI = H(a) = ln 4, NMI = 1
    assert(math.abs(ident.getDouble(0) - math.log(4)) < 1e-6)
    assert(math.abs(ident.getDouble(3) - 1.0) < 1e-6)
    val indep = Distribution.mutualInformation(df, "a", "indep")
      .collect().head
    assert(math.abs(indep.getDouble(0)) < 1e-6, "independent facets MI=0")
    assert(math.abs(indep.getDouble(1) - math.log(4)) < 1e-6)
  }

  test("ksTest: identical samples D=0; disjoint ranges D=1 significant") {
    val same = (1L to 300L).flatMap(v => Seq((v, true), (v, false)))
      .toDF("cents", "c1")
    val r1 = Distribution.ksTest(same, "cents", col("c1")).collect().head
    assert(r1.getAs[Long]("d_num") === 0L)
    assert(!r1.getAs[Boolean]("significant"))
    val disjoint = ((1L to 300L).map(v => (v, true)) ++
      (1001L to 1300L).map(v => (v, false))).toDF("cents", "c1")
    val r2 = Distribution.ksTest(disjoint, "cents", col("c1"))
      .collect().head
    assert(r2.getAs[Double]("ks_stat") === 1.0)
    assert(r2.getAs[Boolean]("significant"))
  }

  test("ksTest matches a driver-side exact computation on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("purchase", "click"))
      .select(expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
        (col("event_type") === "purchase").as("c1"))
    val got = Distribution.ksTest(ev, "cents", col("c1")).collect().head
    val rows = ev.collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val s1 = rows.filter(_._2).map(_._1).sorted
    val s2 = rows.filterNot(_._2).map(_._1).sorted
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    val dNum = (s1 ++ s2).distinct.map { c =>
      math.abs(s1.count(_ <= c) * n2 - s2.count(_ <= c) * n1)
    }.max
    assert(got.getAs[Long]("n1") === n1)
    assert(got.getAs[Long]("n2") === n2)
    assert(got.getAs[Long]("d_num") === dNum)
  }

  test("concentration: uniform -> gini 0 / hhi 1/n; skew raises both") {
    val uniform = (1 to 10).map(i => ("g", s"u$i", 100L))
      .toDF("grp", "unit", "w")
    val u = Distribution.concentration(uniform, "grp", "unit", "w")
      .collect().head
    assert(u.getAs[Double]("gini") === 0.0)
    assert(math.abs(u.getAs[Double]("hhi") - 0.1) < 1e-9)
    // one unit holds 910 of 1000: hand-computed exact rationals
    val skew = ((1 to 9).map(i => ("g", s"u$i", 10L)) :+ ("g", "u_big", 910L))
      .toDF("grp", "unit", "w")
    val s = Distribution.concentration(skew, "grp", "unit", "w")
      .collect().head
    // ranks: the nine 10s get i=1..9 (ties by unit), big gets i=10
    // siw = 10*(1+..+9) + 10*910 = 450 + 9100 = 9550
    // gini = (2*9550 - 11*1000) / (10*1000) = 8100/10000 = 0.81
    assert(math.abs(s.getAs[Double]("gini") - 0.81) < 1e-9)
    // hhi = (9*100 + 910^2)/1000^2 = 829000/1000000? no: 9*10^2=900
    // (900 + 828100)/1e6 = 0.829
    assert(math.abs(s.getAs[Double]("hhi") - 0.829) < 1e-9)
  }

  test("quantileNormalize: rank-preserving within group, shared reference") {
    // group A values 1..100, group B values 1001..1100 (shifted): after
    // normalization both groups map onto the SAME per-bin reference
    val df = ((1 to 100).map(v => ("A", v.toLong, v.toLong)) ++
      (1 to 100).map(v => ("B", 100L + v, 1000L + v)))
      .toDF("grp", "id", "v")
    val out = Distribution.quantileNormalize(df, "grp", "id", "v", 10)
    val rows = out.collect()
    assert(rows.length === 200)
    val byGroup = rows.groupBy(_.getString(1))
    // each group hits every bin 10 times
    for ((_, rs) <- byGroup) {
      val bins = rs.map(_.getAs[Long]("bin"))
      assert(bins.distinct.sorted.toSeq === (1L to 10L))
    }
    // same bin -> same normalized value regardless of group
    val byBin = rows.groupBy(_.getAs[Long]("bin"))
    for ((_, rs) <- byBin)
      assert(rs.map(_.getAs[Double]("norm_value")).distinct.length === 1)
    // bin means: bin k holds A's 10(k-1)+1..10k and B's +1000 versions,
    // so the reference is the shifted midpoint mean
    val b1 = rows.find(r => r.getAs[Long]("bin") == 1L).get
    assert(math.abs(b1.getAs[Double]("norm_value") - (5.5 + 1005.5) / 2)
      < 1e-9)
  }

  test("ipfBalance converges toward uniform marginals") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Distribution.ipfBalance(df, "lang", "source", iters = 8)
      .collect()
    val n = out.map(_.getAs[Long]("n")).sum.toDouble
    val nLang = out.map(_.getString(0)).distinct.length
    val nSrc = out.map(_.getString(1)).distinct.length
    val rowSums = out.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getAs[Double]("weight")).sum }
    // after the final COLUMN scaling the column marginals are exact and
    // the row marginals are within a few percent on a connected table
    val colSums = out.groupBy(_.getString(1))
      .map { case (_, rs) => rs.map(_.getAs[Double]("weight")).sum }
    colSums.foreach(cs => assert(math.abs(cs - n / nSrc) < 1e-3))
    rowSums.foreach(rs =>
      assert(math.abs(rs - n / nLang) / (n / nLang) < 0.10,
        s"row marginal $rs vs ${n / nLang}"))
    // total mass preserved by construction of the final scaling
    assert(math.abs(out.map(_.getAs[Double]("weight")).sum - n) < 1e-3)
  }
}
