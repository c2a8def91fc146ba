package graft

import graft.operators.{Frequency, RobustStats}
import org.apache.spark.sql.functions._

/** logOddsTerms + changepoint — the corpus/metric drift diagnostics
  * added alongside DistributionSpec's family.
  */
class TrendDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("logOddsTerms surfaces a group's planted marker token") {
    // two groups share a common vocabulary; group A additionally uses
    // "markerA" heavily, B uses "markerB" — each group's top term must
    // be its marker, and shared filler must score near zero
    val common = Seq("the", "quick", "fox", "ran", "home")
    val docsA = (1 to 40).map(i =>
      ("A", (common ++ Seq("markerA", "markerA")).mkString(" ") + s" d$i"))
    val docsB = (1 to 40).map(i =>
      ("B", (common ++ Seq("markerB", "markerB")).mkString(" ") + s" d$i"))
    val df = (docsA ++ docsB).toDF("lang", "text")
    val top = Frequency.logOddsTerms(df, "lang", "text",
      a0 = 100, minCount = 10, k = 3)
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(r => r.getString(1)).toSeq }
    assert(top("A").head === "markerA")
    assert(top("B").head === "markerB")
    // markers score positive in their group; the other group's top list
    // must not contain the foreign marker above its own
    val z = Frequency.logOddsTerms(df, "lang", "text", 100, 10, 100)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(z(("A", "markerA")) > 2.0)
    assert(z(("B", "markerB")) > 2.0)
    // shared filler is NOT distinctive for either side
    assert(math.abs(z(("A", "the"))) < 1.0)
  }

  test("changepoint finds a planted level shift exactly") {
    // days 1..20 at total 100/day, days 21..40 at 500/day: the best
    // two-segment split is after day 20
    val rows = (1L to 40L).flatMap { d =>
      val per = if (d <= 20) 100L else 500L
      Seq((d, per / 2), (d, per - per / 2)) // two rows per day
    }
    val df = rows.toDF("day", "cents")
    val r = RobustStats.changepoint(df, "day", "cents").collect().head
    assert(r.getAs[Long]("split_bucket") === 20L)
    assert(r.getAs[Long]("k_left") === 20L)
    assert(r.getAs[Double]("mean_before") === 100.0)
    assert(r.getAs[Double]("mean_after") === 500.0)
  }

  test("changepoint on a flat series scores zero everywhere") {
    val df = (1L to 30L).map(d => (d, 250L)).toDF("day", "cents")
    val r = RobustStats.changepoint(df, "day", "cents").collect().head
    assert(r.getAs[Double]("score") === 0.0)
    // argmax ties broken by bucket: first day wins
    assert(r.getAs[Long]("split_bucket") === 1L)
    assert(r.getAs[Double]("mean_before") === 250.0)
    assert(r.getAs[Double]("mean_after") === 250.0)
  }

  test("benfordAudit: exact counts, shares sum to 1, nonpositive dropped") {
    // 30 values with digit 1, 10 with digit 2, 5 with digit 9, plus
    // zeros/negatives that must be excluded
    val vals = Seq.fill(30)(123L) ++ Seq.fill(10)(2L) ++
      Seq.fill(5)(900L) ++ Seq(0L, -7L)
    val out = graft.operators.Expectations
      .benfordAudit(vals.toDF("v"), "v").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 2L, 9L))
    assert(out(1L)._1 === 30L && out(2L)._1 === 10L && out(9L)._1 === 5L)
    val n = 45.0
    for ((d, (obs, share, chi2)) <- out) {
      val p = math.log10(1 + 1.0 / d)
      assert(math.abs(share - BigDecimal(p)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      val want = (obs - n * p) * (obs - n * p) / (n * p)
      assert(math.abs(chi2 - want) < 1e-5, s"digit $d")
    }
  }

  test("theilSen: exact slope on a line, unmoved by a heavy outlier") {
    val line = (1L to 21L).map(d => (d, 50L + 5L * d)).toDF("day", "cents")
    val r1 = RobustStats.theilSen(line, "day", "cents").collect().head
    assert(r1.getAs[Long]("n_pairs") === 210L)
    assert(r1.getAs[Long]("slope_micro") === 5000000L)
    assert(r1.getAs[Double]("slope") === 5.0)
    // one wildly corrupt bucket: least squares would move, the median
    // pairwise slope must not
    val dirty = ((1L to 21L).filter(_ != 11L).map(d => (d, 50L + 5L * d))
      :+ ((11L, 1000000L))).toDF("day", "cents")
    val r2 = RobustStats.theilSen(dirty, "day", "cents").collect().head
    assert(r2.getAs[Long]("slope_micro") === 5000000L,
      s"outlier moved the robust slope: ${r2}")
  }

  test("theilSen guards the quadratic domain blowup") {
    val big = (1L to 50L).map(d => (d, d)).toDF("day", "cents")
    intercept[IllegalArgumentException] {
      RobustStats.theilSen(big, "day", "cents", maxBuckets = 10)
    }
  }

  test("mannWhitney: identical cohorts U = n1n2/2; disjoint shift wins all") {
    import graft.operators.Distribution
    val same = (1L to 100L).flatMap(v => Seq((v, true), (v, false)))
      .toDF("cents", "c1")
    val r1 = Distribution.mannWhitney(same, "cents", col("c1"))
      .collect().head
    assert(r1.getAs[Double]("u") === 100.0 * 100 / 2)
    assert(r1.getAs[Double]("rank_biserial") === 0.0)
    assert(!r1.getAs[Boolean]("significant"))
    val shifted = ((1L to 100L).map(v => (v + 1000L, true)) ++
      (1L to 100L).map(v => (v, false))).toDF("cents", "c1")
    val r2 = Distribution.mannWhitney(shifted, "cents", col("c1"))
      .collect().head
    assert(r2.getAs[Double]("u") === 10000.0) // every comparison won
    assert(r2.getAs[Double]("rank_biserial") === 1.0)
    assert(r2.getAs[Boolean]("significant"))
  }

  test("mannWhitney flags 1.96 < |z| < 3.92 (regression: cut was 2x)") {
    import graft.operators.Distribution
    // n1 = n2 = 10, no ties, U1 = 8*10 + 5 + 0 = 85:
    // z = (85 - 50) / sqrt(100 * 21 / 12) = 2.646 — significant at
    // alpha = 0.05 (1.96) but NOT at the doubled 3.92 cut the old
    // 4*critNum coefficient silently imposed.
    val c2 = (1L to 10L).map(v => (2L * v, false))
    val c1 = (21L to 28L).map(v => (v, true)) ++ Seq((11L, true), (1L, true))
    val r = Distribution.mannWhitney((c1 ++ c2).toDF("cents", "c1"),
      "cents", col("c1")).collect().head
    assert(r.getAs[Double]("u") === 85.0)
    assert(r.getAs[Boolean]("significant"),
      "z = 2.65 must be significant at the default 1.96 cut")
  }

  test("mannWhitney tie-averaged ranks match a hand computation") {
    // cohort1 = {1, 2, 2}, cohort2 = {2, 3}: ranks 1, 3, 3, 3, 5
    // (three 2s share rank (2+3+4)/3 = 3) -> R1 = 1+3+3 = 7,
    // U1 = 7 - 3*4/2 = 1 -> u = 1.0; ties tsum = 3^3-3 = 24
    val df = Seq((1L, true), (2L, true), (2L, true), (2L, false),
      (3L, false)).toDF("cents", "c1")
    val r = graft.operators.Distribution.mannWhitney(df, "cents", col("c1"))
      .collect().head
    assert(r.getAs[Long]("n1") === 3L && r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Double]("u") === 1.0)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("autocorrelation: alternating series gives -1/+1, flat gives null") {
    val alt = (1L to 20L).map(d => (d, if (d % 2 == 0) 100L else 300L))
      .toDF("day", "cents")
    val acf = RobustStats.autocorrelation(alt, "day", "cents", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(acf(1L) === -1.0)
    assert(acf(2L) === 1.0)
    val flat = (1L to 20L).map(d => (d, 100L)).toDF("day", "cents")
    val rows = RobustStats.autocorrelation(flat, "day", "cents", 2)
      .collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.isNullAt(2), "flat series acf is null"))
  }
}
