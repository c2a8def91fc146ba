package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-level diagnostics for dataset curation: how much one
  * categorical facet tells you about another (mutual information), how
  * far two numeric cohorts have drifted apart (exact two-sample
  * Kolmogorov-Smirnov), and how concentrated a corpus is over its
  * sources (Gini / Herfindahl). All decisions and all hashed numbers
  * derive from INTEGER aggregates — the only doubles are final
  * `ln`/ratio evaluations over identical rationals, rounded to 6 dp on
  * both engines (the repo's derived-double convention).
  *
  * Scale shape shared by every op here: one distributed aggregate
  * collapses the corpus to its CATEGORY DOMAIN (lang×source cells,
  * distinct cent values), and any subsequent global window runs over
  * that bounded domain frame, never over raw rows — the 100 TB scan
  * parallelizes; the O(|domain|) tail stays O(|domain|).
  */
object Distribution {

  /** Mutual information (nats) between two categorical columns, plus
    * both marginal entropies and the arithmetic-mean-normalized NMI.
    * One row out; every term is `p·ln(·)` over exact integer-count
    * rationals. MI of independent facets → 0; NMI of identical facets
    * → 1. Cells/marginals are counts — no estimator correction (this is
    * the population MI of the corpus itself, the curation question).
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String)
  : DataFrame = {
    // the corpus collapses to the cell domain ONCE: cells feeds four
    // consumers (marginals, total, the MI join) — without the tracked
    // persist each consumer re-runs the corpus aggregate
    val cells = graft.CacheScope.track(
      df.groupBy(col(colA).as("a"), col(colB).as("b"))
        .agg(count(lit(1)).as("nab")).persist())
    val aTot = cells.groupBy("a").agg(sum("nab").as("na"))
    val bTot = cells.groupBy("b").agg(sum("nab").as("nb"))
    val tot = cells.agg(sum("nab").as("n"))
    // all frames below are domain-sized; tot is one row
    val mi = cells.join(aTot, "a").join(bTot, "b")
      .crossJoin(broadcast(tot))
      .agg(sum((col("nab") / col("n")) *
        log((col("nab") * col("n")) / (col("na") * col("nb")))).as("mi"))
    val hA = aTot.crossJoin(broadcast(tot))
      .agg(sum((col("na") / col("n")) * -log(col("na") / col("n")))
        .as("h_a"))
    val hB = bTot.crossJoin(broadcast(tot))
      .agg(sum((col("nb") / col("n")) * -log(col("nb") / col("n")))
        .as("h_b"))
    mi.crossJoin(hA).crossJoin(hB)
      .select(round(col("mi"), 6).as("mi_nats"),
        round(col("h_a"), 6).as("h_a"),
        round(col("h_b"), 6).as("h_b"),
        round(col("mi") / ((col("h_a") + col("h_b")) / 2), 6).as("nmi"))
  }

  /** Exact two-sample Kolmogorov-Smirnov over an integer-quantized
    * value column (`centsCol`): D = max over the value domain of
    * |F1 − F2|, computed as the INTEGER numerator
    * `max|c1·n2 − c2·n1|` over per-distinct-value cumulative counts, so
    * the statistic and the decision are engine-exact. The significance
    * cut D > c(α)·sqrt((n1+n2)/(n1·n2)) is squared and cross-multiplied
    * in DECIMAL(38,0) (c(0.05)² = 1.844164 = critNum/critDen exactly),
    * the q226 two-proportion pattern. The cumulative window runs over
    * the aggregated distinct-value frame (domain-bounded), not rows.
    */
  def ksTest(df: DataFrame, centsCol: String, isFirstCohort: Column,
             critNum: Long = 1844164, critDen: Long = 1000000)
  : DataFrame = {
    require(critNum > 0 && critDen > 0, "critical value must be positive")
    val g = graft.CacheScope.track(df.select(col(centsCol).as("c"),
        when(isFirstCohort, 1L).otherwise(0L).as("i1"))
      .groupBy("c")
      .agg(sum("i1").as("a"), (count(lit(1)) - sum("i1")).as("b"))
      .persist()) // cum + totals both read the cent domain
    val w = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.select(sum("a").over(w).as("c1"), sum("b").over(w).as("c2"))
    val tot = g.agg(sum("a").as("n1"), sum("b").as("n2"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    // c1·n2 − c2·n1 stays in BIGINT: exact while n1·n2 < 2^63, i.e. up
    // to ~3e9 rows per cohort — past that, lift the product into the
    // same DECIMAL(38,0) the significance cut already uses.
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
          .as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        round(col("d_num") / (col("n1") * col("n2")), 6).as("ks_stat"),
        (dec(col("d_num")) * dec(col("d_num")) * dec(lit(critDen)) >
          dec(lit(critNum)) * dec(col("n1") + col("n2")) *
            dec(col("n1")) * dec(col("n2"))).as("significant"))
  }

  /** Exact Mann-Whitney U (Wilcoxon rank-sum) between two cohorts of an
    * integer-quantized value column — the rank-based two-sample test
    * beside [[ksTest]]'s distribution-distance: robust to outliers,
    * sensitive to location shift. EVERYTHING is integer-exact via
    * DOUBLED rank units (tie-averaged ranks are half-integers, so 2·R
    * is an integer): per distinct value v with c₁(v)/c₂(v) cohort
    * counts and cum(v) values strictly below,
    *
    *   2·R₁ = Σ c₁(v)·(2·cum(v) + cnt(v) + 1),   U₁ = R₁ − n₁(n₁+1)/2
    *
    * and the normal-approximation significance cut (tie-corrected
    * variance) is squared and cross-multiplied in DECIMAL(38,0):
    * (2U₁−n₁n₂)²·3·N(N−1)·critDen ≥ critNum·n₁n₂·((N+1)N(N−1)−ΣT)
    * (the doubled deviation 2U₁−n₁n₂ carries z²'s factor 4 into the
    * 12 of the variance, leaving coefficient 3 on the left),
    * ΣT = Σ(t³−t) — no sqrt, no float in the decision. Also emits the
    * rank-biserial effect size (2U/(n₁n₂)−1, rounded 6).
    *
    * Scale shape: ksTest's — one value-domain aggregate, one cumulative
    * window over the domain frame; doubled rank sums stay exact in
    * BIGINT while n·N < 2^62 (lift the sums to DECIMAL past that).
    */
  def mannWhitney(df: DataFrame, centsCol: String, isFirstCohort: Column,
                  critNum: Long = 2401, critDen: Long = 625): DataFrame = {
    require(critNum > 0 && critDen > 0, "critical value must be positive")
    val g = df.select(col(centsCol).as("c"),
        when(isFirstCohort, 1L).otherwise(0L).as("i1"))
      .groupBy("c")
      .agg(sum("i1").as("a"), (count(lit(1)) - sum("i1")).as("b"))
    val w = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = g.withColumn("cnt", col("a") + col("b"))
      .withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
    val m = r.agg(sum("a").as("n1"), sum("b").as("n2"),
      sum(col("a") * (lit(2) * col("cumb") + col("cnt") + 1)).as("r1d"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tsum"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    m.withColumn("u1d", col("r1d") - col("n1") * (col("n1") + 1))
      .withColumn("dd", col("u1d") - col("n1") * col("n2"))
      .withColumn("nn", col("n1") + col("n2"))
      .select(col("n1"), col("n2"),
        (col("u1d") / lit(2)).as("u"), // exact half-integer double
        round(col("dd") / (col("n1") * col("n2")), 6).as("rank_biserial"),
        (dec(col("dd")) * dec(col("dd")) * dec(lit(3)) * dec(col("nn")) *
          dec(col("nn") - 1) * dec(lit(critDen)) >=
          dec(lit(critNum)) * dec(col("n1")) * dec(col("n2")) *
            (dec(col("nn") + 1) * dec(col("nn")) * dec(col("nn") - 1) -
              dec(col("tsum")))).as("significant"))
  }

  /** Source-concentration profile per group: Gini coefficient and
    * Herfindahl-Hirschman index of `weightCol` mass over `unitCol`
    * within each `groupCol` — the "is this language dominated by one
    * crawl source?" curation gate. Gini uses the exact rank identity
    * G = (2·Σi·wᵢ − (n+1)·W) / (n·W) over weights ranked ascending
    * (ties broken by `unitCol` for determinism); HHI is Σ(wᵢ/W)². Both
    * are rationals of integer sums, rounded 6 dp. The rank window runs
    * per group over the (group, unit)-aggregated frame.
    */
  def concentration(df: DataFrame, groupCol: String, unitCol: String,
                    weightCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol), col(unitCol))
      .agg(sum(col(weightCol)).as("w"))
    val r = g.withColumn("i",
      row_number().over(Window.partitionBy(groupCol)
        .orderBy(col("w"), col(unitCol))))
    r.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"), sum("w").as("total_w"),
        sum(col("i") * col("w")).as("siw"),
        sum(col("w") * col("w")).as("sww"))
      .select(col(groupCol), col("n_units"), col("total_w"),
        round((lit(2) * col("siw") - (col("n_units") + 1) * col("total_w"))
          / (col("n_units") * col("total_w")), 6).as("gini"),
        round(col("sww") / (col("total_w") * col("total_w")), 6)
          .as("hhi"))
  }

  /** Binned quantile normalization: each row lands in one of `bins`
    * equal-frequency bins WITHIN its group (ntile over (value, id) —
    * deterministic under ties), and its normalized value is the global
    * mean of the raw value over that bin across ALL groups — the
    * classic microarray quantile-norm, discretized so unequal group
    * sizes need no interpolation. Two window passes over domain-
    * partitioned frames (per-group ntile parallelizes per group; the
    * bin means are a `bins`-row broadcast join).
    */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String, bins: Int): DataFrame = {
    require(bins > 1, "need at least 2 bins")
    // binned is corpus-sized and read twice (bin means + the join
    // back): persist so the per-group ntile window runs once
    val binned = graft.CacheScope.track(
      df.select(col(groupCol), col(idCol), col(valueCol))
        .withColumn("bin",
          ntile(bins).over(Window.partitionBy(groupCol)
            .orderBy(col(valueCol), col(idCol))).cast("long"))
        .persist())
    val ref = binned.groupBy("bin")
      .agg(sum(col(valueCol)).as("s"), count(lit(1)).as("c"))
      .select(col("bin"), round(col("s") / col("c"), 6).as("norm_value"))
    binned.join(broadcast(ref), "bin")
      .select(col(idCol), col(groupCol), col("bin"), col("norm_value"))
  }

  /** Iterative proportional fitting (raking) of the `rowCol`×`colCol`
    * contingency table toward UNIFORM marginals — the "reweight the
    * lang×source mix to a balanced target" curation step.
    *
    * The corpus is scanned ONCE (one distributed count aggregate); the
    * IPF loop itself is driver math on the collected cell table, the
    * Pca pattern: the loop state is DOMAIN-sized (|rows|·|cols| cells,
    * `maxCells`-guarded), and expressing it as chained DataFrame
    * self-joins would double the logical plan per scaling (each step
    * references the previous frame twice), i.e. 4^iters analyzer nodes
    * — measured pathological already at 8 iterations. Deterministic by
    * construction: cells iterate in sorted (row, col) order, fixed
    * iteration count, no randomness; the oracle unrolls the same
    * rounds as window-scaling CTEs. Weights round 6 dp (marginal-sum
    * order is the only FP divergence, far inside tolerance for
    * domain-sized cells).
    */
  def ipfBalance(df: DataFrame, rowCol: String, colCol: String,
                 iters: Int, maxCells: Int = 1 << 20): DataFrame = {
    require(iters > 0 && iters <= 64, s"iters must be in [1,64], got $iters")
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    require(cells.length <= maxCells,
      s"${cells.length} cells exceed maxCells=$maxCells — raking is a " +
        "domain-table operator; aggregate the facets first")
    require(cells.nonEmpty, "empty input")
    val rKeys = cells.map(_._1).distinct
    val cKeys = cells.map(_._2).distinct
    val nn = cells.map(_._3).sum.toDouble
    val (tr, tc) = (nn / rKeys.length, nn / cKeys.length)
    var w = cells.map(_._3.toDouble)
    for (_ <- 1 to iters) {
      val rSum = new scala.collection.mutable.HashMap[String, Double]()
      cells.indices.foreach(i =>
        rSum(cells(i)._1) = rSum.getOrElse(cells(i)._1, 0.0) + w(i))
      w = cells.indices.toArray.map(i => w(i) * (tr / rSum(cells(i)._1)))
      val cSum = new scala.collection.mutable.HashMap[String, Double]()
      cells.indices.foreach(i =>
        cSum(cells(i)._2) = cSum.getOrElse(cells(i)._2, 0.0) + w(i))
      w = cells.indices.toArray.map(i => w(i) * (tc / cSum(cells(i)._2)))
    }
    val spark = df.sparkSession
    import spark.implicits._
    cells.indices.map { i =>
      (cells(i)._1, cells(i)._2, cells(i)._3,
        BigDecimal(w(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toDF(rowCol, colCol, "n", "weight")
  }
}
