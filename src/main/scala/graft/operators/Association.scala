package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association-rule mining (the Apriori output surface at
  * pair length, mined relationally): directed rules `ante -> cons` with
  * exact support / confidence / lift thresholds. The classic
  * recommendation / cross-sell analytics the reference's relational core
  * stops short of, expressed as three hash aggregates and one
  * basket-keyed self-join.
  *
  * Exactness contract (the q160 collocation discipline): every threshold
  * is a rational cross-multiplied into integer arithmetic —
  *   confidence  c_ab·confDen >= confNum·c_ante
  *   lift        c_ab·N·liftDen >= liftNum·c_a·c_b
  * — so the accept set is bit-identical in any engine; the presentation
  * columns (`conf_bps`, `lift_milli`) are single integer divisions.
  *
  * Scale shape: the basket de-dup and the pair enumeration share ONE
  * basket-keyed exchange (self-join on the basket id); pair fan-out is
  * quadratic only in DISTINCT items per basket (bounded by the basket,
  * not the corpus — the q121 wedge bound's relational cousin). Item and
  * pair counts are partial-agg hash aggregates; the count frames are
  * item-vocabulary-sized, so their enrichment joins are left to AQE
  * (broadcast under the threshold). The corpus total `n_baskets` is one
  * scan-level aggregate broadcast as a single row (J5 pattern) — never a
  * driver-side collect.
  */
object Association {

  /** Mines directed pair rules from `(basketCol, itemCol)` rows
    * (duplicates within a basket collapse first). Returns one row per
    * surviving directed rule:
    * (ante, cons, c_ab, c_ante, c_cons, n_baskets, conf_bps, lift_milli).
    */
  def basketRules(baskets: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long, confNum: Long, confDen: Long,
                  liftNum: Long, liftDen: Long): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(confNum >= 0 && confDen > 0 && liftNum >= 0 && liftDen > 0,
      "thresholds must be non-negative rationals")
    val items = baskets
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val totals = items.agg(
      count_distinct(col("basket")).as("n_baskets"))
    val itemCnt = items.groupBy("item").agg(count(lit(1)).as("c"))
    val pairCnt = items.as("a")
      .join(items.as("b"),
        col("a.basket") === col("b.basket") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
    // both directions: the confidence threshold is direction-specific,
    // the support/lift thresholds are symmetric.
    val directed = pairCnt
      .select(col("ia").as("ante"), col("ib").as("cons"), col("c_ab"))
      .unionAll(pairCnt
        .select(col("ib").as("ante"), col("ia").as("cons"), col("c_ab")))
    // lift multiplies three corpus-scale counts — DECIMAL(38,0) like the
    // q160 collocation cut (HUGEINT twin), so there is no long overflow
    // at any corpus size; confidence stays in longs (c_ab <= c_ante, so
    // c_ab·confDen is safe for any sane confDen).
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    directed
      .join(itemCnt.select(col("item").as("ante"), col("c").as("c_ante")),
        "ante")
      .join(itemCnt.select(col("item").as("cons"), col("c").as("c_cons")),
        "cons")
      .crossJoin(broadcast(totals))
      .filter(col("c_ab") * confDen >= lit(confNum) * col("c_ante"))
      .filter(dec(col("c_ab")) * dec(col("n_baskets")) * dec(lit(liftDen)) >=
        dec(lit(liftNum)) * dec(col("c_ante")) * dec(col("c_cons")))
      .select(col("ante"), col("cons"), col("c_ab"), col("c_ante"),
        col("c_cons"), col("n_baskets"),
        expr("c_ab * 10000 div c_ante").as("conf_bps"),
        expr("""CAST(CAST(c_ab AS DECIMAL(38,0)) * n_baskets * 1000
                 div (CAST(c_ante AS DECIMAL(38,0)) * c_cons) AS BIGINT)""")
          .as("lift_milli"))
  }
}
