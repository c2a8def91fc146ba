package graft

import graft.operators.Survival

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("matches the textbook product-limit on a hand-computed cohort") {
    // classic 6-unit example: deaths at t=1 (1), t=3 (1); censored at
    // t=2, t=3, t=4, t=5
    // t=1: n=6, d=1 -> S = 5/6
    // t=3: at risk = units with dur >= 3 -> 4 (two left at 1,2 gone);
    //       d=1 -> S = 5/6 * 3/4 = 0.625
    val lives = Seq(
      (1L, true), (2L, false), (3L, true), (3L, false),
      (4L, false), (5L, false)).toDF("dur", "died")
    val rows = Survival.kaplanMeier(lives, "dur", "died")
      .orderBy("t").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val byT = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byT(1L) === ((6L, 1L, BigDecimal(5.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(byT(3L) === ((4L, 1L, 0.625)))
  }

  test("total extinction pins survival to exactly zero, no ln(0)") {
    val lives = Seq((1L, true), (2L, true), (2L, true))
      .toDF("dur", "died")
    val rows = Survival.kaplanMeier(lives, "dur", "died")
      .orderBy("t").collect()
    // t=1: n=3 d=1 -> 2/3; t=2: n=2 d=2 -> extinct -> 0.0 exactly
    assert(rows.length === 2)
    assert(rows(0).getDouble(3) === 0.666667)
    assert(rows(1).getDouble(3) === 0.0)
  }

  test("all-censored cohort emits no death rows") {
    val lives = Seq((3L, false), (5L, false)).toDF("dur", "died")
    assert(Survival.kaplanMeier(lives, "dur", "died").count() === 0L)
  }

  test("survival is non-increasing and bounded on the real fixture") {
    val df = SparkEntry.queries("q237_kaplan_meier")(
      spark, "/root/testdata/sf0.01")
    val s = df.orderBy("t").collect().map(_.getDouble(3))
    assert(s.nonEmpty)
    assert(s.zip(s.tail).forall { case (a, b) => b <= a })
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
  }
}
