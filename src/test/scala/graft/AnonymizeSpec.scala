package graft

import graft.operators.Anonymize
import org.apache.spark.sql.functions._

class AnonymizeSpec extends SparkSpec {
  import spark.implicits._

  test("ladder escalates per row: publish, generalize, suppress") {
    // region is the level-1 rollup of (region, city). k = 3.
    //   (e, ea): 3 rows  -> published at level 0
    //   (e, eb): 2 rows \
    //   (e, ec): 2 rows  -> 4 unresolved in region e -> level 1
    //   (w, wa): 2 rows  -> only 2 unresolved in region w -> suppressed
    val df = Seq(
      (1, "e", "ea"), (2, "e", "ea"), (3, "e", "ea"),
      (4, "e", "eb"), (5, "e", "eb"),
      (6, "e", "ec"), (7, "e", "ec"),
      (8, "w", "wa"), (9, "w", "wa")
    ).toDF("id", "region", "city")
    val got = Anonymize.kAnonymityLevels(df, k = 3,
        Seq(Seq(col("region"), col("city")), Seq(col("region"))))
      .select($"id", $"gen_level").as[(Int, Long)].collect().toMap
    assert((1 to 3).forall(got(_) === 0L))
    assert((4 to 7).forall(got(_) === 1L))
    assert((8 to 9).forall(got(_) === 2L))
  }

  test("local recode: level-1 counts exclude rows already published at level 0") {
    // (e, ea) publishes 3 rows at level 0; they must NOT prop up the
    // remaining region-e rows: only 2 unresolved remain -> suppressed,
    // even though region e has 5 rows in total.
    val df = Seq(
      (1, "e", "ea"), (2, "e", "ea"), (3, "e", "ea"),
      (4, "e", "eb"), (5, "e", "ec")
    ).toDF("id", "region", "city")
    val got = Anonymize.kAnonymityLevels(df, k = 3,
        Seq(Seq(col("region"), col("city")), Seq(col("region"))))
      .select($"id", $"gen_level").as[(Int, Long)].collect().toMap
    assert((1 to 3).forall(got(_) === 0L))
    assert((4 to 5).forall(got(_) === 2L),
      "residual region-e population is 2 < k: suppressed")
  }

  test("k-anonymity certificate holds on the q169 output at sf0.001") {
    // The privacy contract itself: every published (level, QI) group in
    // the released frame has >= k members. Checked on the real query
    // output — the certificate the operator exists to guarantee.
    val out = SparkEntry.queries("q169_kanonymity")(
      spark, "/root/testdata/sf0.001")
    out.cache()
    try {
      val bad = out.filter($"gen_level" < 2)
        .groupBy($"gen_level", $"qi_nation", $"qi_segment",
          $"qi_bal_lo", $"qi_bal_w")
        .agg(count(lit(1)).as("n"))
        .filter($"n" < 4)
        .count()
      assert(bad === 0L, "a published QI group smaller than k leaked")
      // both arms of the ladder are exercised by the fixture
      val levels = out.select($"gen_level").distinct()
        .as[Long].collect().toSet
      assert(levels.contains(2L), "fixture must exercise suppression")
      assert(levels.exists(_ < 2L), "fixture must publish something")
      // suppressed rows carry no quasi-identifier at all
      val leak = out.filter($"gen_level" === 2 &&
        ($"qi_nation".isNotNull || $"qi_segment".isNotNull ||
          $"qi_bal_lo".isNotNull || $"qi_bal_w".isNotNull)).count()
      assert(leak === 0L)
    } finally out.unpersist()
  }
}
