package graft

import graft.operators.{IncrementalAgg, MergeOps, RobustStats}
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (key, value, batch)
    ("a", 10L, 0), ("a", 20L, 1), ("a", 30L, 0),
    ("b", 5L, 1), ("b", 7L, 1),
    ("c", 100L, 0))

  test("fold of batches equals single-pass aggregate, any order") {
    val df = rows.toDF("k", "v", "b")
    val whole = IncrementalAgg.aggregate(df, Seq("k"), "v")
    def state(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val batches = Seq(df.filter($"b" === 0), df.filter($"b" === 1))
    val folded = IncrementalAgg.foldBatches(batches, Seq("k"), "v")
    val foldedRev =
      IncrementalAgg.foldBatches(batches.reverse, Seq("k"), "v")
    assert(state(folded) === state(whole))
    assert(state(foldedRev) === state(whole))
    // keys present in only one batch must pass through the outer merge
    assert(state(folded)("b") === (2L, 12L, 5L, 7L, 74L))
    assert(state(folded)("c") === (1L, 100L, 100L, 100L, 10000L))
  }

  test("present derives avg and population variance from state") {
    val st = IncrementalAgg.aggregate(
      Seq(("a", 2L), ("a", 4L)).toDF("k", "v"), Seq("k"), "v")
    val row = IncrementalAgg.present(st).collect().head
    assert(row.getAs[Double]("avg6") === 3.0)
    assert(row.getAs[Double]("var6") === 1.0) // pop var of {2,4}
  }
}

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("outlierCounts flags exactly |x - mean| > z*sigma_pop, integer-decided") {
    // group g: values 1,1,1,1,16 -> mean 4, sigma_pop 6; z=2 bound is 12
    // |16-4| = 12 is NOT > 12 (strict) -> no flag at z=2, flags at z=3/2
    val df = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 1L), ("g", 16L))
      .toDF("k", "v")
    val at2 = RobustStats.outlierCounts(df, Seq("k"), "v", 2, 1)
      .collect().head
    assert(at2.getAs[Long]("n_outliers") === 0L)
    val at32 = RobustStats.outlierCounts(df, Seq("k"), "v", 3, 2)
      .collect().head
    assert(at32.getAs[Long]("n_outliers") === 1L)
    assert(at32.getAs[Long]("outlier_total") === 16L)
  }

  test("outlierCounts: n=1 and zero-variance groups flag nothing") {
    val df = Seq(("one", 42L), ("flat", 7L), ("flat", 7L), ("flat", 7L))
      .toDF("k", "v")
    val got = RobustStats.outlierCounts(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_outliers")).toMap
    assert(got === Map("one" -> 0L, "flat" -> 0L))
  }

  test("winsorizedStats clips to exact ceil-rank percentile bounds") {
    // 10 values 10..100; p10 rank ceil(1)=1 -> lo=10, p80 rank 8 -> hi=80
    val df = (1 to 10).map(i => ("g", i * 10L, i.toLong)).toDF("k", "v", "id")
    val r = RobustStats.winsorizedStats(df, Seq("k"), "v", "id", 10, 80, 100)
      .collect().head
    assert(r.getAs[Long]("lo") === 10L)
    assert(r.getAs[Long]("hi") === 80L)
    assert(r.getAs[Long]("n_clip_lo") === 0L)
    assert(r.getAs[Long]("n_clip_hi") === 2L) // 90, 100
    assert(r.getAs[Long]("w_total") === (10 to 80 by 10).sum + 2 * 80L)
  }

  test("rollingLowerMedian: exact lower median, partial head windows") {
    val df = Seq(("u", 1L, 10L), ("u", 2L, 90L), ("u", 3L, 20L),
      ("u", 4L, 80L), ("v", 1L, 5L))
      .toDF("k", "d", "v")
    val got = RobustStats.rollingLowerMedian(df, Seq("k"), "d", "v", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    // u d=1: {10} -> 10; d=2: {10,90} lower median = 10;
    // d=3: {10,20,90} -> 20; d=4 window {90,20,80} sorted {20,80,90} -> 80
    assert(got === Map(("u", 1L) -> 10L, ("u", 2L) -> 10L,
      ("u", 3L) -> 20L, ("u", 4L) -> 80L, ("v", 1L) -> 5L))
  }

  test("rollingLowerMedian resists a spike a rolling mean would absorb") {
    val df = (1L to 9L).map(d => ("u", d, if (d == 5) 1000000L else 10L))
      .toDF("k", "d", "v")
    val med = RobustStats.rollingLowerMedian(df, Seq("k"), "d", "v", 5)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(med.values.toSet === Set(10L)) // the spike never wins a window
  }

  test("winsorizedStats ties break by id — deterministic bounds") {
    // equal values: rank order falls back to id, bounds still unique
    val df = Seq(("g", 5L, 2L), ("g", 5L, 1L), ("g", 9L, 3L), ("g", 1L, 4L))
      .toDF("k", "v", "id")
    val r = RobustStats.winsorizedStats(df, Seq("k"), "v", "id", 25, 75, 100)
      .collect().head
    assert(r.getAs[Long]("lo") === 1L) // rank ceil(4*25/100)=1
    assert(r.getAs[Long]("hi") === 5L) // rank 3 under (v, id) order
  }
}

class ExpectationsSpec extends SparkSpec {
  import graft.operators.Expectations
  import spark.implicits._

  test("evaluate: failing rules report observed violations, passed=0") {
    val df = Seq((1L, Some(10L)), (1L, None), (2L, Some(-5L)))
      .toDF("id", "v")
    val got = Expectations.evaluate(df, Seq(
      ("ids_unique", count(lit(1)) - countDistinct(col("id")),
        count(lit(1)) === countDistinct(col("id"))),
      ("v_nonnull", sum(when(col("v").isNull, 1L).otherwise(0L)),
        sum(when(col("v").isNull, 1L).otherwise(0L)) === 0),
      ("v_nonneg", sum(when(col("v") < 0, 1L).otherwise(0L)),
        sum(when(col("v") < 0, 1L).otherwise(0L)) === 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map(
      "ids_unique" -> (1L, 0L),  // id 1 duplicated
      "v_nonnull" -> (1L, 0L),
      "v_nonneg" -> (1L, 0L)))
  }

  test("dailyCompleteness: absent days surface with n=0 and fail") {
    // days 10, 11, 14 present (14 thin); 12-13 missing entirely
    val df = (Seq.fill(10)(10L) ++ Seq.fill(8)(11L) :+ 14L).toDF("d")
    val got = Expectations.dailyCompleteness(df, col("d"), 1, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // total 19 over 5 days -> mean 3.8, half-mean bar: n*5*2 >= 19
    assert(got === Map(
      10L -> (10L, 1L), 11L -> (8L, 1L), 12L -> (0L, 0L),
      13L -> (0L, 0L), 14L -> (1L, 0L)))
  }

  test("corpusCard: volumes, extremes, normalized dups, integer dup_bp") {
    // group (s1, en): 4 docs, two of which normalize identically
    // ("Hello  World!" ~ "hello world") -> 3 unique, dup_bp = 2500.
    val docs = Seq(
      ("s1", "en", "Hello  World!"),
      ("s1", "en", "hello world"),
      ("s1", "en", "aa bb cc"),
      ("s1", "en", "zz"),
      ("s2", "fr", "un deux")).toDF("source", "lang", "text")
    val got = Expectations.corpusCard(docs, Seq("source", "lang"), "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8)))
      .toMap
    // s1/en tokens: "Hello  World!" splits to 3 on single spaces
    // (empty middle token), others 2/3/1 -> 9; chars 13+11+8+2 = 34.
    assert(got(("s1", "en")) === (4L, 9L, 34L, 2L, 13L, 3L, 2500L))
    assert(got(("s2", "fr")) === (1L, 2L, 7L, 7L, 7L, 1L, 0L))
  }
}

class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeInto: update, insert, keep, and matched-image delete arms") {
    val target = Seq((1L, 10L), (2L, 1L), (3L, 99L)).toDF("k", "n")
    val source = Seq((1L, 5L), (2L, 1L), (4L, 7L)).toDF("k", "n")
    val got = MergeOps.mergeInto(target, source, Seq("k"),
      updateSet = Seq("n" -> (col("n") + col("src_n"))),
      insertSet = Seq("n" -> col("src_n")),
      deleteWhen = Some(col("n") < 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=1 updated 10+5; k=2 updated 1+1=2 -> deleted; k=3 kept; k=4 inserted
    assert(got === Map(1L -> 15L, 3L -> 99L, 4L -> 7L))
  }

  test("mergeInto: NULL deleteWhen keeps the row (unknown is not delete)") {
    val target = Seq((1L, Some(10L)), (2L, Some(1L))).toDF("k", "n")
    val source = Seq((1L, None: Option[Long]), (2L, Some(1L)))
      .toDF("k", "n")
    // k=1's updated n is 10 + NULL = NULL -> deleteWhen(n < 3) is
    // UNKNOWN -> must KEEP (SQL MERGE semantics); k=2 updates to 2 -> TRUE
    // -> deleted
    val got = MergeOps.mergeInto(target, source, Seq("k"),
      updateSet = Seq("n" -> (col("n") + col("src_n"))),
      insertSet = Seq("n" -> col("src_n")),
      deleteWhen = Some(col("n") < 3))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === Map(1L -> None))
  }

  test("mergeInto rejects an updateSet/insertSet column absent from target") {
    val t = Seq((1L, 1L)).toDF("k", "n")
    intercept[IllegalArgumentException] {
      MergeOps.mergeInto(t, t, Seq("k"),
        updateSet = Seq("totals" -> col("n")),
        insertSet = Seq("n" -> col("src_n")))
    }
  }

  test("mergeInto without deleteWhen keeps every merged row") {
    val target = Seq((1L, 1L)).toDF("k", "n")
    val source = Seq((1L, 1L)).toDF("k", "n")
    val got = MergeOps.mergeInto(target, source, Seq("k"),
      Seq("n" -> (col("n") + col("src_n"))), Seq("n" -> col("src_n")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L))
  }

  test("goldenRecord: columns survive independently, nulls never win") {
    val df = Seq(
      // (key, order, tie, a, b)
      (1L, 1L, 1L, Some(10L), None: Option[Long]),
      (1L, 2L, 2L, None, Some(20L)),
      (1L, 3L, 3L, None, None), // latest row is all-null: must not win
      (2L, 1L, 4L, None, None)  // key with no values at all
    ).toDF("k", "o", "t", "a", "b")
    val got = MergeOps.goldenRecord(df, "k", "o", "t", Seq("a", "b"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) === (Some(10L), Some(20L)))
    assert(got(2L) === (None, None))
  }

  test("goldenRecord: equal order falls to tie-break deterministically") {
    val df = Seq((1L, 5L, 1L, Some(100L)), (1L, 5L, 2L, Some(200L)))
      .toDF("k", "o", "t", "a")
    val got = MergeOps.goldenRecord(df, "k", "o", "t", Seq("a"))
      .collect().head
    assert(got.getLong(1) === 200L)
  }

  test("scd2: versions open on change, close on the next, flag current") {
    val snaps = Seq(
      (1L, 10L, "a"), (1L, 11L, "a"), (1L, 12L, "b"), (1L, 13L, "b"),
      (1L, 14L, "a"), // back to a — MUST open a NEW version, not merge
      (2L, 10L, "x"))
      .toDF("k", "d", "attr")
    val got = MergeOps.scd2(snaps, Seq("k"), "d", Seq("attr"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
      .sortBy(t => (t._1, t._3))
    assert(got === Seq(
      (1L, "a", 10L, Some(12L), 0L),
      (1L, "b", 12L, Some(14L), 0L),
      (1L, "a", 14L, None, 1L),
      (2L, "x", 10L, None, 1L)))
  }

  test("scd2: a null attribute still opens and closes versions") {
    val snaps = Seq(
      (1L, 1L, Option("a")), (1L, 2L, None: Option[String]),
      (1L, 3L, None), (1L, 4L, Option("a")))
      .toDF("k", "d", "attr")
    val got = MergeOps.scd2(snaps, Seq("k"), "d", Seq("attr"))
      .collect().map(r => (r.getLong(2), Option(r.getString(1)))).sorted
    // versions at d=1 (a), d=2 (null, spans 2 rows), d=4 (a)
    assert(got === Seq((1L, Some("a")), (2L, None), (4L, Some("a"))))
  }
}

class RowGateSpec extends SparkSpec {
  import spark.implicits._

  test("rowGate: declaration-order reasons, null verdicts fail, clean rows pass") {
    val df = Seq(
      (1L, Some(5L), "ok"),
      (2L, Some(-1L), "no"),
      (3L, Option.empty[Long], "ok")
    ).toDF("id", "x", "y")
    val got = graft.operators.Expectations.rowGate(df, Seq(
        ("x_positive", col("x") > 0),
        ("y_domain", col("y") === "ok")))
      .select($"id", $"reasons", $"quarantined")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("", false)))
    assert(got(2L) === (("x_positive,y_domain", true)))
    // x is NULL: 'x > 0' is NULL, and a check that cannot evaluate has
    // not passed
    assert(got(3L) === (("x_positive", true)))
  }
}

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], window: Int = 16) =
    graft.operators.RobustStats.ewmaFeatures(
      rows.toDF("user_id", "seq", "cents"),
      Seq("user_id"), Seq(col("seq")), "cents", window)
      .select($"user_id", $"seq", $"ws", $"wt", $"ewma_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("hand-computed dyadic weights with head renormalization") {
    val got = run(Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 400L)))
    // row 1: only weight 2^15 present
    assert(got((1L, 1L)) === ((100L * 32768, 32768L, 100000000L)))
    // row 2: 200*2^15 + 100*2^14, wt = 49152 -> 166666666 micro
    assert(got((1L, 2L)) === ((8192000L, 49152L, 166666666L)))
    // row 3: 400*2^15 + 200*2^14 + 100*2^13, wt = 57344 -> exactly 300
    assert(got((1L, 3L)) === ((17203200L, 57344L, 300000000L)))
  }

  test("constant series converges to the value; old rows leave the window") {
    val rows = (1L to 20L).map(i => (7L, i, 500L))
    val got = run(rows)
    // full window: wt = 2^16 - 1 = 65535 and ewma = exactly 500
    assert(got((7L, 20L))._2 === 65535L)
    assert(got((7L, 20L))._3 === 500000000L)
    // row 17 must not include row 1: a spike at row 1 cannot leak
    val spiked = run((1L to 20L).map(i =>
      (7L, i, if (i == 1L) 999999L else 500L)))
    assert(spiked((7L, 17L)) === got((7L, 17L)),
      "row 1 must have aged out of row 17's window")
    assert(spiked((7L, 16L)) !== got((7L, 16L)),
      "row 1 is still inside row 16's window")
  }

  test("users are independent") {
    val got = run(Seq((1L, 1L, 100L), (2L, 1L, 900L)))
    assert(got((1L, 1L))._3 === 100000000L)
    assert(got((2L, 1L))._3 === 900000000L)
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added/removed/changed detected; identical rows suppressed") {
    val oldS = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"))
      .toDF("id", "fp")
    val newS = Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e"))
      .toDF("id", "fp")
    val got = MergeOps.snapshotDiff(oldS, newS, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null fingerprints compare null-safely, never alias absence") {
    val oldS = Seq((1L, null.asInstanceOf[String]), (2L, "x"),
      (3L, null.asInstanceOf[String])).toDF("id", "fp")
    val newS = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "fp")
    val got = MergeOps.snapshotDiff(oldS, newS, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 1: null == null -> same (suppressed); id 2: x -> null = changed;
    // id 3: present only in old (with a null fp!) -> removed, not aliased
    assert(got === Map(2L -> "changed", 3L -> "removed"))
  }
}
