package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, stable under corpus growth") {
    val small = (1L to 200L).toDF("id")
    val grown = (1L to 400L).toDF("id")
    val s1 = Sampling.hashSplit(small, "id", 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.hashSplit(grown, "id", 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Existing rows never move across the split when rows are added.
    assert(s1.forall { case (id, sp) => s2(id) == sp })
    // 64/256 = 25% expected; loose bound just guards against degenerate
    // all-one-side behavior.
    val frac = s1.values.count(_ == "test").toDouble / s1.size
    assert(frac > 0.10 && frac < 0.45, s"test fraction $frac")
    // Rerun identical (no RNG anywhere).
    val s1b = Sampling.hashSplit(small, "id", 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s1b)
  }

  test("hashSample with 256 buckets keeps every row") {
    // regression: f"%02x" renders 256 as "100" and the 2-char hex bucket
    // compares lexicographically, which silently kept ~6% of rows
    val df = (1L to 500L).toDF("id")
    assert(Sampling.hashSample(df, "id", 256).count() === 500L)
  }

  test("hashSample is the test-side filter of the same bucketing") {
    val df = (1L to 300L).toDF("id")
    val sampled = Sampling.hashSample(df, "id", 64).as[Long].collect().toSet
    val split = Sampling.hashSplit(df, "id", 64)
      .filter(col("split") === "test").select("id").as[Long].collect().toSet
    assert(sampled === split)
  }

  test("stratifiedTake: exactly min(n, |stratum|) per stratum, stable") {
    val df = (Seq.tabulate(30)(i => (if (i < 20) "a" else "b", i.toLong))
      :+ ("c", 99L)).toDF("g", "id")
    val taken = Sampling.stratifiedTake(df, Seq("g"), "id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySize = taken.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySize === Map("a" -> 5, "b" -> 5, "c" -> 1))
    val again = Sampling.stratifiedTake(df, Seq("g"), "id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(taken.sorted === again.sorted)
  }

  test("quantileBins matches ntile semantics incl. uneven remainder") {
    // 10 rows into 4 bins: sizes 3,3,2,2 (larger buckets first).
    val df = (1L to 10L).map(i => (i * 10.0, i)).toDF("v", "id")
    val got = Sampling.quantileBins(df, "v", "id", 4)
      .orderBy("v").select("id", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2) ===
      Array(1L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 4L, 4L))
    spark.catalog.clearCache()
  }

  test("quantileBins: n < k gives one row per leading bin") {
    val df = Seq((5.0, 1L), (1.0, 2L), (3.0, 3L)).toDF("v", "id")
    val got = Sampling.quantileBins(df, "v", "id", 10)
      .orderBy("v").select("id", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Array((2L, 1L), (3L, 2L), (1L, 3L)))
    spark.catalog.clearCache()
  }

  test("weightedMix: salted independent sampling, tags, no shuffle") {
    val a = (1L to 400L).toDF("id")
    val b = (1L to 400L).toDF("id") // SAME key space as a
    val mixed = Sampling.weightedMix(
      Seq(("a", a, 128), ("b", b, 128)), "id")
    val rows = mixed.collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val inA = rows.filter(_._2 == "a").map(_._1).toSet
    val inB = rows.filter(_._2 == "b").map(_._1).toSet
    // both ~50%; the salt makes the selections INDEPENDENT — overlap
    // ~25%, far from the 50% an unsalted shared hash would produce
    assert(inA.size > 140 && inA.size < 260, s"|A|=${inA.size}")
    assert(inB.size > 140 && inB.size < 260, s"|B|=${inB.size}")
    val overlap = (inA & inB).size.toDouble / 400
    assert(overlap > 0.10 && overlap < 0.40,
      s"overlap $overlap — selections look correlated")
    // buckets=256 keeps everything; stateless plan (no exchange)
    val all = Sampling.weightedMix(Seq(("x", a, 256)), "id")
    assert(all.count() === 400)
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mix must not shuffle:\n$plan")
  }

  test("tokenBudgetSelect matches an independent md5-order twin") {
    val df = (1L to 40L).map(i => (i, 10L + i % 7)).toDF("id", "tok")
    val budget = 200L
    val got = Sampling.tokenBudgetSelect(df, "id", col("tok"), budget, "sd")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // independent twin: JDK md5, same (hex-prefix, id) order, prefix sum
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = md.digest(s"sd$id".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    val ordered = (1L to 40L).map(i => (i, 10L + i % 7))
      .sortBy { case (id, _) => (h(id), id) }
    var acc = 0L
    val expect = ordered.flatMap { case (id, t) =>
      acc += t
      if (acc <= budget) Some((id, t, acc)) else None
    }.sortBy(_._1)
    assert(got.toSeq === expect)
    spark.catalog.clearCache()
  }

  test("tokenBudgetSelect: growing budgets give nested prefixes") {
    val df = (1L to 60L).map(i => (i, 5L + i % 11)).toDF("id", "tok")
    def ids(b: Long) =
      Sampling.tokenBudgetSelect(df, "id", col("tok"), b, "s")
        .select("id").as[Long].collect().toSet
    val small = ids(100L)
    val big = ids(300L)
    assert(small.nonEmpty && small.size < big.size)
    assert(small.subsetOf(big), "budget growth must only append")
    spark.catalog.clearCache()
  }

  test("topKPerGroup: ranked cap per stratum, deterministic ties") {
    val df = Seq(
      ("a", 1L, 50L), ("a", 2L, 90L), ("a", 3L, 90L), ("a", 4L, 10L),
      ("b", 5L, 7L)).toDF("g", "id", "score")
    val got = Sampling.topKPerGroup(df, Seq("g"), 2,
      col("score").desc, col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: scores 90,90 win; tie broken by id (2 before 3)
    assert(got === Set(("a", 2L), ("a", 3L), ("b", 5L)))
    // plan: one hash exchange on the strata, never a global sort, and
    // Spark's rank-limit pushdown (WindowGroupLimit) bounds each task to
    // k rows per group BEFORE the exchange — the shuffle carries at most
    // k * |groups| rows per map task, the 100 TB-safe shape
    val plan = Sampling.topKPerGroup(df, Seq("g"), 2,
      col("score").desc, col("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(g"),
      s"expected strata hash exchange:\n$plan")
    assert(!"(?i)rangepartitioning".r.findFirstIn(plan).isDefined,
      s"global sort crept in:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing (map-side top-k lost):\n$plan")
  }

  test("tokenBudgetSelect plan has no global window") {
    val df = (1L to 100L).map(i => (i, 7L)).toDF("id", "tok")
    val plan = Sampling.tokenBudgetSelect(df, "id", col("tok"), 300L, "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window crept in:\n$plan")
    spark.catalog.clearCache()
  }

  test("quantileBins plan stays distributed (no single-partition window)") {
    val df = (1L to 100L).map(i => (i * 1.0, i)).toDF("v", "id")
    val plan = Sampling.quantileBins(df, "v", "id", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "global window would single-partition")
    spark.catalog.clearCache()
  }

  test("per-group quantile bins equal SQL ntile; no window in the plan") {
    // groups of 7 and 3 rows into k=3 bins: ntile gives 3/2/2 and 1/1/1
    val df = (Seq.tabulate(7)(i => ("a", (i * 13) % 7, i.toLong)) ++
      Seq.tabulate(3)(i => ("b", 2 - i, 100L + i)))
      .toDF("src", "v", "id")
    val got = Sampling.quantileBinsByGroup(df, "src", "v", "id", 3)
    val expected = df.selectExpr("src", "v", "id",
      "CAST(ntile(3) OVER (PARTITION BY src ORDER BY v, id) AS LONG) AS bin")
    assert(got.exceptAll(expected).count() === 0L)
    assert(expected.exceptAll(got).count() === 0L)
    // scale pin: the whole point is NO per-group window — one task per
    // dominant source would never finish at corpus scale
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"per-group binning fell back to a window:\n$plan")
  }

  test("leakage-safe split: near-dup pairs never straddle the split") {
    // the q87 composition in miniature: component-keyed hashSplit means
    // two docs in one dedup component get ONE coin flip, not two
    val docs = (1L to 100L).toDF("doc_id")
    val pairs = Seq( // three components: {1,2,3}, {10,11}, rest singleton
      (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comps = graft.operators.Graphs.connectedComponents(
      pairs, "id_a", "id_b", docs, "doc_id")
    val split = Sampling.hashSplit(
      comps.select(col("id").as("doc_id"), col("component")),
      "component", 64)
    val side = split.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(side.size === 100)
    assert(side(1L) === side(2L) && side(2L) === side(3L))
    assert(side(10L) === side(11L))
    // both sides populated across the 100 docs
    assert(side.values.toSet === Set("train", "test"))
  }
}

class ContrastiveNegativesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 20L).toDF("doc_id")

  test("deterministic: identical pairing across runs, k rows per anchor " +
    "minus self-hits") {
    val a = Sampling.contrastiveNegatives(docs, "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sampling.contrastiveNegatives(docs, "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.forall { case (anchor, _, neg) => anchor != neg })
    // every (anchor, j) appears at most once; at most k per anchor
    val perAnchor = a.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ <= 3))
    assert(a.map(t => (t._1, t._2)).size === a.size)
  }

  test("hash addressing matches the independent md5 computation") {
    // ids 0..19 are dense, so global index == id; recompute a draw by
    // hand: neg(a, j) = first-8-hex(md5("a:j")) mod 20
    val got = Sampling.contrastiveNegatives(docs, "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for (a <- 0L until 20L; j <- 1L to 2L) {
      val hex = md.digest(s"$a:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val neg = java.lang.Long.parseLong(hex, 16) % 20L
      if (neg != a) assert(got((a, j)) === neg, s"anchor $a draw $j")
      else assert(!got.contains((a, j)), s"self-pair ($a,$j) must drop")
    }
  }

  test("exclusion pairs are anti-joined in both orientations") {
    val all = Sampling.contrastiveNegatives(docs, "doc_id", 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(all.nonEmpty)
    val (x, y) = all.head
    val ex = Seq((x min y, x max y)).toDF("id_a", "id_b")
    val kept = Sampling.contrastiveNegatives(docs, "doc_id", 4, Some(ex))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(!kept.contains((x, y)) && !kept.contains((y, x)))
    assert(kept.subsetOf(all.toSet))
  }
}

class CohortSpec extends SparkSpec {
  import spark.implicits._

  test("retention matrix: cohorts by first bucket, counts and sizes") {
    // u1 first at 10, active 10,11,13; u2 first at 10, active 10 only;
    // u3 first at 11, active 11,13; duplicate activity rows collapse
    val ev = Seq((1L, 10L), (1L, 10L), (1L, 11L), (1L, 13L),
      (2L, 10L), (3L, 11L), (3L, 13L))
      .toDF("uid", "bk")
    val got = graft.operators.Cohort.retention(ev, "uid", "bk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      (10L, 0L, 2L, 2L), (10L, 1L, 1L, 2L), (10L, 3L, 1L, 2L),
      (11L, 0L, 1L, 1L), (11L, 2L, 1L, 1L)))
  }

  test("temperatureMix: sqrt quotas, whole-source arm, head cap") {
    // counts: a=100, b=25, c=4. cap=10, tau=1/2:
    //   quota_a = floor(10*sqrt(100)/sqrt(100)) = 10 (clipped, 100 > 10)
    //   quota_b = floor(10*5/10) = 5  (clipped)
    //   quota_c = floor(10*2/10) = 2  (clipped)
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 125).map(i => (i.toLong, "b")) ++
      (126 to 129).map(i => (i.toLong, "c"))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "src", "id", cap = 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc === Map("a" -> 10, "b" -> 5, "c" -> 2))
    assert(out.filter(_._1 == "b").forall(t => t._2 == 25L && t._3 == 5L))
    // cap 60: b's quota 30 > 25 rows -> whole source kept.
    val whole = Sampling.temperatureMix(df, "src", "id", cap = 60)
      .collect().map(r => r.getString(1)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(whole("b") === 25)
  }

  test("temperatureMix: halvings=2 is tau=1/4; takes nest as cap grows") {
    // counts 16 vs 1: tau=1/4 quota_small = floor(8 * (1/16)^(1/4)) = 4.
    val df = ((1 to 16).map(i => (i.toLong, "big")) ++
      Seq((100L, "tiny"))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "src", "id", cap = 8, halvings = 2)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(out.count(_._1 == "big") === 8)
    assert(out.count(_._1 == "tiny") === 1) // quota 4 but only 1 row
    // Monotone nesting: the cap-4 take is a subset of the cap-8 take.
    val small = Sampling.temperatureMix(df, "src", "id", cap = 4, halvings = 2)
      .collect().map(r => r.getLong(0)).toSet
    val large = out.map(_._2).toSet
    assert(small.subsetOf(large))
  }

  test("weightedTake: weight-biased, deterministic, excludes w<=0") {
    // 50 groups, each with one heavy (w=1e6) and nine light (w=1) rows:
    // priority u^(1/w) -> heavy ~ u^1e-6 ~ 1, so k=1 picks the heavy
    // row in almost every group
    val rows = for (g <- 1 to 50; i <- 0 to 9)
      yield (s"g$g", g * 100L + i, if (i == 0) 1000000L else 1L)
    val df = rows.toDF("grp", "id", "w")
    val takeOne = Sampling.weightedTake(df, Seq("grp"), "id", "w", 1)
      .collect().map(r => r.getLong(1))
    assert(takeOne.length === 50)
    val heavyWins = takeOne.count(_ % 100 == 0)
    assert(heavyWins >= 45, s"heavy row won only $heavyWins/50 groups")
    // deterministic rerun
    val again = Sampling.weightedTake(df, Seq("grp"), "id", "w", 1)
      .collect().map(r => r.getLong(1))
    assert(takeOne.toSeq === again.toSeq)
    // zero/negative weights never selected, even when k exceeds the rest
    val withZero = (rows :+ (("g1", 9999L, 0L))).toDF("grp", "id", "w")
    val all = Sampling.weightedTake(withZero, Seq("grp"), "id", "w", 100)
      .collect().map(r => r.getLong(1))
    assert(!all.contains(9999L))
    assert(all.length === 500)
  }

  test("offset-0 row always counts the whole cohort") {
    val rnd = new scala.util.Random(5)
    val ev = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(12).toLong))
      .toDF("uid", "bk")
    val rows = graft.operators.Cohort.retention(ev, "uid", "bk").collect()
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) === r.getLong(3), s"cohort ${r.getLong(0)}")
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
  }
}
