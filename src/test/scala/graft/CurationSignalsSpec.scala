package graft

import graft.functions.TextFunctions
import graft.operators.{Anonymize, Association, Dedup, Frequency, RobustStats}
import org.apache.spark.sql.functions._

/** The q179-q183 wave: Gopher repetition signals, MAD outliers,
  * association rules, l-diversity, URL canonicalization + dedup.
  */
class CurationSignalsSpec extends SparkSpec {
  import spark.implicits._

  // ---- gopherRepetition -------------------------------------------------

  test("gopherRepetition: hand-computed bps on a degenerate doc") {
    // "a b a b a b": 16 chars incl spaces... actually len = 11.
    // 2-grams: "a b" x3, "b a" x2 -> top2 = 3 * 3 = 9 chars -> 9*10000/11
    // 3-grams: "a b a" x2, "b a b" x2 -> tie -> lexicographically
    //          greatest gram wins: "b a b", chars = 2 * 5 = 10
    // dup (n=3): both grams duplicated: (2+2) * 5 = 20 chars
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = Frequency.gopherRepetition(df, "doc_id", "text", dupN = 3)
      .collect().head
    assert(r.getAs[Long]("n_chars") === 11L)
    assert(r.getAs[Long]("top2_bps") === 9L * 10000 / 11)
    assert(r.getAs[Long]("top3_bps") === 10L * 10000 / 11)
    assert(r.getAs[Long]("dup_bps") === 20L * 10000 / 11)
  }

  test("gopherRepetition: short docs survive with zero signals") {
    val df = Seq((1L, "hello"), (2L, "a b")).toDF("doc_id", "text")
    val got = Frequency.gopherRepetition(df, "doc_id", "text")
      .select($"doc_id", $"top4_bps", $"dup_bps", $"pass")
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, t4, d, p) => id -> ((t4, d, p)) }.toMap
    assert(got(1L) === ((0L, 0L, true)), "1-token doc: no grams at all")
    assert(got(2L)._1 === 0L, "2-token doc has no 4-grams")
  }

  test("gopherRepetition: pass arms split on a mixed corpus") {
    val df = Seq(
      // diverse and long enough that a unique 4-gram is < 16% of chars
      (1L, (0 until 60).map(i => s"w$i").mkString(" ")),
      (2L, "spam spam spam spam spam spam") // one 2-gram owns it -> fail
    ).toDF("doc_id", "text")
    val got = Frequency.gopherRepetition(df, "doc_id", "text")
      .select($"doc_id", $"pass").as[(Long, Boolean)].collect().toMap
    assert(got(1L) === true)
    assert(got(2L) === false)
  }

  // ---- madOutliers ------------------------------------------------------

  test("madOutliers: hand example with lower medians and exact flag") {
    // values [1,2,3,100]: med = rank ceil(4/2)=2 -> 2; devs [1,0,1,98]
    // sorted [0,1,1,98] -> mad = 1; flag dev > 2*1: only 98 (value 100).
    val df = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (1L, 13L, 100L)).toDF("k", "id", "v")
    val r = RobustStats.madOutliers(df, Seq("k"), "v", "id",
      kNum = 2, kDen = 1).collect().head
    assert(r.getAs[Long]("med") === 2L)
    assert(r.getAs[Long]("mad") === 1L)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Long]("outlier_total") === 100L)
  }

  test("madOutliers: MAD=0 group flags exactly the off-spike rows") {
    val df = Seq((1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 9L))
      .toDF("k", "id", "v")
    val r = RobustStats.madOutliers(df, Seq("k"), "v", "id").collect().head
    assert(r.getAs[Long]("mad") === 0L)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("madOutliers matches a naive in-memory twin on random groups") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 0 until 8
      i <- 0 until (3 + rnd.nextInt(20))
    } yield (g.toLong, (g * 1000 + i).toLong,
      rnd.nextInt(200).toLong - 50L)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.size + 1) / 2 - 1)
    }
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._3)
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      val out = vs.filter(v => math.abs(v - med) * 2 > 3 * mad)
      g -> (med, mad, out.size.toLong)
    }
    val got = RobustStats.madOutliers(rows.toDF("g", "id", "v"),
        Seq("g"), "v", "id", kNum = 3, kDen = 2)
      .select($"g", $"med", $"mad", $"n_outliers")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === expect.size)
    got.foreach { case (g, med, mad, n) =>
      assert((med, mad, n) === expect(g), s"group $g")
    }
  }

  // ---- basketRules ------------------------------------------------------

  test("basketRules: exact counts, both directions, lift/conf cuts") {
    // B1-B3 {a,b}, B4 {a}, B5 {b,c}, B6 {c}: N=6, c_a=4, c_b=4, c_c=2,
    // c_ab=3, c_bc=1. lift(ab) = 3*6/16 = 1.125; lift(bc) = 6/8 = 0.75.
    val b = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
      (4, "a"), (5, "b"), (5, "c"), (6, "c")).toDF("basket", "item")
    val got = Association.basketRules(b, "basket", "item",
        minSupport = 1, confNum = 1, confDen = 2,
        liftNum = 1, liftDen = 1)
      .select($"ante", $"cons", $"c_ab", $"conf_bps", $"lift_milli")
      .as[(String, String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // b->c (conf 1/4) fails conf; c->b (conf 1/2) passes conf, fails lift.
    assert(got.toSeq === Seq(
      ("a", "b", 3L, 7500L, 1125L), ("b", "a", 3L, 7500L, 1125L)))
  }

  test("basketRules: confidence is direction-specific") {
    // c_a=3, c_b=4, c_ab=3: a->b conf = 1, b->a conf = 3/4.
    val b = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b"),
      (4, "b")).toDF("basket", "item")
    val got = Association.basketRules(b, "basket", "item",
        minSupport = 1, confNum = 4, confDen = 5,
        liftNum = 1, liftDen = 1)
      .select($"ante", $"cons").as[(String, String)].collect()
    assert(got.toSeq === Seq(("a", "b")))
  }

  test("basketRules: duplicate items within a basket collapse first") {
    val b = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"))
      .toDF("basket", "item")
    val got = Association.basketRules(b, "basket", "item",
        minSupport = 1, confNum = 0, confDen = 1, liftNum = 0, liftDen = 1)
      .filter($"ante" === "a").select($"c_ab", $"c_ante")
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((2L, 2L)), "dup 'a' in basket 1 counted once")
  }

  // ---- lDiversity -------------------------------------------------------

  test("lDiversity: homogeneous group fails, diverse group passes") {
    val pub = Seq(("g1", "s1"), ("g1", "s1"), ("g1", "s1"),
      ("g2", "s1"), ("g2", "s2"), ("g2", "s3")).toDF("g", "sens")
    val got = Anonymize.lDiversity(pub, Seq(col("g")), col("sens"), l = 2)
      .select($"g", $"n", $"l_distinct", $"diverse")
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got("g1") === (("g1", 3L, 1L, false)))
    assert(got("g2") === (("g2", 3L, 3L, true)))
  }

  test("l-diversity certificate holds on the q182 output at sf0.001") {
    val out = SparkEntry.queries("q182_ldiversity")(
      spark, "/root/testdata/sf0.001")
    val rows = out.select($"l_distinct", $"diverse")
      .as[(Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ld, d) => assert(d === (ld >= 3)) }
  }

  // ---- canonicalizeUrl / urlDedup ----------------------------------------

  test("canonicalizeUrl: every rule fires") {
    val cases = Seq(
      // scheme+host case, default port, fragment
      ("HTTP://WWW.Ex.COM:80/a#frag", "http://www.ex.com/a"),
      (("HTTPS://ex.com:443/a"), "https://ex.com/a"),
      // non-default port survives
      ("http://ex.com:8080/a", "http://ex.com:8080/a"),
      // trailing slashes; empty path
      ("http://ex.com/a//", "http://ex.com/a"),
      ("http://ex.com/", "http://ex.com"),
      // tracking params dropped, id whitelisted regardless of position
      ("http://ex.com/a?utm_source=x&id=7&ref=y", "http://ex.com/a?id=7"),
      ("http://ex.com/a?id=7", "http://ex.com/a?id=7"),
      ("http://ex.com/a?utm_campaign=z", "http://ex.com/a"),
      // query param case matters (id vs ID), value case preserved
      ("http://ex.com/a?ID=7", "http://ex.com/a"),
      ("http://ex.com/A?id=Xy", "http://ex.com/A?id=Xy"))
    val got = cases.map(_._1).toDF("url")
      .select(TextFunctions.canonicalizeUrl($"url").as("c"))
      .as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g === want, s"input $in")
    }
  }

  // ---- vocabCoverage ------------------------------------------------------

  test("vocabCoverage: top-k cut with (count desc, token asc) tie-break") {
    // counts: x=3, b=2, c=2, z=1. k=2 -> vocab {x, b} (b beats c on the
    // tie alphabetically). doc1 = "x b" fully covered; doc2 = "c z x" has
    // 2 OOV of 3.
    val df = Seq((1L, "x b"), (2L, "c z x"), (3L, "b c x"))
      .toDF("doc_id", "text")
    val got = Frequency.vocabCoverage(df, "doc_id", "text", k = 2)
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_bps")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2L, 0L, 0L)))
    assert(got(2L) === ((2L, 3L, 2L, 6666L)))
    assert(got(3L) === ((3L, 3L, 1L, 3333L)))
  }

  // ---- robustScale --------------------------------------------------------

  test("robustScale: disc quartiles and toward-zero division") {
    // group values 10,20,30,40 (n=4): med rank (4+1)div2=2 -> 20;
    // q1 rank (4+3)div4=1 -> 10; q3 rank (12+3)div4=3 -> 30; iqr=20.
    // scaled(10) = (10-20)*1e6 div 20 = -500000 (exact divide);
    // scaled(40) = 20*1e6 div 20 = 1000000.
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      (1L, 4L, 40L)).toDF("g", "id", "v")
    val got = RobustStats.robustScale(df, Seq("g"), "v", "id")
      .select($"id", $"med", $"q1", $"q3", $"scaled_micro")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 20L, 10L, 30L, -500000L)))
    assert(got(4L) === ((4L, 20L, 10L, 30L, 1000000L)))
    // truncation toward zero on a non-exact negative: v=15 in the same
    // group ordering... separate group: 0,10,100 -> med 10, q1 0 (rank 1),
    // q3 100 (rank 3): scaled(0) = -10e6 div 100 = -100000
    val df2 = Seq((2L, 1L, 0L), (2L, 2L, 7L), (2L, 3L, 100L))
      .toDF("g", "id", "v")
    val got2 = RobustStats.robustScale(df2, Seq("g"), "v", "id")
      .select($"id", $"scaled_micro").as[(Long, Long)].collect().toMap
    // med=7, q1=0, q3=100, iqr=100: scaled(0) = -7000000 div 100 = -70000
    assert(got2(1L) === -70000L)
    assert(got2(3L) === (93L * 1000000L) / 100L)
  }

  test("robustScale: zero-IQR group scales to 0") {
    val df = Seq((1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L), (1L, 4L, 99L))
      .toDF("g", "id", "v")
    // ranks over [5,5,5,99]: q1 rank 1 -> 5, q3 rank 3 -> 5, iqr 0
    val got = RobustStats.robustScale(df, Seq("g"), "v", "id")
      .select($"scaled_micro").as[Long].collect()
    assert(got.forall(_ === 0L))
  }

  // ---- dupClusterProfile --------------------------------------------------

  test("dupClusterProfile: exact sizes, shares, and normalization collapse") {
    val df = Seq((1L, "The cat!"), (2L, "the CAT"), (3L, "the  cat"),
      (4L, "a dog"), (5L, "a dog"), (6L, "unique one")).toDF("id", "t")
    val got = Dedup.dupClusterProfile(df, "id", "t")
      .select($"cluster_size", $"n_clusters", $"n_docs", $"docs_bps")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(3L) === ((3L, 1L, 3L, 5000L)), "the-cat triple")
    assert(got(2L) === ((2L, 1L, 2L, 3333L)), "a-dog pair")
    assert(got(1L) === ((1L, 1L, 1L, 1666L)))
  }

  // ---- containmentJoin ----------------------------------------------------

  test("containmentJoin: asymmetric — the excerpt is caught, not the host") {
    // a = 4-token excerpt (2 trigrams), b = host containing a verbatim
    // plus more (7 trigrams): containment(a in b) = 1, (b in a) = 2/7.
    val df = Seq(
      (1L, "q w e r"),
      (2L, "x y q w e r t z u")).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(df, "doc_id", "text",
        tNum = 4, tDen = 5, shingleN = 3)
      .select($"id_a", $"id_b", $"c", $"na", $"cont_bps")
      .as[(Long, Long, Long, Long, Long)].collect()
    graft.CacheScope.releaseAll()
    assert(got.toSeq === Seq((1L, 2L, 2L, 2L, 10000L)))
  }

  test("containmentJoin: prefix filter is lossless vs a naive twin") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 12).map(i => s"t$i")
    val docs = (0 until 60).map { i =>
      val n = 4 + rnd.nextInt(8)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def tris(s: String): Set[String] = {
      val t = s.split(" ")
      (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
    }
    val expect = (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia != ib
      sa = tris(ta); sb = tris(tb)
      if sa.nonEmpty
      c = (sa & sb).size
      if c * 5 >= 3 * sa.size
    } yield (ia, ib, c.toLong)).toSet
    val got = Dedup.containmentJoin(docs.toDF("doc_id", "text"),
        "doc_id", "text", tNum = 3, tDen = 5, shingleN = 3)
      .select($"id_a", $"id_b", $"c")
      .as[(Long, Long, Long)].collect().toSet
    graft.CacheScope.releaseAll()
    assert(got === expect)
  }

  // ---- fingerprintMatch / pairSetEval --------------------------------------

  test("fingerprintMatch: offset coherence outvotes scattered collisions") {
    // query q shares fps with track 1 at a CONSISTENT dt=2 (3 votes) and
    // with track 2 at scattered dts (1 vote each) — track 1 must win.
    val queries = Seq((9L, 0L, 100L), (9L, 1L, 101L), (9L, 2L, 102L))
      .toDF("media_id", "frame_idx", "fp")
    val tracks = Seq(
      (1L, 2L, 100L), (1L, 3L, 101L), (1L, 4L, 102L), // coherent dt=2
      (2L, 0L, 100L), (2L, 5L, 101L), (2L, 9L, 102L)) // scattered
      .toDF("media_id", "frame_idx", "fp")
    val got = graft.operators.Multimodal.fingerprintMatch(queries, tracks)
      .select($"query_id", $"track_id", $"dt", $"n_matches")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((9L, 1L, 2L, 3L)))
  }

  test("synthAudioClips: clip frames equal source frames shifted") {
    val M = graft.operators.Multimodal
    val src = M.audioFrames(M.synthAudio(Seq(11L).toDF("id"), "id")).toDF()
      .select($"frame_idx", $"e0", $"e1", $"e2", $"e3", $"peak_band")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // clip = frames 2..5 of track 11 (offset 512 samples, 1024 samples)
    val clip = M.audioFrames(M.synthAudioClips(
        Seq((11L, 512L, 1024L)).toDF("id", "off", "n"))).toDF()
      .select($"frame_idx", $"e0", $"e1", $"e2", $"e3", $"peak_band")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(clip.length === 4)
    clip.foreach { case (f, e0, e1, e2, e3, p) =>
      val s = src(f + 2)
      assert((e0, e1, e2, e3, p) === ((s._2, s._3, s._4, s._5, s._6)),
        s"clip frame $f != source frame ${f + 2}")
    }
  }

  test("pairSetEval: exact confusion counts and bps") {
    val pred = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (4L, 5L), (6L, 7L), (8L, 9L))
      .toDF("id_a", "id_b")
    val r = Dedup.pairSetEval(pred, truth).collect().head
    assert(r.getAs[Long]("tp") === 2L)
    assert(r.getAs[Long]("fpos") === 1L)
    assert(r.getAs[Long]("fneg") === 2L)
    assert(r.getAs[Long]("precision_bps") === 6666L)
    assert(r.getAs[Long]("recall_bps") === 5000L)
  }

  // ---- bomExtend ----------------------------------------------------------

  test("bomExtend: diamond paths sum products, min depth, path count") {
    // d -> b (5), d -> c (7), b -> a (2), c -> a (3): one d per a via b
    // costs 5*2, via c costs 7*3 -> ext 31 over 2 paths at depth 2.
    val e = Seq((10L, 2L, 5L), (10L, 3L, 7L), (2L, 1L, 2L), (3L, 1L, 3L))
      .toDF("child", "parent", "qty")
    val got = graft.operators.Graphs.bomExtend(e, "child", "parent",
        "qty", maxDepth = 3)
      .select($"ancestor", $"descendant", $"ext_qty", $"min_depth",
        $"n_paths")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 10L)) === ((31L, 2L, 2L)))
    assert(got((2L, 10L)) === ((5L, 1L, 1L)))
    assert(got((1L, 2L)) === ((2L, 1L, 1L)))
  }

  // ---- skyline2D ----------------------------------------------------------

  test("skyline2D: matches naive dominance on random points with dups") {
    val rnd = new scala.util.Random(13)
    val pts = (0 until 120).map(i =>
      (i.toLong, s"g${i % 3}", rnd.nextInt(10).toLong,
        rnd.nextInt(10).toLong))
    val expect = pts.map { case (id, g, x, y) =>
      val dominated = pts.exists { case (_, g2, x2, y2) =>
        g2 == g && x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
      id -> !dominated
    }.toMap
    val got = graft.operators.Skyline.skyline2D(
        pts.toDF("id", "g", "x", "y"), Seq(col("g")), "x", "y")
      .select($"id", $"on_frontier").as[(Long, Boolean)].collect().toMap
    assert(got === expect)
  }

  test("skyline2D: duplicate points all stay on the frontier") {
    val df = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 6L, 4L))
      .toDF("id", "x", "y").withColumn("g", lit("a"))
    val got = graft.operators.Skyline.skyline2D(df, Seq(col("g")), "x", "y")
      .select($"id", $"on_frontier").as[(Long, Boolean)].collect().toMap
    assert(got(1L) && got(2L), "identical points dominate neither")
    assert(!got(3L), "worse on both axes")
  }

  // ---- groupTrend ---------------------------------------------------------

  test("groupTrend: exact slope in micro units; zero-variance x is null") {
    val df = Seq((1L, 0L, 0L), (1L, 1L, 1000L), (1L, 2L, 2000L),
      (2L, 4L, 7L), (2L, 4L, 9L)).toDF("g", "x", "y")
    val got = graft.operators.RobustStats.groupTrend(df, Seq("g"), "x", "y")
      .select($"g", $"slope_micro").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L) === Some(1000000000L), "slope 1000/day in micro")
    assert(got(2L) === None, "all x equal: undefined slope")
  }

  // ---- topPaths -----------------------------------------------------------

  test("topPaths: ordered prefix assembly and deterministic top-k") {
    val e = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (2L, 10L, 1L, "a"), (2L, 20L, 2L, "b"), (2L, 30L, 3L, "c"),
      (3L, 10L, 1L, "a"), (3L, 20L, 2L, "x"),
      (4L, 5L, 1L, "z")).toDF("u", "ts", "eid", "state")
    val got = graft.operators.Journey.topPaths(e, "u", "state", "ts",
        "eid", prefixLen = 2, k = 2)
      .select($"path", $"n", $"share_bps").as[(String, Long, Long)]
      .collect()
    assert(got.toSeq === Seq(("a>b", 2L, 5000L), ("a>x", 1L, 2500L)))
  }

  test("topPaths: tie on count breaks by path ascending") {
    val e = Seq((1L, 1L, 1L, "b"), (2L, 1L, 1L, "a"), (3L, 1L, 1L, "c"))
      .toDF("u", "ts", "eid", "state")
    val got = graft.operators.Journey.topPaths(e, "u", "state", "ts",
        "eid", prefixLen = 1, k = 2)
      .select($"path").as[String].collect()
    assert(got.toSeq === Seq("a", "b"))
  }

  // ---- imputeLowerMedian --------------------------------------------------

  test("imputeLowerMedian: fills with group median, all-null stays null") {
    val df = Seq(
      (1L, 1L, Some(10L)), (1L, 2L, Some(30L)), (1L, 3L, Some(20L)),
      (1L, 4L, None),
      (2L, 5L, None), (2L, 6L, None)).toDF("g", "id", "v")
    val got = graft.operators.RobustStats.imputeLowerMedian(
        df, Seq("g"), "v", "id")
      .select($"id", $"imputed", $"was_imputed")
      .as[(Long, Option[Long], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(4L) === ((4L, Some(20L), true)), "lower median of 10,20,30")
    assert(got(1L) === ((1L, Some(10L), false)))
    assert(got(5L) === ((5L, None, false)), "unobserved group stays null")
  }

  // ---- hllIntersectEstimate -----------------------------------------------

  test("hllIntersectEstimate: exact twin and certificate on small sets") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L),
      ("b", 4L), ("c", 9L)).toDF("lab", "v")
    val got = graft.operators.Frequency.hllIntersectEstimate(df, "lab", "v")
      .select($"label_a", $"label_b", $"exact_overlap", $"approx_overlap",
        $"in_bounds")
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("a", "b"))._3 === 2L)
    assert(got(("a", "c"))._3 === 0L)
    // sparse-regime sketches are exact at this cardinality
    assert(got.values.forall(r => r._4 === r._3 && r._5))
  }

  // ---- activityBitmap -----------------------------------------------------

  test("activityBitmap: packed days, popcounts, WoW retention") {
    val e = Seq((1L, 0L), (1L, 7L), (1L, 14L), (1L, 8L), (1L, 7L),
      (2L, 5L)).toDF("u", "day")
    val got = graft.operators.Cohort.activityBitmap(e, "u", "day")
      .select($"user", $"bmp", $"n_active_days", $"wow_retained_days",
        $"n_weekdays")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val bmp = 1L | (1L << 7) | (1L << 8) | (1L << 14)
    assert(got(1L) === ((1L, bmp, 4L, 2L, 4L)),
      "days 7 and 14 retained week-over-week; dup day collapses")
    assert(got(2L)._3 === 1L)
  }

  test("activityBitmap: out-of-range days are excluded") {
    val e = Seq((1L, -1L), (1L, 60L), (1L, 3L)).toDF("u", "day")
    val got = graft.operators.Cohort.activityBitmap(e, "u", "day")
      .select($"bmp").as[Long].collect()
    assert(got.toSeq === Seq(8L))
  }

  // ---- geohash ------------------------------------------------------------

  test("geohash: standard test vectors") {
    val df = Seq((57.64911, 10.40744), (0.0, 0.0), (-25.382708, -49.265506))
      .toDF("lat", "lon")
    val got = df.select(graft.functions.GeoFunctions.geohash(
      $"lat", $"lon", 6).as("gh")).as[String].collect()
    // canonical geohash prefixes: u4pruydqqvj, s000000, 6gkzwgjz
    assert(got.toSeq === Seq("u4pruy", "s00000", "6gkzwg"))
  }

  // ---- rfmSegments / weekdayProfile ----------------------------------------

  test("rfmSegments: exact metrics and ntile-equivalent scores") {
    // users: 1 buys day 10 (100), 2 buys days 10+12 (50+50), 3 buys
    // day 5 (400). corpus max day = 12.
    val e = Seq((1L, 10L, 100L), (2L, 10L, 50L), (2L, 12L, 50L),
      (3L, 5L, 400L)).toDF("u", "day", "cents")
    val got = graft.operators.Cohort.rfmSegments(e, "u", "day", "cents",
        k = 3)
      .select($"user", $"r", $"f", $"m", $"segment")
      .as[(Long, Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    // r order: u2(0) u1(2) u3(7) -> 1/2/3; f order: u1(1) u3(1) u2(2)
    // -> 1/2/3 with user tie-break; m order: u1(100) u2(100) u3(400)
    assert(got(1L) === ((1L, 2L, 1L, 100L, 211L)))
    assert(got(2L) === ((2L, 0L, 2L, 100L, 132L)),
      "most recent, most frequent; m ties broken by user id")
    assert(got(3L) === ((3L, 7L, 1L, 400L, 323L)))
  }

  test("weekdayProfile: exact deviation bps around the mean") {
    // dow 0: 2 rows total 300 (avg 150); dow 1: 1 row total 100.
    // overall avg = 400/3; dev0 = (150/(400/3))-1 = 12.5% -> 1250 bps;
    // dev1 = (100/(400/3))-1 = -25% -> -2500 bps.
    val e = Seq((0L, 100L), (7L, 200L), (1L, 100L)).toDF("day", "cents")
    val got = graft.operators.Cohort.weekdayProfile(e, "day", "cents")
      .select($"dow", $"dev_bps").as[(Long, Long)].collect().toMap
    assert(got(0L) === 1250L)
    assert(got(1L) === -2500L)
  }

  // ---- sceneChanges / contentChecksum --------------------------------------

  test("sceneChanges: boundary fires on the jump, scene ids accumulate") {
    // frames: "aaaa"(388) "aaaa"(388) "zzzz"(488): jump |100|*20 >= 876
    // fires; first frame never a boundary.
    val frames = Seq((1L, 0L, "aaaa"), (1L, 1L, "aaaa"), (1L, 2L, "zzzz"))
      .toDF("media_id", "chunk_idx", "chunk")
    val got = graft.operators.Multimodal.sceneChanges(frames, 1, 20)
      .select($"frame_idx", $"energy", $"is_boundary", $"scene_id")
      .as[(Long, Long, Boolean, Long)].collect().sortBy(_._1)
    assert(got(0) === ((0L, 388L, false, 0L)))
    assert(got(1) === ((1L, 388L, false, 0L)))
    assert(got(2) === ((2L, 488L, true, 1L)))
  }

  test("contentChecksum: order- and partitioning-invariant") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
    val b = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("k", "s")
      .repartition(7)
    val ca = graft.operators.Expectations.contentChecksum(
      a, Seq(col("k"), col("s"))).collect().head
    val cb = graft.operators.Expectations.contentChecksum(
      b, Seq(col("k"), col("s"))).collect().head
    assert(ca === cb)
    // any value change moves the sum
    val cc = graft.operators.Expectations.contentChecksum(
      Seq((1L, "x"), (2L, "y"), (3L, "w")).toDF("k", "s"),
      Seq(col("k"), col("s"))).collect().head
    assert(cc !== ca)
  }

  // ---- deltaEncode / prefixCompletions / groupPercentiles -----------------

  test("deltaEncode: base + deltas reconstruct; singleton has empty deltas") {
    val df = Seq((1L, 100L), (1L, 107L), (1L, 103L), (2L, 50L))
      .toDF("k", "t")
    val got = graft.operators.Packing.deltaEncode(df, Seq("k"), "t")
      .select($"k", $"base", $"n", $"span", $"deltas")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 100L, 3L, 7L, "3,4")))
    assert(got(2L) === ((2L, 50L, 1L, 0L, "")))
  }

  test("prefixCompletions: vocabulary prefixes, count-then-token order") {
    val df = Seq((1L, "cat cat car dog")).toDF("id", "t")
    val got = graft.operators.Frequency.prefixCompletions(df, "t",
        maxPrefix = 2, k = 2)
      .select($"prefix", $"token", $"rank")
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("c", "cat", 1L)) && got.contains(("c", "car", 2L)))
    assert(got.contains(("ca", "cat", 1L)) && got.contains(("ca", "car", 2L)))
    assert(got.contains(("d", "dog", 1L)))
  }

  test("groupPercentiles: exact disc ranks") {
    // 1..100 in one group: p50 rank ceil(50)=50 -> 50; p95 rank 95; p99 99
    val df = (1L to 100L).map(v => (1L, v, v)).toDF("g", "id", "v")
    val r = graft.operators.RobustStats.groupPercentiles(df, Seq("g"),
      "v", "id", Seq((1, 2), (19, 20), (99, 100))).collect().head
    assert(r.getAs[Long]("p50") === 50L)
    assert(r.getAs[Long]("p95") === 95L)
    assert(r.getAs[Long]("p99") === 99L)
    assert(r.getAs[Long]("n") === 100L)
  }

  // ---- eventDedupWindow / linearAttribution --------------------------------

  test("eventDedupWindow: adjacent-arrival rule, bursts collapse") {
    // t=0,100,250 (burst, window 200): 100 dup of 0; 250 dup of 100
    // (adjacent), even though 250-0 > 200. t=1000 survives.
    val df = Seq((1L, 0L, 1L), (1L, 100L, 2L), (1L, 250L, 3L),
      (1L, 1000L, 4L)).toDF("k", "t", "id")
    val got = graft.operators.Dedup.eventDedupWindow(
        df, Seq("k"), "t", "id", windowSec = 200)
      .select($"id", $"is_dup").as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> false))
  }

  test("linearAttribution: exact conservation incl. remainder to latest") {
    // purchase 100 cents at t=100 with touches view@10, click@20:
    // 1e8 micro splits 50_000_000 each, remainder 0; purchase 101 at
    // t=200 with 3 touches: 101e6*... 101_000_000... div 3 = 33_666_666
    // x3 + rem 2 to the LATEST (click@90).
    val purchases = Seq((1L, 100L, 11L, 100L), (2L, 200L, 12L, 101L))
      .toDF("u", "ts", "event_id", "cents")
    val touches = Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 50L, "view"), (2L, 70L, "view"), (2L, 90L, "click"))
      .toDF("u", "ts", "touch_type")
    val got = graft.operators.AsofJoin.linearAttribution(
        purchases, touches, Seq("u"), "ts", "touch_type", "cents",
        toleranceUs = 1000L)
      .select($"touch_type", $"n_credits", $"credit_micro_total")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val total = got.values.map(_._3).sum
    assert(total === (100L + 101L) * 1000000L, "micro conservation")
    assert(got("click")._3 === 50000000L + 33666666L + 2L)
    assert(got("view")._3 === 50000000L + 2L * 33666666L)
  }

  test("linearAttribution: no-touch purchase credits none in full") {
    val purchases = Seq((9L, 100L, 1L, 77L)).toDF("u", "ts", "event_id",
      "cents")
    val touches = Seq((8L, 10L, "view")).toDF("u", "ts", "touch_type")
    val got = graft.operators.AsofJoin.linearAttribution(
        purchases, touches, Seq("u"), "ts", "touch_type", "cents", 1000L)
      .as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("none", 1L, 77000000L)))
  }

  // ---- modularity -----------------------------------------------------------

  test("modularity: exact per-community contributions and cuts") {
    // triangle {1,2,3} + edge {4,5}: m=4; both communities contribute
    // (4m·e_in − d_sum²)/(4m²) = 12/64 = 187500 micro; cut 0.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L)).toDF("a", "b")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "c")
    val got = graft.operators.Graphs.modularity(e, "a", "b", lab, "id", "c")
      .select($"community", $"e_in", $"d_sum", $"cut", $"q_micro")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 6L, 0L, 187500L)))
    assert(got(4L) === ((4L, 1L, 2L, 0L, 187500L)))
  }

  test("modularity: cross-community edges appear in the cut") {
    // path 1-2-3-4 split {1,2} | {3,4}: each side e_in=1, d_sum=3,
    // cut=1; q = (12-9)/36 = 83333 micro (floor).
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("id", "c")
    val got = graft.operators.Graphs.modularity(e, "a", "b", lab, "id", "c")
      .select($"community", $"e_in", $"cut", $"q_micro")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1L, 1L, 83333L)))
    assert(got(3L) === ((3L, 1L, 1L, 83333L)))
  }

  // ---- nullProfile / skewReport / twoProportionTest ------------------------

  test("nullProfile: one-scan rates incl. the zero arm") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (Some(3), None),
      (None, None)).toDF("x", "y").withColumn("z", lit("k"))
    val got = graft.operators.Expectations.nullProfile(df,
        Seq("x", "y", "z"))
      .select($"column", $"n_null", $"null_bps")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("x") === (("x", 2L, 5000L)))
    assert(got("y") === (("y", 2L, 5000L)))
    assert(got("z") === (("z", 0L, 0L)))
  }

  test("skewReport: hot key share and skew factor") {
    // keys: a x6, b x2, c x2 -> total 10, 3 keys, max 6:
    // skew_milli = 6*3*1000 div 10 = 1800; share(a) = 6000 bps.
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val got = graft.operators.Salting.skewReport(df, "k", k = 2)
      .select($"rank", $"key", $"share_bps", $"skew_milli")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, "a", 6000L, 1800L)))
    assert(got(1)._2 === "b", "count tie broken by key asc")
  }

  test("twoProportionTest: known significant and degenerate cases") {
    // n=100 each, 50 vs 20 converters: z^2 ~ 19 >> 3.84 -> significant.
    val rows = (0 until 100).map(i => ("a", i < 50)) ++
      (0 until 100).map(i => ("b", i < 20))
    val sig = graft.operators.Experiment.twoProportionTest(
      rows.toDF("v", "c"), "v", col("c")).collect().head
    assert(sig.getAs[Boolean]("significant"))
    assert(sig.getAs[Long]("diff_bps") === 3000L)
    // identical rates: never significant; all-converted: degenerate
    val same = (0 until 50).map(i => ("a", i < 10)) ++
      (0 until 50).map(i => ("b", i < 10))
    assert(!graft.operators.Experiment.twoProportionTest(
      same.toDF("v", "c"), "v", col("c")).collect().head
      .getAs[Boolean]("significant"))
    val allc = Seq(("a", true), ("a", true), ("b", true))
    assert(!graft.operators.Experiment.twoProportionTest(
      allc.toDF("v", "c"), "v", col("c")).collect().head
      .getAs[Boolean]("significant"), "zero pooled variance")
  }

  test("urlDedup: smallest id wins per canonical group") {
    val df = Seq(
      (3L, "http://EX.com/a?utm_source=t"),
      (1L, "http://ex.com/a/"),
      (2L, "http://ex.com/b"))
      .toDF("id", "url")
    val got = Dedup.urlDedup(df, "url", "id")
      .select($"id", $"canonical_url", $"n_urls", $"keep")
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0) === ((1L, "http://ex.com/a", 2L, true)))
    assert(got(1) === ((2L, "http://ex.com/b", 1L, true)))
    assert(got(2) === ((3L, "http://ex.com/a", 2L, false)))
  }
}
