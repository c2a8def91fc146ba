package graft

import java.nio.file.Files

import graft.operators.{Frequency, Graphs, RangeJoin}
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Force the distributed propagation loop (the small-graph driver
    * fast path would otherwise absorb every fixture-sized graph) for
    * tests that pin LOOP mechanics rather than results.
    */
  private def withDistributedCC[T](body: => T): T = {
    spark.conf.set("spark.graft.ccSmallGraphEdges", "0")
    try body finally spark.conf.unset("spark.graft.ccSmallGraphEdges")
  }

  test("small-graph fast path equals the distributed loop") {
    // random graphs, both paths, identical (id, component) sets
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .toDF("src", "dst")
      val nodes = (0L until 30L).toDF("id")
      val fast = Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val loop = withDistributedCC {
        Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(fast === loop, s"trial $trial")
      spark.catalog.clearCache()
    }
  }

  test("fast path confines edges to the node universe (loop parity)") {
    // 1-2 via out-of-universe node 50: the loop never propagates through
    // an unlabeled node, so 1 and 2 stay separate — the fast path must
    // agree, not union-find through 50.
    val edges = Seq((1L, 50L), (50L, 2L), (3L, 4L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val fast = Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === Set((1L, 1L), (2L, 2L), (3L, 3L), (4L, 3L)))
    val loop = withDistributedCC {
      Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(fast === loop)
    spark.catalog.clearCache()
  }

  test("connected components: chain, clique, isolated node") {
    // Components: {1,2,3,4} (chain), {10,11,12} (triangle), {99} isolated.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L).toDF("id")
    val got = Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Array(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L), (99L, 99L)))
    spark.catalog.clearCache()
  }

  test("connected components: long chain needs diameter rounds") {
    // Path 0-1-2-...-9: min label must travel 9 hops (distributed loop).
    withDistributedCC {
      val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
      val nodes = (0L to 9L).toDF("id")
      val got = Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got.values.toSet === Set(0L))
      assert(got.size === 10)
      spark.catalog.clearCache()
    }
  }

  test("one driver-synchronized job per propagation round") {
    // The convergence tally rides the checkpoint-materialization job via
    // accumulator; a separate count() per round would add one job per
    // round (and the loop is latency-bound on job turnaround). A TOTAL
    // job cap proved brittle (constant overhead — init checkpoints, final
    // collect, broadcast builds — shifts with planner details), so pin
    // the PER-ROUND slope instead: run two chain lengths and divide the
    // job-count delta by the round delta. Constant terms cancel; only
    // the per-round shape (one materialization action + its
    // broadcast-build jobs) remains.
    def jobsFor(chainEdges: Int, tag: String): Int = withDistributedCC {
      val edges = (0L until chainEdges.toLong).map(i => (i, i + 1))
        .toDF("src", "dst")
      val nodes = (0L to chainEdges.toLong).toDF("id")
      val group = s"cc-job-count-$tag"
      spark.sparkContext.setJobGroup(group, group)
      try {
        val got = Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
          .collect()
        assert(got.length === chainEdges + 1 &&
          got.forall(_.getLong(1) === 0L))
      } finally spark.sparkContext.clearJobGroup()
      spark.catalog.clearCache()
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    // AQE materializes shuffle stages as their own jobs, which would
    // drown the signal; with it off, one action == one job exactly.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // chain of d edges converges in d rounds + 1 stability round
      val shortJobs = jobsFor(2, "short") // 3 rounds
      val longJobs = jobsFor(5, "long")   // 6 rounds
      val perRound = (longJobs - shortJobs) / 3.0
      // Measured today: 2.0 (the materialization action + one
      // broadcast-build job per round). The old count()-per-round shape
      // adds exactly +1.0; cap halfway with margin for planner drift.
      assert(perRound <= 2.5,
        s"per-round job slope $perRound (short=$shortJobs, long=$longJobs) " +
          "— a second driver-synchronized action per round has crept in")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("reliable checkpoint mode survives the same loop (conf switch)") {
    // spark.graft.reliableCheckpoint=true routes every truncation point
    // through checkpoint() into the checkpoint dir instead of executor
    // block storage — the cluster-safe mode (executor loss invalidates
    // local checkpoint blocks). Same results, both algorithms.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
      .toFile.getAbsolutePath
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    // the loop (not the small-graph fast path) is what reliable mode
    // changes — force it
    spark.conf.set("spark.graft.ccSmallGraphEdges", "0")
    try {
      val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
      val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
      val expect = Set((1L, 1L), (2L, 1L), (3L, 1L),
        (10L, 10L), (11L, 10L), (99L, 99L))
      val lp = Graphs.connectedComponents(edges, "src", "dst", nodes, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(lp === expect)
      val ln = Graphs.connectedComponentsLogN(edges, "src", "dst",
        nodes, "id", smallGraphFastPath = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ln === expect)
      // reliable mode must actually write there (not silently fall back)
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, "checkpoint dir is empty")
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpoint")
      spark.conf.unset("spark.graft.ccSmallGraphEdges")
      spark.catalog.clearCache()
    }
  }

  test("componentKeepers: one keeper per component with size") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("id", "component")
    val got = Graphs.componentKeepers(comps).orderBy("keep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Array((1L, 3L), (9L, 1L)))
  }
}

class LogNComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def byLabelProp(edges: org.apache.spark.sql.DataFrame,
                          nodes: org.apache.spark.sql.DataFrame) =
    Graphs.connectedComponents(edges, "a", "b", nodes, "id", maxIter = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def byLogN(edges: org.apache.spark.sql.DataFrame,
                     nodes: org.apache.spark.sql.DataFrame,
                     fastPath: Boolean = true) =
    Graphs.connectedComponentsLogN(edges, "a", "b", nodes, "id",
      smallGraphFastPath = fastPath)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("logN fast path equals the distributed star rounds") {
    val rnd = new scala.util.Random(23)
    for (caseNo <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      val nodes = (0L until n.toLong).toDF("id")
      val edges = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).toDF("a", "b")
      assert(byLogN(edges, nodes, fastPath = true) ===
        byLogN(edges, nodes, fastPath = false), s"case $caseNo")
      spark.catalog.clearCache()
    }
    // the star form's out-of-universe quirk must be mirrored: node 50 is
    // not in `nodes` yet min flows THROUGH it, and 50 itself (a non-min
    // endpoint) is emitted; the component min (1) labels everything
    val nodes = Seq(1L, 2L, 9L).toDF("id")
    val edges = Seq((1L, 50L), (50L, 2L)).toDF("a", "b")
    val expect = byLogN(edges, nodes, fastPath = false)
    assert(byLogN(edges, nodes, fastPath = true) === expect)
    assert(expect === Set(2L -> 1L, 50L -> 1L, 1L -> 1L, 9L -> 9L))
  }

  test("equals min-label propagation on random graphs") {
    val rnd = new scala.util.Random(17)
    for (caseNo <- 1 to 4) {
      val n = 40 + rnd.nextInt(40)
      val nodes = (0L until n.toLong).toDF("id")
      val edges = Seq.fill(n / 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).toDF("a", "b")
      assert(byLogN(edges, nodes) === byLabelProp(edges, nodes),
        s"case $caseNo (n=$n)")
    }
  }

  test("long chain: converges in far fewer rounds than the diameter") {
    // path of 64 nodes: label propagation needs ~diameter rounds;
    // star-contraction collapses it in O(log n) — force the distributed
    // rounds, the thing this test exists to exercise
    val nodes = (0L until 64L).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val got = byLogN(edges, nodes, fastPath = false)
    assert(got === (0L until 64L).map(_ -> 0L).toSet)
  }

  test("isolated nodes and self-loop edges") {
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 3L)).toDF("a", "b")
    assert(byLogN(edges, nodes) ===
      Set(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned point-in-interval matches the naive range join") {
    val points = Seq(("u", 5L), ("u", 10L), ("u", 25L), ("u", 99L),
      ("v", 10L)).toDF("k", "ts")
    // Interval spanning several bins, an adjacent one, another key.
    val ivs = Seq(("u", 1L, 0L, 30L), ("u", 2L, 31L, 40L),
      ("v", 3L, 10L, 10L)).toDF("k", "iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, Seq("k"), "ts",
        "lo", "hi", binSize = 7L)
      .select("k", "ts", "iv_id").orderBy("k", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(
      ("u", 5L, 1L), ("u", 10L, 1L), ("u", 25L, 1L), ("v", 10L, 3L)))
  }

  test("plan is an equi-join, not a broadcast nested loop") {
    val points = (1L to 100L).map(i => ("u", i)).toDF("k", "ts")
    val ivs = Seq(("u", 1L, 10L, 20L)).toDF("k", "iv_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, ivs, Seq("k"), "ts",
        "lo", "hi", binSize = 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "binned range join must plan as an equi-join")
  }

  test("inclusive bounds and no-key variant") {
    val points = Seq(Tuple1(0L), Tuple1(30L), Tuple1(31L)).toDF("ts")
    val ivs = Seq((1L, 0L, 30L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, Nil, "ts",
        "lo", "hi", binSize = 100L)
      .select("ts").orderBy("ts").as[Long].collect()
    assert(got === Array(0L, 30L))
  }
}

class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("topK: deterministic tie-break (count desc, value asc)") {
    val df = Seq("b", "b", "c", "c", "a", "d").toDF("v")
    val got = Frequency.topK(df, col("v"), 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // b and c tie at 2 (b first), a and d tie at 1 (a first).
    assert(got === Array(("b", 2L), ("c", 2L), ("a", 1L)))
  }

  test("termDocStats: tf per (doc, token), df per token") {
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val got = Frequency.termDocStats(docs, "doc_id", "text")
      .orderBy("doc_id", "token")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got === Array(
      (1L, "x", 2L, 2L), (1L, "y", 1L, 1L), (2L, "x", 1L, 2L),
      (2L, "z", 1L, 1L)))
  }

  test("termDocStats: hot token (in every doc) uses partial agg, no window") {
    // A token present in every document is the 100 TB killer for a
    // `count(*) over (partition by token)` df: the window has no map-side
    // combine, so one reducer receives ~n_docs rows. The aggregate+join
    // plan must show partial aggregation on the token key and no Window.
    val docs = spark.range(500L)
      .select(col("id").as("doc_id"),
        concat(lit("the unique"), col("id")).as("text"))
    val q = Frequency.termDocStats(docs, "doc_id", "text")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"expected map-side partial aggregation in:\n$plan")
    val hot = q.filter(col("token") === "the").collect()
    assert(hot.length === 500 && hot.forall(_.getLong(3) === 500L))
    val unique = q.filter(col("token") === "unique7").collect()
    assert(unique.length === 1 && unique.head.getLong(3) === 1L)
  }

  test("termDocStats scans the corpus once (tf exchange reused by df)") {
    // Over a parquet source, both the tf branch and the df branch must
    // read the SAME shuffle stage — if Catalyst prunes them apart, the
    // final AQE plan shows two FileScans and the corpus pays a second
    // scan+explode at 100 TB.
    val dir = java.nio.file.Files.createTempDirectory("graft_tds")
      .toFile.getAbsolutePath
    spark.range(200L)
      .select(col("id").as("doc_id"),
        concat(lit("the quick token"), col("id")).as("text"))
      .write.mode("overwrite").parquet(s"$dir/docs")
    val q = Frequency.termDocStats(
      spark.read.parquet(s"$dir/docs"), "doc_id", "text")
    q.collect() // finalize AQE
    val finalPlan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(finalPlan).length
    assert(scans === 1, s"expected one corpus scan, got $scans:\n$finalPlan")
  }

  test("cmsTopK: estimates never undercount and stay within eps*N") {
    val n = 5000
    val df = spark.range(n.toLong)
      .select(concat(lit("t"), (col("id") % 50)).as("v"))
    val eps = 0.01
    val got = Frequency.cmsTopK(df, col("v"), 10, eps = eps)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 10)
    got.foreach { case (v, exact, est) =>
      assert(est >= exact, s"CMS undercounted $v: $est < $exact")
      assert(est - exact <= (eps * n).toLong,
        s"CMS overshoot for $v: $est vs $exact")
    }
    // deterministic across reruns (fixed seed, commutative merge)
    val again = Frequency.cmsTopK(df, col("v"), 10, eps = eps)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === again.toSeq)
  }

  test("hll sketches: per-bucket build + union merge recovers the exact " +
    "distinct (sparse mode), across a parquet roundtrip") {
    // 300 distinct users spread over 4 day-buckets WITH overlap (user u
    // appears in buckets u%4 and (u+1)%4): a per-bucket sum would
    // double-count; only a true HLL union dedups across buckets. At this
    // cardinality lgK=12 runs in exact (sparse) mode, so the merged
    // estimate must EQUAL the exact distinct.
    val rows = (0 until 300).flatMap { u =>
      Seq(("a", u % 4, u.toLong), ("a", (u + 1) % 4, u.toLong))
    } ++ (0 until 40).map { u => ("b", u % 4, u.toLong) }
    val df = rows.toDF("grp", "bucket", "user")
    val sk = Frequency.hllSketchByBucket(df, Seq("grp"), col("bucket"),
      col("user"))
    val dir = Files.createTempDirectory("graft_hll").toString
    sk.write.mode("overwrite").parquet(dir)
    val got = Frequency.hllMergeEstimate(spark.read.parquet(dir), Seq("grp"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(("a", 300L, 600L, 4L), ("b", 40L, 40L, 4L)))
  }

  test("invertedIndex: rank order, cap, df/cf; hand-checkable corpus") {
    val docs = Seq(
      (1L, "x x x y"), (2L, "x x z"), (3L, "x y"), (4L, "z"))
      .toDF("doc_id", "text")
    val got = Frequency.invertedIndex(docs, "doc_id", "text", cap = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === Set(
      // x: df 3, cf 6; top-2 = doc 1 (tf 3), doc 2 (tf 2)
      ("x", 3L, 6L, 1L, 1L, 3L), ("x", 3L, 6L, 2L, 2L, 2L),
      // y: tf ties at 1 -> doc_id ascending
      ("y", 2L, 2L, 1L, 1L, 1L), ("y", 2L, 2L, 2L, 3L, 1L),
      ("z", 2L, 2L, 1L, 2L, 1L), ("z", 2L, 2L, 2L, 4L, 1L)))
  }

  test("invertedIndex: salted two-phase cap is lossless vs a plain rank") {
    // 400 docs all containing the hot token with distinct tfs; a lossy
    // salt prune would drop some global-top row for SOME salt layout.
    val docs = spark.range(400L).select(col("id").as("doc_id"),
      concat_ws(" ",
        concat(lit("u"), col("id")),
        expr("array_join(array_repeat('hot', cast(id % 7 + 1 as int)), ' ')"))
        .as("text"))
    val got = Frequency.invertedIndex(docs, "doc_id", "text",
        cap = 10, salts = 4)
      .filter(col("token") === "hot")
      .orderBy("rank")
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    val naive = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === "hot")
      .groupBy("doc_id").count()
      .orderBy(col("count").desc, col("doc_id").asc)
      .limit(10)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1L, r.getLong(0), r.getLong(1)) }
    assert(got === naive)
  }

  test("collocations: exact rational lift boundary and minCount cut") {
    // corpus: "a b" x 6, "a c" x 2, interleaved into docs; unigrams:
    // a 8, b 6, c 2; bigrams (within docs only): "a b" 6, "a c" 2,
    // plus junk "b a"/"c a" crossings inside the concatenated docs.
    val docs = Seq(
      (1L, "a b a b a b a c"),
      (2L, "a b a b a b a c")).toDF("doc_id", "text")
    // n_uni = 16, n_big = 14. lift(a,b) = (6*16*16)/(14*8*6) = 16/7.
    // At threshold exactly 16/7 the pair passes; at 16/7 + eps it fails.
    val at = Frequency.collocations(docs, "doc_id", "text",
        liftNum = 16, liftDen = 7, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(at.contains(("a", "b")))
    val above = Frequency.collocations(docs, "doc_id", "text",
        liftNum = 161, liftDen = 70, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!above.contains(("a", "b")))
    // minCount removes "a c" (c_ab = 2) at minCount 3 even though its
    // lift (2*256)/(14*8*2) = 16/7 matches a-b's.
    val mc = Frequency.collocations(docs, "doc_id", "text",
        liftNum = 1, liftDen = 1, minCount = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(mc.contains(("a", "b")) && !mc.contains(("a", "c")))
  }

  test("bigramLogProb: exact conditionals; order signal unigrams miss") {
    // corpus bigrams: "a b" x3, "b a" x2, "b c" x1, "c a" x1 (within
    // doc 1: a b a b a b c a => pairs ab, ba, ab, ba, bc, ca, ab? no —
    // enumerate: (a,b)(b,a)(a,b)(b,a)(a,b)(b,c)(c,a) = ab x3, ba x2,
    // bc x1, ca x1). doc 2 = "b a" alone contributes its own pair.
    val docs = Seq(
      (1L, "a b a b a b c a"),
      (2L, "b a")).toDF("doc_id", "text")
    // prefix counts: a• = 3 (ab); b• = 3+1 = ... recompute from both
    // docs: doc2 adds (b,a) => ab 3, ba 3, bc 1, ca 1.
    // a• = 3, b• = 4, c• = 1.
    def micro(c: Long) = math.round(math.log(c.toDouble) * 1e6)
    val condAB = micro(3) - micro(3)  // ln(3/3) = 0
    val condBA = micro(3) - micro(4)
    val condBC = micro(1) - micro(4)
    val condCA = micro(1) - micro(1)
    val got = Frequency.bigramLogProb(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) ===
      (7L, 3 * condAB + 2 * condBA + condBC + condCA))
    assert(got(2L) === (1L, condBA))
    // single-token doc has no bigrams and drops out
    val short = Frequency.bigramLogProb(
      Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(_.getLong(0)).toSet
    assert(short === Set(1L))
    // the order-2 signal: same unigram bag, scrambled order scores lower
    val fluent = "the cat sat the cat sat the cat sat"
    val salad = "cat the cat sat sat the sat cat the"
    val pair = Frequency.bigramLogProb(
      Seq((1L, fluent), (2L, salad), (3L, fluent)).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(pair(1L) > pair(2L))
  }

  test("collocations: bigrams never cross document boundaries") {
    val docs = Seq((1L, "p q"), (2L, "q p")).toDF("doc_id", "text")
    // only "p q" and "q p" exist (once each); no "q q" from doc1|doc2.
    val got = Frequency.collocations(docs, "doc_id", "text",
        liftNum = 1, liftDen = 100, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("p", "q"), ("q", "p")))
  }
}

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def withDistributedPR[T](body: => T): T = {
    spark.conf.set("spark.graft.pageRankSmallGraphEdges", "0")
    try body finally spark.conf.unset("spark.graft.pageRankSmallGraphEdges")
  }

  private def ranksOf(edges: org.apache.spark.sql.DataFrame) =
    Graphs.pageRank(edges, "src", "dst").collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)))
      .toMap

  test("driver fast path equals the distributed loop at round-6") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)(
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val fast = ranksOf(edges)
    val loop = withDistributedPR(ranksOf(edges))
    assert(fast === loop)
    spark.catalog.clearCache()
  }

  test("star graph: hub dominates, ranks sum to 1, near the fixed point") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graphs.pageRank(edges, "src", "dst", iterations = 60).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(0L) > r(1L))
    // closed-form fixed point: hub = base(1+3d)/(1-d^2) with d=0.85,
    // base=0.0375; the star alternates hub<->leaves so the residual
    // decays as d^iters (~6e-5 at 60 rounds)
    assert(math.abs(r(0L) - 0.0375 * (1 + 3 * 0.85) / (1 - 0.85 * 0.85))
      < 1e-3)
    assert(math.abs(r(1L) - r(2L)) < 1e-12 &&
      math.abs(r(2L) - r(3L)) < 1e-12)
  }

  test("symmetric components: every node of two disjoint edges gets 1/4") {
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val r = Graphs.pageRank(edges, "src", "dst").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size === 4)
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
  }

  test("deterministic: repeated runs produce identical bits") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(200)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = Graphs.pageRank(edges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = Graphs.pageRank(edges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a === b)
  }
}

class ClusterDiameterSpec extends SparkSpec {
  import spark.implicits._

  test("wide flag from max pairwise haversine; singleton diameter 0") {
    // Cluster 0: two points ~222 m apart (0.002 deg lat) -> wide at 150.
    // Cluster 1: two points ~11 m apart -> not wide.
    // Cluster 2: singleton -> diameter 0, not wide.
    val pts = Seq(
      ("u", 0L, 10.000, 20.0), ("u", 0L, 10.002, 20.0),
      ("u", 1L, 11.000, 20.0), ("u", 1L, 11.0001, 20.0),
      ("v", 0L, 12.000, 20.0))
      .toDF("uid", "stop_locations", "latitude", "longitude")
    val got = graft.operators.Geometry.clusterDiameters(pts, 150.0)
      .orderBy("uid", "stop_locations")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got === Array(
      ("u", 0L, 2L, 1L), ("u", 1L, 2L, 0L), ("v", 0L, 1L, 0L)))
  }

  test("chi2Association: hand contingency table, degenerate tokens filtered") {
    val docs = Seq(
      (1L, "x y", "s1"), (2L, "x z", "s1"),
      (3L, "y z", "s2"), (4L, "z w", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Frequency.chi2Association(docs, "doc_id", "text", "source", 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))))
      .toMap
    // x only in s1: n11=2 df=2 n_s1=2 N=4 -> cells (2,0,0,2),
    // chi2 = 4*(2*2-0*0)^2/(2*2*2*2) = 4
    assert(got(("x", "s1")) == ((2L, 0L, 0L, 2L, 4.0)))
    // y: one doc in each source — perfectly independent, chi2 = 0
    assert(got(("y", "s1"))._5 == 0.0)
    assert(got(("y", "s2"))._5 == 0.0)
    // z is in 3 of 4 docs (fine), but nothing with df = N may appear
    assert(got.keys.forall { case (t, _) => t != "" })
    val all = Seq((1L, "q a", "s1"), (2L, "q b", "s2"))
      .toDF("doc_id", "text", "source")
    val tokens = Frequency.chi2Association(all, "doc_id", "text", "source", 1L)
      .collect().map(_.getString(0)).toSet
    assert(!tokens.contains("q")) // df = N -> zero margin, filtered
  }

  test("chi2Association: minDf bounds the emitted vocabulary") {
    // "common" in 3 of 4 docs (df < N, so it survives the degenerate
    // filter); every rare token is below minDf = 2
    val docs = Seq(
      (1L, "common rare1", "s1"), (2L, "common rare2", "s2"),
      (3L, "common", "s1"), (4L, "filler", "s2"))
      .toDF("doc_id", "text", "source")
    val toks = Frequency.chi2Association(docs, "doc_id", "text", "source", 2L)
      .collect().map(_.getString(0)).toSet
    assert(toks == Set("common"))
  }

  test("bm25TopK matches a scalar twin and ranks tf up, length down") {
    val docs = Seq(
      (1L, "data data scan pad"),   // two query tokens, tf(data)=2
      (2L, "data scan pad pad"),    // same length, less data
      (3L, "data scan pad pad pad pad pad pad"), // longer -> penalized
      (4L, "pad pad"))              // no query terms -> absent
      .toDF("doc_id", "text")
    val got = Frequency.bm25TopK(docs, "doc_id", "text",
      Seq("data", "scan"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // scalar twin with the identical op order
    val n = 4.0; val sumDl = 4.0 + 4 + 8 + 2
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl * n / sumDl)))
    def s(tf: Double, dl: Double, df: Double) =
      math.round(idf(df) * w(tf, dl) * 1e6)
    val exp1 = s(2, 4, 3) + s(1, 4, 3)
    val exp2 = s(1, 4, 3) + s(1, 4, 3)
    val exp3 = s(1, 8, 3) + s(1, 8, 3)
    assert(got.map(t => (t._1, t._2)).toSet ==
      Set((1L, exp1), (2L, exp2), (3L, exp3)))
    // rank: doc1 (higher tf) > doc2 (same length) > doc3 (longer)
    assert(got.sortBy(_._4).map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_._3 == 2L))
  }
}

class TriangleCountsSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graphs.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in three") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(counts(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle-free graphs yield no rows") {
    // path and star: no triangles at all
    assert(counts(Seq((0L, 1L), (1L, 2L), (2L, 3L))) === Map.empty)
    assert(counts(Seq((9L, 1L), (9L, 2L), (9L, 3L))) === Map.empty)
  }

  test("star plus one leaf-leaf edge closes exactly one triangle") {
    // hub 9 with leaves 1..4; edge (1,2) closes (9,1,2) only — counts
    // at the hub and the two closing leaves, not the other leaves
    val e = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (1L, 2L))
    assert(counts(e) === Map(9L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("duplicate, reversed, and self-loop edges do not change counts") {
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val noisy = tri ++ Seq((1L, 0L), (2L, 1L), (0L, 0L), (0L, 1L))
    assert(counts(noisy) === counts(tri))
    assert(counts(tri) === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("matches naive enumeration on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60 + trial * 30)(
        (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      val und = edges.map { case (a, b) => (a min b, a max b) }
        .filter { case (a, b) => a != b }.distinct.toSet
      val naive = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for {
        (a, b) <- und; c <- 0L until 20L
        if b < c && und((a, c)) && und((b, c))
      } { naive(a) += 1; naive(b) += 1; naive(c) += 1 }
      assert(counts(edges) === naive.toMap)
    }
  }
}

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long)], seeds: Seq[Long],
                    maxHops: Int): Map[Long, Long] =
    Graphs.bfsDistances(edges.toDF("src", "dst"), "src", "dst",
      seeds.toDF("id"), "id", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: hop cap truncates the reach") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(dists(path, Seq(0L), 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(dists(path, Seq(0L), 0) === Map(0L -> 0L))
  }

  test("multi-source: distance is the min over seeds") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(dists(path, Seq(0L, 5L), 4) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("disconnected nodes are absent; isolated seeds report 0") {
    // component {0,1} seeded, component {5,6} not, seed 9 isolated
    val e = Seq((0L, 1L), (5L, 6L))
    assert(dists(e, Seq(0L, 9L), 2) === Map(0L -> 0L, 1L -> 1L, 9L -> 0L))
  }

  test("cycle: BFS takes the short way around") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    assert(dists(cyc, Seq(0L), 4) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }
}

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("a", "b", "c")

  private def run(rows: Seq[(Long, String, Long)],
                  window: Option[Long] = None) =
    graft.operators.Funnel.earliestCompletion(
      rows.toDF("uid", "et", "ts"), "uid", "et", "ts", stages, window)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4)))
      .sortBy(_._1)

  test("greedy earliest: each stage after the previous chosen event") {
    val rows = Seq(
      // u1 completes: a@10, first b after 10 is 20, first c after 20 is 50
      (1L, "a", 10L), (1L, "b", 5L), (1L, "b", 20L),
      (1L, "c", 15L), (1L, "c", 50L),
      // u2 stalls at b: only c precedes its a
      (2L, "a", 10L), (2L, "c", 30L),
      // u3 never starts (no a) -> absent
      (3L, "b", 1L), (3L, "c", 2L))
    assert(run(rows) === Seq(
      (1L, Some(10L), Some(20L), Some(50L), 3L),
      (2L, Some(10L), None, None, 1L)))
  }

  test("conversion window bounds every later stage to t0 + w") {
    val rows = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 200L),
      (2L, "a", 10L), (2L, "b", 120L))
    // window 100: u1's c at 200 > 110 misses; u2's b at 120 misses
    assert(run(rows, window = Some(100L)) === Seq(
      (1L, Some(10L), Some(20L), None, 2L),
      (2L, Some(10L), None, None, 1L)))
    // unwindowed, both convert as far as their events allow
    assert(run(rows) === Seq(
      (1L, Some(10L), Some(20L), Some(200L), 3L),
      (2L, Some(10L), Some(120L), None, 2L)))
  }

  test("strict ordering: a stage event AT the previous time is not after") {
    val rows = Seq((1L, "a", 10L), (1L, "b", 10L), (1L, "c", 11L))
    assert(run(rows) === Seq((1L, Some(10L), None, None, 1L)))
  }

  test("greedy choice maximizes stages (earliest b keeps a later c alive)") {
    // with b chosen at 20 (earliest), c@25 converts; choosing b@30
    // would also work here, but greedy must not pick b@30 and miss c
    val rows = Seq((1L, "a", 10L), (1L, "b", 20L), (1L, "b", 30L),
      (1L, "c", 25L))
    assert(run(rows) === Seq((1L, Some(10L), Some(20L), Some(25L), 3L)))
  }
}

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Graphs.kCore(edges.toDF("src", "dst"), "src", "dst", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // zero BOTH fast-path bounds: the pure round-synchronous loop
  private def withDistributed[T](body: => T): T = {
    spark.conf.set("spark.graft.kCoreSmallGraphEdges", "0")
    spark.conf.set("spark.graft.kCoreComponentEdges", "0")
    try body finally {
      spark.conf.unset("spark.graft.kCoreSmallGraphEdges")
      spark.conf.unset("spark.graft.kCoreComponentEdges")
    }
  }

  // driver bound off, component kernel on: the flatMapGroups peel path
  private def withKernel[T](body: => T): T = {
    spark.conf.set("spark.graft.kCoreSmallGraphEdges", "0")
    try body finally spark.conf.unset("spark.graft.kCoreSmallGraphEdges")
  }

  test("triangle with a pendant: 2-core drops the pendant only") {
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 9L))
    assert(core(e, 2) === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // the whole graph survives k=1; nothing survives k=3
    assert(core(e, 1).keySet === Set(0L, 1L, 2L, 9L))
    assert(core(e, 3) === Map.empty)
  }

  test("cascade: removing a chain end unravels the whole chain") {
    // path 0-1-2-3: every node peels at k=2 even though 1,2 start at deg 2
    assert(core(Seq((0L, 1L), (1L, 2L), (2L, 3L)), 2) === Map.empty)
    // cycle survives k=2 exactly
    assert(core(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 2).values.toSet === Set(2L))
  }

  test("core degrees count only in-core neighbors") {
    // K4 plus pendant on node 0: 3-core = K4, node 0's core_deg is 3 (not 4)
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val got = core(k4 :+ ((0L, 9L)), 3)
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("driver fast path, component kernel, and round loop all agree") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      // two disjoint random blobs -> a real multi-component kernel case
      val edges = Seq.fill(80 + trial * 40)(
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong)) ++
        Seq.fill(60)(
          (100L + rnd.nextInt(15), 100L + rnd.nextInt(15)))
      for (k <- Seq(2, 3)) {
        val fast = core(edges, k)
        val loop = withDistributed { core(edges, k) }
        val kernel = withKernel { core(edges, k) }
        assert(fast === loop, s"trial $trial k=$k")
        assert(kernel === fast, s"kernel trial $trial k=$k")
      }
    }
  }

  test("over-bound components split off to the round loop; small ones " +
    "stay in the kernel — union equals the pure paths") {
    // big blob (K8 + chain tail, 35 edges) + two small triangles; the
    // component bound of 20 sends ONLY the blob to the round loop
    val k8 = for (a <- 0L to 7L; b <- 0L to 7L if a < b) yield (a, b)
    val chain = (7L to 13L).sliding(2).map(s => (s(0), s(1))).toSeq
    val tris = Seq((20L, 21L), (21L, 22L), (22L, 20L),
      (30L, 31L), (31L, 32L), (32L, 30L))
    val edges = k8 ++ chain ++ tris
    val pure = core(edges, 2)
    spark.conf.set("spark.graft.kCoreSmallGraphEdges", "0")
    spark.conf.set("spark.graft.kCoreComponentEdges", "20")
    val split =
      try core(edges, 2)
      finally {
        spark.conf.unset("spark.graft.kCoreSmallGraphEdges")
        spark.conf.unset("spark.graft.kCoreComponentEdges")
      }
    assert(split === pure)
    // sanity: the triangles (kernel side) and K8 (round-loop side) are
    // both present in the split result
    assert(split.keySet.intersect(Set(20L, 30L, 0L)).size === 3)
  }

  test("hybrid finish (distributed rounds then driver peel) matches both") {
    // K8 (28 edges) + one parent per K8 node + 2 leaves per parent
    // (52 edges total). At k=3 with bound=35 the cutover provably fires
    // after exactly two distributed rounds: round 1 deletes the 16
    // leaves (survivor degree-sum upper bound 88/2 = 44 > 35), round 2
    // deletes the 8 now-deg-1 parents (bound 64/2 = 32 <= 35) — the
    // remaining K8 is collected and queue-peeled in the driver.
    val k8 = for (a <- 0L to 7L; b <- 0L to 7L if a < b) yield (a, b)
    val parents = (0L to 7L).map(i => (i, 10L + i))
    val leaves = (0L to 7L).flatMap(i =>
      Seq((10L + i, 20L + 2 * i), (10L + i, 21L + 2 * i)))
    val edges = k8 ++ parents ++ leaves
    val pureDriver = core(edges, 3)
    val pureLoop = withDistributed { core(edges, 3) }
    // component kernel off too, so the loop (not the kernel) runs and
    // the mid-loop cutover is what's exercised
    spark.conf.set("spark.graft.kCoreSmallGraphEdges", "35")
    spark.conf.set("spark.graft.kCoreComponentEdges", "0")
    val hybrid =
      try core(edges, 3)
      finally {
        spark.conf.unset("spark.graft.kCoreSmallGraphEdges")
        spark.conf.unset("spark.graft.kCoreComponentEdges")
      }
    val want = (0L to 7L).map(_ -> 7L).toMap
    assert(hybrid === want)
    assert(pureDriver === want)
    assert(pureLoop === want)
  }
}

class WeightedHopSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                    h: Int): Map[Long, Long] =
    Graphs.weightedHopDistances(edges.toDF("src", "dst", "w"),
      "src", "dst", "w", seeds.toDF("id"), "id", h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cheaper long route beats the expensive direct edge within budget") {
    // 0-2 direct costs 10; 0-1-2 costs 2+3=5 with two hops
    val e = Seq((0L, 2L, 10L), (0L, 1L, 2L), (1L, 2L, 3L))
    assert(dists(e, Seq(0L), 1) === Map(0L -> 0L, 1L -> 2L, 2L -> 10L))
    assert(dists(e, Seq(0L), 2) === Map(0L -> 0L, 1L -> 2L, 2L -> 5L))
  }

  test("parallel edges collapse to the min; multi-seed takes the min") {
    val e = Seq((0L, 1L, 9L), (1L, 0L, 4L), (1L, 2L, 1L))
    assert(dists(e, Seq(0L), 2) === Map(0L -> 0L, 1L -> 4L, 2L -> 5L))
    assert(dists(e, Seq(0L, 2L), 1) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
  }

  test("hop budget truncates; unreachable nodes absent; zero weights ok") {
    val e = Seq((0L, 1L, 0L), (1L, 2L, 1L), (5L, 6L, 1L))
    assert(dists(e, Seq(0L), 1) === Map(0L -> 0L, 1L -> 0L))
    assert(dists(e, Seq(0L), 2) === Map(0L -> 0L, 1L -> 0L, 2L -> 1L))
  }
}

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private def cands(edges: Seq[(Long, Long)], minCommon: Long = 1)
  : Map[(Long, Long), (Long, Long, Long)] =
    Graphs.commonNeighborCandidates(
      edges.toDF("src", "dst"), "src", "dst", minCommon)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("path predicts the endpoints; square predicts both diagonals") {
    // path 0-1-2: only (0,2) shares a neighbor and is non-adjacent
    assert(cands(Seq((0L, 1L), (1L, 2L))) ===
      Map((0L, 2L) -> ((1L, 1L, 1L))))
    // 4-cycle: diagonals (0,2) and (1,3) each share BOTH off-diagonal
    // nodes; all adjacent pairs are excluded
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(cands(sq) === Map(
      (0L, 2L) -> ((2L, 2L, 2L)), (1L, 3L) -> ((2L, 2L, 2L))))
  }

  test("complete graphs predict nothing; minCommon prunes") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(cands(k4) === Map.empty)
    // star: every leaf pair shares exactly the hub (common = 1)
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L))
    assert(cands(star).keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(cands(star, minCommon = 2) === Map.empty)
  }

  test("duplicate, reversed, and self-loop edges do not change candidates") {
    val path = Seq((0L, 1L), (1L, 2L))
    val noisy = path ++ Seq((1L, 0L), (2L, 1L), (1L, 1L), (0L, 1L))
    assert(cands(noisy) === cands(path))
  }

  test("matches naive enumeration on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(50 + trial * 25)(
        (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter(e => e._1 != e._2)
      val und = edges.map(e => (e._1 min e._2, e._1 max e._2)).toSet
      val adj = und.toSeq.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val naive = (for {
        a <- adj.keys; b <- adj.keys
        if a < b && !und((a, b))
        common = (adj(a) & adj(b)).size.toLong
        if common >= 1
      } yield (a, b) -> ((common, adj(a).size.toLong, adj(b).size.toLong)))
        .toMap
      assert(cands(edges) === naive, s"trial $trial")
    }
  }
}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(docs: Seq[(Long, String)], rounds: Int) =
    graft.operators.Frequency
      .bpeMerges(docs.toDF("doc_id", "text"), "doc_id", "text", rounds)
      .as[(Long, String, String, String, Long)].collect().toSeq

  test("frequency-weighted merges with deterministic tie-break") {
    // vocab: abab freq 3, ab freq 1, cd freq 3
    // r0: (a,b) = 2*3 + 1 = 7 beats (b,a) = 3 and (c,d) = 3
    // r1: abab -> [ab, ab] so (ab,ab) = 3 TIES (c,d) = 3; 'ab' < 'c'
    // r2: only (c,d) remains
    val got = merges(
      Seq((1L, "abab abab cd"), (2L, "abab ab cd cd")), 3)
    assert(got === Seq(
      (0L, "a", "b", "ab", 7L),
      (1L, "ab", "ab", "abab", 3L),
      (2L, "c", "d", "cd", 3L)))
  }

  test("back-to-back occurrences both merge (the shared-delimiter trap)") {
    // 'aaaa': r0 counts (a,a) = 3; greedy-left application must yield
    // [aa, aa] — a rewrite whose pattern shares one delimiter between
    // adjacent occurrences would leave [aa, a, a] and r1 would find
    // (aa,a) instead of (aa,aa)
    val got = merges(Seq((1L, "aaaa")), 2)
    assert(got === Seq(
      (0L, "a", "a", "aa", 3L),
      (1L, "aa", "aa", "aaaa", 1L)))
  }

  test("triple 'aaa' merges leftmost pair only") {
    // greedy-left BPE: [aa, a], so r1 pairs (aa, a) — never (a, aa)
    val got = merges(Seq((1L, "aaa")), 2)
    assert(got === Seq(
      (0L, "a", "a", "aa", 2L),
      (1L, "aa", "a", "aaa", 1L)))
  }

  test("corpus with no pairs stops early and empty tokens are ignored") {
    assert(merges(Seq((1L, "a b  c")), 3) === Seq.empty)
  }
}

class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  test("learned merges compress documents; unit math is exact") {
    val docs = Seq((1L, "abab ab"), (2L, "cd")).toDF("doc_id", "text")
    val got = graft.operators.Frequency
      .bpeTrainApply(docs, "doc_id", "text", rounds = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // round 0 learns (a,b): doc 1 = [ab,ab] + [ab] -> 2 tokens + 1
    // internal boundary = 3 units (from 6 chars)
    assert(got(1L) === ((6L, 3L)))
    // doc 2 untouched by the merge: [c,d] stays 2 units
    assert(got(2L) === ((2L, 2L)))
  }

  test("applying zero merges is the identity inventory") {
    val docs = Seq((1L, "hello big world")).toDF("doc_id", "text")
    val got = graft.operators.Frequency
      .bpeApply(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Long, Long)].collect().head
    assert(got === ((1L, 13L, 13L)))
  }

  test("merges never cross token boundaries") {
    // corpus forces merge (a,b); 'xa by' has the pair split across a
    // space and must stay 4 units
    val docs = Seq((1L, "ab ab ab"), (2L, "xa by")).toDF("doc_id", "text")
    val got = graft.operators.Frequency
      .bpeTrainApply(docs, "doc_id", "text", rounds = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((6L, 3L)))
    assert(got(2L) === ((4L, 4L)))
  }
}
