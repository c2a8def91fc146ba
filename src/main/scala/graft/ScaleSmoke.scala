package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale smoke for the iterative / bucketed operators (dev main).
  *
  * The driver ships fixtures up to sf0.1; the 100 TB design claims for
  * connected components (q47/q69), minhash candidate generation (q29),
  * grid POI clustering (q84) and the incremental near-dup gate (q83) are
  * otherwise only design-argued. This main materializes a 10x fixture
  * (sf1-scale `documents` + `events`) by unioning shifted copies of the
  * sf0.1 tables, runs those five queries at both scales, and prints one
  * JSON line with per-query seconds and the sf1/sf0.1 ratio — near-linear
  * ratios (~10x on 10x rows for the linear operators) and unchanged plan
  * shapes are the acceptance.
  *
  * Copy construction preserves workload SHAPE instead of inflating it:
  *  - documents: doc_id shifted by 10M per copy and EVERY TOKEN suffixed
  *    with a per-copy tag, so the copies are fully disjoint in shingle /
  *    gram space — the same "disjoint copies" growth mode as lineitem.
  *    (The earlier per-copy PREFIX token prevented exact-dup collapse
  *    but left copies Jaccard-~1 NEIGHBORS of each other: for the exact
  *    set-similarity join the true-pair output then grows quadratically
  *    in copies — a ×75 "regression" that was fixture artifact, not
  *    algorithm. Per-token salting keeps element document frequencies
  *    scale-invariant, which is what a 10× corpus actually looks like.)
  *  - events: user_id shifted per copy (10x users, same per-user
  *    trajectory), event_id shifted by 1M per copy to stay unique; the
  *    jitter formulas depend on event_id % 5/7, so a multiple-of-70 shift
  *    keeps each copy's geometry identical to the original.
  */
object ScaleSmoke {

  private def buildSf1(spark: SparkSession, src: String, dst: String,
                       nCopies: Int): Unit = {
    val fs = new java.io.File(dst)
    // completion marker encodes the copy count: a bare _OK would silently
    // reuse a 10-copy fixture for a requested 100-copy sweep
    // v3: documents switched to per-token copy salting — the version
    // bump forces a rebuild over any prefix-salted fixture
    if (new java.io.File(s"$dst/_OK_v3_$nCopies").exists()) return
    fs.mkdirs()
    // rebuilding at a different copy count: drop every stale marker so a
    // later run requesting the OLD count can't silently reuse data built
    // at the new scale
    Option(fs.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_OK_"))
      .foreach(_.delete())
    val docs = Tables.documents(spark, src)
    val events = Tables.table(spark, src, "events")
    val copies = spark.range(0, nCopies).select(col("id").as("copy"))
    // per-token salt: suffix every token with "~c<copy>" (copy 0 keeps
    // the original text, so the sf0.1 slice of the fixture IS the real
    // corpus). Tokenization everywhere is single-space, so the suffix
    // rides inside the token and every word-n-gram / char-k-gram space
    // is disjoint across copies.
    docs.crossJoin(copies)
      .select(
        (col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1~c"), col("copy"))))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    // event_id shift is a multiple of 70 so event_id % 5 and % 7 (the
    // ping jitter inputs) are copy-invariant: every copy is the same
    // trajectory under a new user id.
    events.crossJoin(copies)
      .select(
        (col("event_id") + col("copy") * lit(1000300L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * lit(10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")
    // lineitem (the co-purchase graph source for q121/q122): order AND
    // part keys shift together per copy, so baskets stay intact and the
    // graph becomes nCopies disjoint copies — nodes, edges, and
    // triangles all scale linearly with rows, the honest growth mode
    // (inflating only orders would densify one fixed part space into an
    // unrealistically-complete graph instead).
    Tables.lineitem(spark, src).crossJoin(copies)
      .select(
        (col("l_orderkey") + col("copy") * lit(3000000L)).as("l_orderkey"),
        (col("l_partkey") + col("copy") * lit(1000000L)).as("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    new java.io.File(s"$dst/_OK_v3_$nCopies").createNewFile(): Unit
  }

  /** Additive fixture step: `embeddings` copies for the vector operators
    * (q145 k-means, q148 random projection). Own marker so fixtures
    * built before this table existed gain it WITHOUT a full rebuild;
    * [[buildSf1]]'s marker sweep still clears it on a copy-count change.
    * vec_id shifts per copy; vectors repeat — the honest growth mode for
    * assignment/projection cost (cluster structure is scale-invariant,
    * every pass still reads nCopies x the rows).
    */
  private def ensureEmbeddings(spark: SparkSession, src: String,
                               dst: String, nCopies: Int): Unit = {
    if (new java.io.File(s"$dst/_OK_emb_v1_$nCopies").exists()) return
    val copies = spark.range(0, nCopies).select(col("id").as("copy"))
    Tables.embeddings(spark, src).crossJoin(copies)
      .select(
        (col("vec_id") + col("copy") * lit(10000000L)).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    new java.io.File(s"$dst/_OK_emb_v1_$nCopies").createNewFile(): Unit
  }

  /** Additive fixture step: `part` + `customer` copies for q168 (fuzzy
    * vocab join) and q169 (k-anonymity ladder). part names are salted
    * per copy (copy 0 keeps the originals) so the noisy-name VOCABULARY
    * grows 10x — the honest growth mode for a deletion-neighborhood
    * join (same-name copies would collapse in the distinct). customer
    * keeps its QI columns verbatim: a 10x population with a fixed QI
    * space means 10x-deeper groups, which is what a real release table
    * does — the ladder's window cost scales with rows.
    */
  private def ensureDims(spark: SparkSession, src: String,
                         dst: String, nCopies: Int): Unit = {
    if (new java.io.File(s"$dst/_OK_dims_v1_$nCopies").exists()) return
    val copies = spark.range(0, nCopies).select(col("id").as("copy"))
    Tables.part(spark, src).crossJoin(copies)
      .select(
        // multiple of 110 keeps p_partkey % 10 / % 11 (the q168 noisy
        // derivation inputs) copy-invariant
        (col("p_partkey") + col("copy") * lit(1100000L)).as("p_partkey"),
        when(col("copy") === 0, col("p_name"))
          .otherwise(concat(col("p_name"), lit("~c"), col("copy")))
          .as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/part.parquet")
    Tables.customer(spark, src).crossJoin(copies)
      .select(
        (col("c_custkey") + col("copy") * lit(10000000L)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/customer.parquet")
    new java.io.File(s"$dst/_OK_dims_v1_$nCopies").createNewFile(): Unit
  }

  /** Additive fixture step: `orders` copies + verbatim small dims for
    * the q201 star join. Order keys shift by lineitem's 3M stride so
    * baskets stay joined; o_custkey shifts by customer's 10M stride so
    * each copy's orders belong to that copy's customers; supplier /
    * nation / region copy VERBATIM — real dims do not grow with the
    * fact table, which is exactly what keeps them broadcast-able at
    * every scale.
    */
  private def ensureFacts2(spark: SparkSession, src: String,
                           dst: String, nCopies: Int): Unit = {
    if (new java.io.File(s"$dst/_OK_facts2_v1_$nCopies").exists()) return
    val copies = spark.range(0, nCopies).select(col("id").as("copy"))
    Tables.orders(spark, src).crossJoin(copies)
      .select(
        (col("o_orderkey") + col("copy") * lit(3000000L)).as("o_orderkey"),
        (col("o_custkey") + col("copy") * lit(10000000L)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")
    for (t <- Seq("supplier", "nation", "region"))
      Tables.table(spark, src, t).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    new java.io.File(s"$dst/_OK_facts2_v1_$nCopies").createNewFile(): Unit
  }

  /** Scale-sweep target list: the FULL oracle board, derived from
    * SparkEntry.queries — r12's hand-maintained 126-name list left half
    * the board with no ×10/×100 row and no recorded selection rule (r12
    * verdict ask #2); deriving it removes the selection entirely and
    * covers future queries by construction. SPARK_GRAFT_SCALE_ONLY
    * still prefix-filters for targeted re-measures.
    */
  private def defaultTargets: Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted

  /** Materialize the complete N-copy fixture into `dst` (all four
    * builder steps, each marker-guarded) — shared with [[Macro]].
    */
  def ensureFixture(spark: SparkSession, src: String, dst: String,
                    nCopies: Int): Unit = {
    buildSf1(spark, src, dst, nCopies)
    ensureEmbeddings(spark, src, dst, nCopies)
    ensureDims(spark, src, dst, nCopies)
    ensureFacts2(spark, src, dst, nCopies)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE coalescing floor (see Bench.scala): keeps CPU-dense tiny
      // shuffles parallel at gate scale; inert at production sizes
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "128k")
      // cached-plan AQE re-partitioning (see Bench.scala)
      .config(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // the x100 streaming gates' memory-sink collects brush past the
      // 1g default (q158 died at 1074.2 MiB mid-sweep, r13); only
      // applies when THIS main creates the session — a fast-path
      // spark-shell launcher must pass the same conf on its own
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    // knobs for bigger sweeps: copy count (10 = sf1, 100 = sf10), pass
    // count, and a target-prefix filter (mirrors Bench's BENCH_ONLY)
    val nCopies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "3").toInt
    val targets = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(f => defaultTargets.filter(t => f.split(",").exists(t.startsWith)))
      .getOrElse(defaultTargets)
    ensureFixture(spark, src, dst, nCopies)

    // plan-shape fingerprint: DISTINCT shuffle exchanges in the final
    // adaptive EXECUTED plan tree (GraftPlanAudit.shuffleCount walks
    // AdaptiveSparkPlanExec.finalPhysicalPlan post-action, descends query
    // stages and cached relations once each, identity-dedups reuse) —
    // captured from the SAME df the timed pass runs, because
    // re-constructing the query just to fingerprint it would re-execute
    // the iterative queries (their loops run during construction).
    // "no new plan shapes at 10x" = identical counts at both scales (a
    // broadcast flipping to sort-merge, or an extra exchange appearing,
    // shows up here). The r12 string-grep form counted "Exchange" LINES
    // in the plan rendering, which inflated 52→87 on q17/q18 purely from
    // cached subplans re-printing nested plans at every reference site —
    // the tree walk is immune (NOTES_r12 caveat; r12 verdict ask #1).
    // Limitation: for the iterative CC queries this fingerprints the
    // final label-stitching plan, not the per-round loop plans —
    // round-internal strategy flips surface in the timing ratio, not
    // this count.
    val planEx =
      scala.collection.mutable.Map.empty[(String, String), Int]
    // streaming smoke mode: noop sink (no driver-side memory-sink
    // materialization of x100-sized emissions) + per-run state-store
    // peaks from StreamSessions.lastRunMetrics — the bounded-state
    // evidence rows for SCALE_sf10 (r9 verdict ask #1)
    if (sys.env.get("SPARK_GRAFT_STREAM_NOOP").contains("1")) {
      spark.conf.set("spark.graft.streamSinkNoop", "true")
      // pin the replay structure so both scales evict at the same 16
      // watermark advances — state-peak fractions stay comparable
      spark.conf.set("spark.graft.streamChunks", "16")
    }
    val streamStats = scala.collection.mutable
      .Map.empty[(String, String), graft.streaming.StreamSessions.StreamRunMetrics]
    // quiet-pass gate (same policy as Bench): a pass counts toward the
    // recorded min only when its CPU-steal stayed at or under the bound;
    // (name, dir) pairs with no quiet pass get bounded re-runs, then
    // fall back to min-of-all and land in "noisy". Without this, one
    // steal burst on the sf0.1 side fabricates a sub-1 "ratio" (or an
    // inflated one on the big side) that reads as a plan change.
    val quietSteal =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_QUIET_STEAL", "1.0").toDouble
    def time(name: String, dir: String): (Double, Double) = {
      CacheScope.releaseAll()
      graft.streaming.StreamSessions.lastRunMetrics.clear()
      val ticks0 = HostLoad.cpuTicks()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      Bench.force(df)
      val dt = (System.nanoTime() - t0) / 1e9
      val (steal, _) = HostLoad.loadBetween(ticks0, HostLoad.cpuTicks())
      planEx((name, dir)) =
        org.apache.spark.sql.execution.GraftPlanAudit.shuffleCount(df)
      graft.streaming.StreamSessions.lastRunMetrics.headOption
        .foreach { case (_, m) => streamStats((name, dir)) = m }
      (dt, steal)
    }
    // pass 1 warms, pass 2+ measure (min over QUIET passes), interleaved
    // across queries so a steal burst hits different queries each pass
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    val allMin = scala.collection.mutable.Map.empty[(String, String), Double]
    def runOne(pass: String, name: String, dir: String): Unit = {
      val (dt, steal) = time(name, dir)
      val quiet = steal < 0 || steal <= quietSteal
      System.err.println(
        f"[scale] pass $pass $name ${dir.split('/').last} $dt%.2f s " +
          f"(steal $steal%.1f%%${if (quiet) "" else " NOISY"})")
      val k = (name, dir)
      if (dt < allMin.getOrElse(k, Double.MaxValue)) allMin(k) = dt
      if (quiet && dt < best.getOrElse(k, Double.MaxValue)) best(k) = dt
    }
    for (pass <- 1 to nPasses; name <- targets; dir <- Seq(src, dst))
      runOne(pass.toString, name, dir)
    val retries = sys.env.getOrElse("SPARK_GRAFT_SCALE_RETRIES", "2").toInt
    for (r <- 1 to retries) {
      val noisy = (for (name <- targets; dir <- Seq(src, dst))
        yield (name, dir)).filter(k => !best.contains(k))
      if (noisy.nonEmpty) {
        System.err.println(
          s"[scale] retry round $r: ${noisy.size} runs with no quiet pass")
        noisy.foreach { case (n, dir) => runOne(s"retry$r", n, dir) }
      }
    }
    val neverQuiet = (for (name <- targets; dir <- Seq(src, dst))
      yield (name, dir)).filterNot(best.contains)
    neverQuiet.foreach(k => best(k) = allMin(k))
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // super-linearity alarm: rows grow x nCopies, so any time ratio past
    // that is growing FASTER than the data — the q216 failure mode (x764
    // at x100 sat silently in the record until a human read it). The
    // 1.2 slack absorbs constant-overhead shifts between scales; every
    // flagged query must be explained or fixed, never shipped silent.
    def isSuper(n: String): Boolean =
      best((n, dst)) / best((n, src)) > nCopies * 1.2
    // state-peak twin of the wall alarm (the q166 failure mode: state
    // grew x139 under x100 input while the wall-only flag stayed green):
    // a streaming gate whose state peak outgrows the input multiplier is
    // storing MORE than proportionally to the data — never ship silent.
    def isSuperState(n: String): Boolean =
      (streamStats.get((n, src)), streamStats.get((n, dst))) match {
        case (Some(ma), Some(mb)) if ma.statePeakRows > 0 =>
          mb.statePeakRows.toDouble / ma.statePeakRows > nCopies * 1.2
        case _ => false
      }
    val parts = targets.map { n =>
      val a = best((n, src)); val b = best((n, dst))
      val (ea, eb) = (planEx((n, src)), planEx((n, dst)))
      // streaming rows carry the bounded-state evidence: peak state rows
      // and input rows at BOTH scales — acceptance is peak ~ watermark
      // window (scale-invariant or sub-linear), not ~ input
      val stream = (streamStats.get((n, src)), streamStats.get((n, dst))) match {
        case (Some(ma), Some(mb)) =>
          s""","state_peak_src":${ma.statePeakRows},"input_rows_src":${ma.inputRows}""" +
            s""","state_peak_dst":${mb.statePeakRows},"input_rows_dst":${mb.inputRows}""" +
            s""","batches_src":${ma.batches},"batches_dst":${mb.batches}""" +
            s""","superlinear_state":${isSuperState(n)}"""
        case _ => ""
      }
      s""""$n":{"sf0.1":${f3(a)},"sf1":${f3(b)},"ratio":${f3(b / a)}""" +
        s""","exchanges_sf0.1":$ea,"exchanges_sf1":$eb""" +
        s""","superlinear":${isSuper(n)}$stream}"""
    }
    val noisyArr = neverQuiet.sorted
      .map { case (n, dir) => s""""$n@${dir.split('/').last}"""" }
      .mkString("[", ",", "]")
    val superArr = (targets.filter(isSuper) ++
      targets.filter(isSuperState).map(n => s"$n#state")).distinct
      .map(n => s""""$n"""").mkString("[", ",", "]")
    val json = parts.mkString(
      s"""{"metric":"scale_smoke","copies":$nCopies,"noisy":$noisyArr,"superlinear":$superArr,"quiet_steal_pct":$quietSteal,"queries":{""",
      ",", "}}")
    println(json)
    val out = new java.io.PrintWriter(
      new java.io.File(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
        "SCALE_sf1.json")), "UTF-8")
    try out.println(json) finally out.close()
    spark.stop()
  }
}
