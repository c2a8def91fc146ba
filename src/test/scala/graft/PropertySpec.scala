package graft

import graft.operators.{Salting, StopDetect}
import graft.sources.Layout
import graft.streaming.StreamingStopDetect
import graft.streaming.StreamingStopDetect.Ping
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Property-style randomized invariants (seeded — every run tests the
  * same cases). Fixed-example specs pin known edges; these sweep the
  * space between them.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("interleave is a bijection: deinterleave recovers (x, y)") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), Layout.interleave(col("x"), col("y"), 16).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (dx, dy) = (0L, 0L)
      (0 until 16).foreach { k =>
        dx |= ((z >> (2 * k)) & 1L) << k
        dy |= ((z >> (2 * k + 1)) & 1L) << k
      }
      assert((dx, dy) === ((x, y)), s"z=$z")
    }
    // z-ordering is unique per cell
    assert(got.map(_.getLong(2)).distinct.length === pairs.distinct.length)
  }

  test("saltedStats equals unsalted aggregation on random skewed frames") {
    val rnd = new scala.util.Random(7)
    for (caseNo <- 1 to 5) {
      val n = 200 + rnd.nextInt(800)
      val rows = Seq.tabulate(n) { i =>
        // skew: most rows land on one hot key
        val g = if (rnd.nextDouble() < 0.7) "hot" else "g" + rnd.nextInt(5)
        (g, i.toLong, rnd.nextDouble() * 1000 - 500)
      }
      val df = rows.toDF("g", "id", "v")
      val salt = 1 + rnd.nextInt(16)
      val got = Salting.saltedStats(df, Seq("g"), $"v", $"id", salt)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val want = df.groupBy("g")
        .agg(count(lit(1)).as("n"), sum("v").as("total"))
        .withColumn("avg", round($"total" / $"n", 6))
        .withColumn("total", round($"total", 2))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got === want, s"case $caseNo salt $salt")
    }
  }

  test("simhash relational plan matches the definitional column form " +
    "on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz")
    val docs = Seq.tabulate(40) { i =>
      val len = rnd.nextInt(8) // includes 0..2 (no trigram) edge cases
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val relational = graft.operators.Dedup.simhashDocs(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val definitional = docs.select(col("doc_id"),
        graft.operators.Dedup.simhashReference(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relational === definitional)
  }

  test("decontamination overlap equals a naive in-memory twin on " +
    "random corpora") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff", "g")
    def doc(): String = {
      val len = rnd.nextInt(12) // includes < n edge cases
      Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (caseNo <- 1 to 3) {
      val n = 2 + rnd.nextInt(3)
      val corpus = Seq.tabulate(30)(i => (i.toLong, doc()))
      val bench = Seq.fill(5)(doc())
      val got = graft.operators.Decontaminate
        .overlap(corpus.toDF("doc_id", "text"), "doc_id", "text",
          bench.toDF("text"), "text", n = n)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      def grams(t: String): Set[String] = {
        val toks = t.split(" ", -1).toSeq
        if (toks.length < n) Set.empty
        else toks.sliding(n).map(_.mkString(" ")).toSet
      }
      val benchGrams = bench.flatMap(grams).toSet
      corpus.foreach { case (id, t) =>
        val g = grams(t)
        assert(got(id) === ((g.size.toLong, (g & benchGrams).size.toLong)),
          s"case $caseNo doc $id text '$t'")
      }
    }
  }

  test("streaming stop detection matches batch on random walks and " +
    "random batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val p = StopDetect.Params(50.0, 2L, 600L, 3600L, "haversine")
    val rnd = new scala.util.Random(23)
    for (scenario <- 1 to 4) {
      // random walk per user: dwell with prob 0.7 (tiny step), else jump
      val pings = (0 until 2).flatMap { u =>
        var lat = 19.0 + u * 0.5
        var t = 1000L
        Seq.tabulate(30) { _ =>
          if (rnd.nextDouble() < 0.7) lat += 0.00001 else lat += 0.01
          t += 200L + rnd.nextInt(600)
          Ping(s"u$u", lat, -99.0, t)
        }
      }
      val cut1 = 10 + rnd.nextInt(20)
      val cut2 = cut1 + rnd.nextInt(60 - cut1)
      val batches = Seq(pings.take(cut1), pings.slice(cut1, cut2),
        pings.drop(cut2)).filter(_.nonEmpty)

      val mem = MemoryStream[Ping]
      val name = s"pstops$scenario"
      val q = StreamingStopDetect.stopEvents(mem.toDS(), p)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        val streamed = spark.table(name)
          .collect().map(r => (r.getAs[String]("uid"),
            r.getAs[Long]("timestamp"), r.getAs[Long]("stop_events")))
          .toSet
        val batchRows = StopDetect.stopEvents(
          pings.toDF("uid", "latitude", "longitude", "timestamp"), p)
          .collect().map(r => (r.getAs[String]("uid"),
            r.getAs[Long]("timestamp"), r.getAs[Long]("stop_events")))
        // streaming withholds each user's still-pending tail; everything
        // it DID emit must match batch, and the gap is exactly the
        // per-user pending suffix (last ping + any open run)
        val batchSet = batchRows.toSet
        assert(streamed.subsetOf(batchSet),
          s"scenario $scenario: streamed rows not in batch: " +
            (streamed -- batchSet))
        val missing = batchSet -- streamed
        val lastTs = pings.groupBy(_.uid).view
          .mapValues(_.map(_.timestamp).max).toMap
        // every missing row belongs to a suffix run that is still open
        // (its run id equals the run id at the user's final ping, or it
        // IS the final unclassified ping)
        missing.foreach { case (uid, ts, _) =>
          val after = batchRows.filter(r => r._1 == uid && r._2 > ts)
          assert(after.forall(r => missing.contains(r)),
            s"scenario $scenario: classified row after pending one: $uid/$ts")
        }
        assert(missing.forall { case (uid, ts, _) => ts <= lastTs(uid) })
      } finally q.stop()
    }
  }
}
