package graft

import graft.operators.{IncrementalAgg, MergeOps, RobustStats}
import org.apache.spark.sql.functions._

/** Random-data parity for the table-maintenance operators against naive
  * in-memory twins — the property harness that catches the edge cases
  * the clean driver fixture cannot (ties, singleton groups, all-null
  * runs, batch boundaries).
  */
class MaintenancePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(71)

  test("scd2 matches a naive per-key fold on random timelines") {
    for (trial <- 1 to 3) {
      val rows = for {
        k <- 0L until 8L
        d <- 1L to (3 + rnd.nextInt(10)).toLong
      } yield (k, d, if (rnd.nextInt(5) == 0) null
        else ("abc" (rnd.nextInt(3))).toString)
      val got = MergeOps.scd2(rows.toDF("k", "d", "attr"),
        Seq("k"), "d", Seq("attr"))
        .collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
        .toSet
      // naive: walk each key's ordered snapshots, open on change
      val want = rows.groupBy(_._1).flatMap { case (k, snaps) =>
        val ordered = snaps.sortBy(_._2)
          .map(t => (t._2, Option(t._3)))
        val starts = ordered.zipWithIndex.collect {
          case ((d, a), 0) => (d, a)
          case ((d, a), i) if a != ordered(i - 1)._2 => (d, a)
        }
        starts.zipWithIndex.map { case ((d, a), i) =>
          val to = if (i + 1 < starts.length) Some(starts(i + 1)._1) else None
          (k, a, d, to, if (to.isEmpty) 1L else 0L)
        }
      }.toSet
      assert(got === want, s"trial $trial")
    }
  }

  test("winsorizedStats matches naive rank clipping on random groups") {
    for (trial <- 1 to 3) {
      val rows = for {
        g <- Seq("a", "b", "c")
        i <- 1 to 5 + rnd.nextInt(40)
      } yield (g, rnd.nextInt(100).toLong, (g.hashCode * 1000 + i).toLong)
      val got = RobustStats
        .winsorizedStats(rows.toDF("g", "v", "id"), Seq("g"), "v", "id",
          10, 90, 100)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.map(t => (t._2, t._3)).sortBy(identity)
        val n = sorted.length.toLong
        def rank(num: Long) = math.max(1L, (n * num + 99) / 100)
        val lo = sorted((rank(10) - 1).toInt)._1
        val hi = sorted((rank(90) - 1).toInt)._1
        g -> (lo, hi,
          rs.map(t => math.min(math.max(t._2, lo), hi)).sum,
          rs.count(_._2 < lo).toLong, rs.count(_._2 > hi).toLong)
      }
      assert(got === want, s"trial $trial")
    }
  }

  test("rollingLowerMedian matches a naive sliding window on random series") {
    for (trial <- 1 to 3) {
      val rows = for {
        k <- 0L until 5L
        d <- 1L to (1 + rnd.nextInt(15)).toLong
      } yield (k, d, rnd.nextInt(1000).toLong)
      val w = 2 + rnd.nextInt(5)
      val got = RobustStats
        .rollingLowerMedian(rows.toDF("k", "d", "v"), Seq("k"), "d", "v", w)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val ordered = rs.sortBy(_._2)
        ordered.indices.map { i =>
          val win = ordered.slice(math.max(0, i - w + 1), i + 1)
            .map(_._3).sorted
          (k, ordered(i)._2) -> win((win.length + 1) / 2 - 1)
        }
      }
      assert(got === want, s"trial $trial w=$w")
    }
  }

  test("foldBatches over random batch splits equals one-pass, any count") {
    for (trial <- 1 to 3) {
      val rows = Seq.tabulate(200)(i =>
        (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong,
          rnd.nextInt(4)))
      val df = rows.toDF("k", "v", "b")
      val nB = 2 + rnd.nextInt(3)
      val batches = (0 until nB).map(b => df.filter($"b" % nB === b))
      def state(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
      val whole = state(IncrementalAgg.aggregate(df, Seq("k"), "v"))
      val folded =
        state(IncrementalAgg.foldBatches(batches, Seq("k"), "v"))
      assert(folded === whole, s"trial $trial nB=$nB")
    }
  }

  test("mergeInto matches the naive four-arm map on random keyed states") {
    for (trial <- 1 to 3) {
      val t = Seq.tabulate(30)(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong))
        .distinctBy(_._1)
      val s = Seq.tabulate(30)(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong))
        .distinctBy(_._1)
      val thresh = 40L
      val got = MergeOps.mergeInto(t.toDF("k", "n"), s.toDF("k", "n"),
        Seq("k"),
        updateSet = Seq("n" -> (col("n") + col("src_n"))),
        insertSet = Seq("n" -> col("src_n")),
        deleteWhen = Some(col("n") < thresh))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val tm = t.toMap; val sm = s.toMap
      val want = (tm.keySet ++ sm.keySet).flatMap { k =>
        (tm.get(k), sm.get(k)) match {
          case (Some(a), Some(b)) =>
            if (a + b < thresh) None else Some(k -> (a + b))
          case (Some(a), None) => Some(k -> a)
          case (None, Some(b)) => Some(k -> b)
          case _ => None
        }
      }.toMap
      assert(got === want, s"trial $trial")
    }
  }
}
