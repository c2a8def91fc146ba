package graft

import graft.operators.{Expectations, Journey}
import org.apache.spark.sql.functions._

/** Markov transition matrix (q152's operator). */
class JourneySpec extends SparkSpec {
  import spark.implicits._

  test("hand sequences: exact counts, end state, row-normalized p") {
    // u1: a -> b -> a -> end ; u2: a -> a -> end
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 5L, 4L), (2L, "a", 6L, 5L))
      .toDF("user_id", "state", "ts", "event_id")
    val got = Journey.transitions(ev, "user_id", "state", "ts", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // from a: a->b (1), a->a (1), a->end (2) => row_total 4
    assert(got(("a", "b")) == ((1L, 0.25)))
    assert(got(("a", "a")) == ((1L, 0.25)))
    assert(got(("a", "end")) == ((2L, 0.5)))
    // from b: b->a only
    assert(got(("b", "a")) == ((1L, 1.0)))
    assert(got.keys.map(_._1).toSet == Set("a", "b"))
  }

  test("timestamp ties resolve by the tie-break column — total order") {
    val ev = Seq(
      (1L, "x", 10L, 2L), (1L, "y", 10L, 1L)) // same ts: y first by id
      .toDF("user_id", "state", "ts", "event_id")
    val got = Journey.transitions(ev, "user_id", "state", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("y", "x"), ("x", "end")))
  }

  test("row probabilities sum to 1 (within rounding) per from-state") {
    val rnd = new scala.util.Random(3)
    val ev = (0 until 300).map(i =>
      ((i % 7).toLong, s"s${rnd.nextInt(4)}", rnd.nextInt(1000).toLong,
        i.toLong))
      .toDF("user_id", "state", "ts", "event_id")
    val sums = Journey.transitions(ev, "user_id", "state", "ts", "event_id")
      .groupBy("from_state").agg(sum("p").as("sp"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-4))
  }
}

/** Snapshot drift report (q153's operator). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("one-sided groups zero-fill; drift flag is an integer boundary") {
    val a = Seq(("g1", 1L, 10L), ("g1", 2L, 10L), ("g1", 3L, 10L),
      ("g1", 4L, 10L), ("g1", 5L, 10L), ("g2", 1L, 5L))
      .toDF("g", "uid", "v")
    val b = Seq(("g1", 1L, 20L), ("g1", 1L, 20L), ("g1", 2L, 20L),
      ("g1", 3L, 20L), ("g3", 9L, 7L))
      .toDF("g", "uid", "v")
    val got = Expectations.driftReport(a, b, "g", "uid", col("v"), 1L, 5L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // g1: n 5 vs 4 -> |1|*5 > 5*1 is FALSE (exactly 20% is not drift)
    assert(got("g1") == ((5L, 4L, 5L, 3L, 50L, 80L, 0L)))
    // g2 only in a: zero-filled b side, |1-0|*5 > 1 -> drifted
    assert(got("g2") == ((1L, 0L, 1L, 0L, 5L, 0L, 1L)))
    // g3 only in b: n_a = 0 -> any b presence drifts
    assert(got("g3") == ((0L, 1L, 0L, 1L, 0L, 7L, 1L)))
  }
}
