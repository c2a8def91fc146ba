package graft

import graft.operators.{Frequency, MergeOps}
import org.apache.spark.sql.functions._

/** CDC change-feed application (q146's operator). */
class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    ("a", 10L), ("b", 20L), ("c", 30L)).toDF("k", "v")

  private def apply(feed: org.apache.spark.sql.DataFrame) =
    MergeOps.applyChanges(base, feed, Seq("k"), "seq", "op")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("only the latest change per key applies") {
    val feed = Seq(
      ("a", 1L, "U", 11L), ("a", 2L, "U", 12L), ("a", 3L, "U", 13L),
      ("b", 1L, "U", 99L), ("b", 2L, "D", 0L)).toDF("k", "seq", "op", "v")
    val got = apply(feed)
    // a: last update wins; b: insert-then-delete nets to absent; c: keep
    assert(got == Map("a" -> 13L, "c" -> 30L))
  }

  test("feed-only keys insert; delete of an unknown key is a no-op") {
    val feed = Seq(
      ("x", 1L, "I", 77L),          // never in base -> appears
      ("y", 1L, "U", 5L), ("y", 2L, "D", 0L), // never in base, net delete
      ("z", 4L, "D", 0L)            // delete of unknown key -> no row, no error
    ).toDF("k", "seq", "op", "v")
    val got = apply(feed)
    assert(got == Map("a" -> 10L, "b" -> 20L, "c" -> 30L, "x" -> 77L))
  }

  test("empty feed is the identity") {
    val feed = Seq.empty[(String, Long, String, Long)]
      .toDF("k", "seq", "op", "v")
    assert(apply(feed) == Map("a" -> 10L, "b" -> 20L, "c" -> 30L))
  }

  test("a (key, seq) tie resolves by the struct total order, not arrival") {
    // same seq, two images: max(struct) picks the lexicographically
    // larger (seq, op, v) — 'U' > 'D', so the update survives; the
    // result must be identical on every run and partitioning
    val feed = Seq(
      ("a", 5L, "D", 0L), ("a", 5L, "U", 42L)).toDF("k", "seq", "op", "v")
    val runs = (1 to 3).map(_ => apply(feed.repartition(3)))
    assert(runs.forall(_ == Map("a" -> 42L, "b" -> 20L, "c" -> 30L)))
  }

  test("rejects a feed missing a base value column") {
    val feed = Seq(("a", 1L, "U")).toDF("k", "seq", "op")
    intercept[IllegalArgumentException] {
      MergeOps.applyChanges(base, feed, Seq("k"), "seq", "op")
    }
  }
}

/** Unigram-LM quality scores (q147's operator). */
class UnigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  test("hand corpus: exact micro-nat integer sums") {
    // vocab: a=2, b=2, c=1, T=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Frequency.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val ln2 = math.round(math.log(2.0) * 1e6) // 693147
    val ln5 = math.round(math.log(5.0) * 1e6) // 1609438
    assert(got(1L) == ((3L, 3 * ln2 - 3 * ln5)))
    assert(got(2L) == ((2L, ln2 + 0L - 2 * ln5)))
  }

  test("scores are <= 0 and token counts sum to the corpus total") {
    val docs = Seq((1L, "x y z"), (2L, "x x"), (3L, "q")).toDF("doc_id", "text")
    val rows = Frequency.unigramLogProb(docs, "doc_id", "text").collect()
    assert(rows.map(_.getLong(1)).sum == 6L)
    assert(rows.forall(_.getLong(2) <= 0L))
    assert(rows.forall(_.getDouble(3) <= 0.0))
  }

  test("a doc of rare tokens scores below a doc of common tokens") {
    val common = Seq.fill(20)("the").mkString(" ")
    val docs = (Seq((1L, common), (2L, "zyx wvu tsr"))
      ++ (3L to 10L).map(i => i -> common)).toDF("doc_id", "text")
    val got = Frequency.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(2L) < got(1L))
  }
}
