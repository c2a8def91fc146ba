package graft

import graft.operators.Dedup

class ExactSubstringSpec extends SparkSpec {
  import spark.implicits._

  private val words = (0 until 20).map(i => s"w$i")

  test("exact copy loses every covered token; the first stays whole") {
    val a = words.mkString(" ")
    val df = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDedup(df, "doc_id", "text", l = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((a, 20L, 0L)), "first occurrence untouched")
    assert(out(2L) === (("", 20L, 20L)), "copy fully removed")
  }

  test("near-copy keeps exactly the edited token") {
    val orig = words.mkString(" ")
    val edited = words.updated(10, "XX").mkString(" ")
    val df = Seq((1L, orig), (2L, edited)).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDedup(df, "doc_id", "text", l = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3))).toMap
    assert(out(1L)._2 === 0L)
    // every window over the edit is unique, every other token is
    // covered by some duplicated window
    assert(out(2L) === (("XX", 19L)))
  }

  test("short docs and unique corpora are untouched") {
    val df = Seq(
      (1L, "just three tokens"),
      (2L, "a completely different sentence with its own words"),
      (3L, "and another one sharing nothing eight tokens long here"))
      .toDF("doc_id", "text")
    val out = Dedup.exactSubstringDedup(df, "doc_id", "text", l = 8)
      .collect()
    assert(out.forall(_.getLong(3) === 0L), "nothing removed")
    val texts = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(r.getString(1) === texts(r.getLong(0))))
  }

  test("intra-document repetition collapses to the first span") {
    // one doc repeating the same 6 tokens three times, L=6: occurrences
    // 2 and 3 are covered; the first span survives
    val span = (0 until 6).map(i => s"s$i")
    val text = (span ++ span ++ span).mkString(" ")
    val out = Dedup.exactSubstringDedup(
      Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text", l = 6)
      .collect().head
    assert(out.getString(1) === span.mkString(" "))
    assert(out.getLong(3) === 12L)
  }
}
