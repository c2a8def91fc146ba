package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Cross-document segment dedup (q155's operator). */
class CrossDocDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) => Row(id, t) }, 2),
      schema)

  private def outMap(df: org.apache.spark.sql.DataFrame)
  : Map[Long, (String, Long, Long)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("bans by DISTINCT-doc frequency; within-doc repeats are kept") {
    // "a b" occurs in docs 1, 2, 3 (df 3 > 2: banned) and TWICE in doc 1.
    // "x y" occurs twice in doc 4 only (df 1: kept, both copies).
    val d = docs(Seq(
      1L -> "a b a b p q",
      2L -> "a b r s",
      3L -> "a b t u",
      4L -> "x y x y"))
    val m = outMap(Dedup.crossDocChunkDedup(d, "doc_id", "text", 2, 2))
    assert(m(1L) === (("p q", 3L, 1L)))
    assert(m(2L) === (("r s", 2L, 1L)))
    assert(m(3L) === (("t u", 2L, 1L)))
    assert(m(4L) === (("x y x y", 2L, 2L)))
  }

  test("a doc losing every chunk survives with empty text and n_kept 0") {
    val d = docs(Seq(
      1L -> "a b", 2L -> "a b", 3L -> "a b", 4L -> "a b c d"))
    val m = outMap(Dedup.crossDocChunkDedup(d, "doc_id", "text", 2, 2))
    assert(m(1L) === (("", 1L, 0L)))
    assert(m(4L) === (("c d", 2L, 1L)))
  }

  test("identity when nothing is banned: reassembly reconstructs the text") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    // Distinct token streams (salted by doc id) so no chunk repeats
    // across docs; lengths hit every mod-n remainder incl. a short doc.
    val rows = (1L to 12L).map { id =>
      val len = 1 + rnd.nextInt(13)
      id -> Seq.tabulate(len)(i =>
        vocab(rnd.nextInt(vocab.size)) + id).mkString(" ")
    }
    val m = outMap(Dedup.crossDocChunkDedup(docs(rows), "doc_id", "text", 3, 1))
    rows.foreach { case (id, t) =>
      val nTok = t.split(" ").length
      val expChunks = math.max((nTok + 2) / 3, 1)
      assert(m(id) === ((t, expChunks.toLong, expChunks.toLong)),
        s"doc $id")
    }
  }

  test("maxDocFreq boundary: df == maxDocFreq is kept, df == maxDocFreq + 1 banned") {
    val d = docs(Seq(
      1L -> "k k", 2L -> "k k",            // df 2
      3L -> "z z", 4L -> "z z", 5L -> "z z")) // df 3
    val m = outMap(Dedup.crossDocChunkDedup(d, "doc_id", "text", 2, 2))
    assert(m(1L)._1 === "k k" && m(3L)._1 === "")
  }
}
