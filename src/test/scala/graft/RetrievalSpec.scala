package graft

import graft.operators.{Dedup, Retrieval}
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("RRF: exact micro scores, cross-list accumulation, tie-break") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // micro contributions: rank1 = 1000000/61 = 16393, rank2 = 16129,
    // rank3 = 15873 (integer division)
    assert(got(20L) === ((2L, 16129L + 16393L, 1L))) // both lists, top
    assert(got(10L) === ((1L, 16393L, 2L)))
    assert(got(40L) === ((1L, 16129L, 3L)))
    assert(got(30L) === ((1L, 15873L, 4L)))
  }

  test("RRF: a strong single-list doc can outrank a weak double-list doc") {
    // doc 1: rank 1 in one list (16393); doc 2: rank 50 in both
    // (2 x 9090 = 18180) — presence in both lists wins here, but rank 1
    // vs two rank-200s (2 x 3846 = 7692) flips. Both directions pinned.
    val a1 = Seq((1L, 1L), (2L, 50L)).toDF("doc_id", "rank")
    val b1 = Seq((2L, 50L)).toDF("doc_id", "rank")
    val g1 = Retrieval.rrfFuse(Seq(a1, b1), "doc_id", "rank")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(g1(2L) === 1L && g1(1L) === 2L)
    val a2 = Seq((1L, 1L), (2L, 200L)).toDF("doc_id", "rank")
    val b2 = Seq((2L, 200L)).toDF("doc_id", "rank")
    val g2 = Retrieval.rrfFuse(Seq(a2, b2), "doc_id", "rank")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(g2(1L) === 1L && g2(2L) === 2L)
  }
}

class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  /** JDK reference: boundary positions of the identical rolling rule. */
  private def refChunks(t: String, window: Int = 4,
                        modulus: Int = 32): Seq[(Int, Int)] = {
    val bounds = (window to t.length).filter { pos =>
      val h = (0 until window).map { j =>
        t.charAt(pos - 1 - j).toLong * math.pow(31, j).toLong
      }.sum
      h % modulus == 0
    } :+ t.length
    val bs = bounds.distinct.sorted
    bs.zip(0 +: bs.dropRight(1)).map { case (end, prev) =>
      (prev + 1, end)
    }
  }

  private def chunksOf(docs: Seq[(Long, String)]) =
    Dedup.contentDefinedChunks(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"chunk_idx", $"chunk_len", $"fp", $"shared")
      .as[(Long, Long, Long, String, Boolean)].collect().toSeq

  test("boundaries match the JDK reference and lengths tile the doc") {
    val text = "the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep green forest tonight"
    val got = chunksOf(Seq((1L, text))).sortBy(_._2)
    val want = refChunks(text)
    assert(got.map(_._3) === want.map { case (s, e) => (e - s + 1).toLong })
    assert(got.map(_._3).sum === text.length.toLong)
    // fps are the md5 of the exact substrings
    got.zip(want).foreach { case ((_, _, _, fp, _), (s, e)) =>
      val sub = text.substring(s - 1, e)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sub.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(fp === md)
    }
  }

  test("shift stability: a prefix insertion re-aligns to the same chunks") {
    // THE content-defined property: fixed-width grids shift every
    // chunk after an insertion; rolling-hash boundaries re-synchronize,
    // so all but the first chunk(s) of the shifted doc keep their
    // fingerprints.
    val a = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight again"
    val b = "XYZ! " + a
    val got = chunksOf(Seq((1L, a), (2L, b)))
    val fpA = got.filter(_._1 == 1L).map(_._4).toSet
    val fpB = got.filter(_._1 == 2L).map(_._4).toSet
    val reused = fpA.intersect(fpB).size
    assert(fpA.size >= 3, s"fixture must chunk: ${fpA.size}")
    assert(reused >= fpA.size - 2,
      s"only $reused/${fpA.size} chunks re-aligned after the shift")
    // and those re-aligned chunks are flagged shared
    val sharedFps = got.filter(_._5).map(_._4).toSet
    assert(fpA.intersect(fpB).subsetOf(sharedFps))
    // unique chunks are not
    got.filter(r => !fpA.intersect(fpB).contains(r._4))
      .foreach(r => assert(!r._5, s"chunk ${r._4} wrongly shared"))
  }

  test("short and empty docs: below-window text is one whole chunk; empty drops") {
    val got = chunksOf(Seq((1L, "ab"), (2L, "")))
    assert(got.map(_._1).distinct === Seq(1L))
    assert(got === Seq((1L, 1L, 2L,
      got.head._4, false)))
  }

  test("CdcBoundaries: fused pass equals the relational rolling rule, incl. multi-byte") {
    // positions count CODE POINTS (substring's unit) and each character
    // contributes its code point (ascii's value) — pin the fused
    // expression against the exact relational composition it replaced,
    // on strings with 2- and 4-byte UTF-8 code points
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "caf\u00e9 na\u00efve r\u00e9sum\u00e9 \u00e0 la carte encore une fois",
      "ab",
      "\ud83d\ude00 astral \ud83d\ude00 chars \ud83d\ude00 mix with ascii text here",
      "aaaa aaaa aaaa aaaa aaaa aaaa aaaa")
    def refBounds(t: String, window: Int, modulus: Int): Seq[Long] = {
      val cps = t.codePoints().toArray
      val n = cps.length
      val bs = (window to n).filter { pos =>
        val h = (0 until window).map { j =>
          cps(pos - 1 - j).toLong * math.pow(31, j).toLong
        }.sum
        h % modulus == 0
      }.map(_.toLong)
      if (bs.nonEmpty && bs.last == n.toLong) bs else bs :+ n.toLong
    }
    for ((w, m) <- Seq((4, 32), (2, 8), (5, 16))) {
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select($"id", graft.plans.CdcBoundaries($"t", w, m).as("bs"))
        .as[(Long, Seq[Long])].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === refBounds(t, w, m),
          s"window=$w modulus=$m text#$i")
      }
    }
  }
}
