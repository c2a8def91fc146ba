package graft

import graft.operators.Dedup
import org.scalatest.BeforeAndAfterEach

/** The exact-join circuit breaker: [[Dedup.setSimilarityJoin]] and
  * [[Dedup.containmentJoin]] price their candidate join from per-element
  * prefix occurrence counts BEFORE launching it and refuse past
  * `spark.graft.exactJoinMaxCandidates` — the exact-tier counterpart of
  * the LSH hot-bucket caps. These tests plant the corpus the prefix
  * filter cannot collapse (every doc's rarest element is the SAME
  * element: identical single-shingle docs → sum C(k,2) goes quadratic in
  * corpus size) and pin: the default cap trips on it, a tiny cap trips
  * on a benign corpus, `0` disables, and results under the default cap
  * are unchanged (q126/q187 stay oracle-green).
  */
class DedupBreakerSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = {
    spark.conf.unset("spark.graft.exactJoinMaxCandidates")
    CacheScope.releaseAll()
  }

  // 50k identical two-token docs: one shingle each at shingleN=2, so every
  // prefix is that shingle — est = C(50000, 2) ≈ 1.25e9 > the 1e9 default.
  private def hotCorpus = spark.range(0, 50000L)
    .selectExpr("id", "'alpha beta' as text")

  private def benign = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over a lazy dog"),
    (3L, "entirely different words live in this one here")
  ).toDF("id", "text")

  test("setSimilarityJoin: default cap trips on a hot corpus before the join") {
    val e = intercept[IllegalStateException] {
      Dedup.setSimilarityJoin(hotCorpus, "id", "text", 1, 2, shingleN = 2)
    }
    assert(e.getMessage.contains("candidate"))
    assert(e.getMessage.contains("MinHash"))
    assert(e.getMessage.contains("spark.graft.exactJoinMaxCandidates"))
  }

  test("containmentJoin: default cap trips on a hot corpus before the join") {
    val e = intercept[IllegalStateException] {
      Dedup.containmentJoin(hotCorpus, "id", "text", 4, 5, shingleN = 2)
    }
    assert(e.getMessage.contains("MinHash"))
  }

  test("setSimilarityJoin: a tiny conf cap trips even on a benign corpus") {
    spark.conf.set("spark.graft.exactJoinMaxCandidates", "1")
    intercept[IllegalStateException] {
      Dedup.setSimilarityJoin(benign, "id", "text", 1, 2, shingleN = 2)
    }
  }

  test("containmentJoin: a tiny conf cap trips even on a benign corpus") {
    spark.conf.set("spark.graft.exactJoinMaxCandidates", "1")
    intercept[IllegalStateException] {
      Dedup.containmentJoin(benign, "id", "text", 4, 5, shingleN = 2)
    }
  }

  test("property: prefix filtering stays lossless vs a naive twin on " +
    "random corpora, with the breaker active (seeded sweep)") {
    val rnd = new scala.util.Random(1234)
    val vocab = Array("red", "blue", "fox", "dog", "run", "sky", "sun",
      "map", "cat", "box")
    for (caseNo <- 1 to 5) {
      val (tNum, tDen) = Seq((1, 2), (1, 3), (2, 3))(rnd.nextInt(3))
      val docs = Seq.tabulate(30) { i =>
        val words = Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length)))
        (i.toLong, words.mkString(" "))
      }.toDF("id", "text")
      val got = Dedup.setSimilarityJoin(docs, "id", "text", tNum, tDen,
        shingleN = 2)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      CacheScope.releaseAll()
      // naive twin: exact distinct-bigram Jaccard over ALL pairs
      val rows = docs.as[(Long, String)].collect()
      def sh(t: String) =
        t.split(" ").sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSet
      val want = (for {
        (a, ta) <- rows; (b, tb) <- rows if a < b
        sa = sh(ta); sb = sh(tb)
        if sa.nonEmpty && sb.nonEmpty
        c = (sa intersect sb).size
        if c.toLong * tDen >= tNum.toLong * (sa.size + sb.size - c)
      } yield (a, b)).toSet
      assert(got == want, s"case $caseNo t=$tNum/$tDen: " +
        s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("cap 0 disables the breaker; results match the default-cap run") {
    val dflt = Dedup.setSimilarityJoin(benign, "id", "text", 1, 2,
      shingleN = 2).orderBy("id_a", "id_b").collect()
    assert(dflt.nonEmpty) // docs 1 and 2 are genuine near-dups
    CacheScope.releaseAll()
    spark.conf.set("spark.graft.exactJoinMaxCandidates", "0")
    val off = Dedup.setSimilarityJoin(benign, "id", "text", 1, 2,
      shingleN = 2).orderBy("id_a", "id_b").collect()
    assert(off.toSeq == dflt.toSeq)
    CacheScope.releaseAll()
    spark.conf.set("spark.graft.exactJoinMaxCandidates", "1")
    intercept[IllegalStateException] {
      Dedup.setSimilarityJoin(benign, "id", "text", 1, 2, shingleN = 2)
    }
  }
}
