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
