package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Pins the fused [[graft.plans.MinhashSignature]] expression to the
  * interpreted Column composition value-for-value — the contract that
  * lets the streaming ingest gate use the fast form while the history
  * index is built by the relational pipeline (all three forms must
  * bucket identically or the gate silently flags nothing).
  */
class MinhashSignatureParitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup
    (3L, "completely different content with many other words here now"),
    (4L, "double  space   runs survive the split exactly as spark does"),
    (5L, "tiny doc"),   // < 3 tokens -> k nulls
    (6L, ""),           // empty string -> one empty token -> k nulls
    (7L, "exactly three tokens"), // boundary: one shingle
    (8L, null))         // NULL text -> array of k nulls, not a null array
    .toDF("id", "text")

  test("fused expression equals the Column composition on every doc") {
    def sigs(c: org.apache.spark.sql.Column) =
      docs.select(col("id"), c.as("sig")).collect()
        .map(r => r.getLong(0) ->
          Option(r.getSeq[java.lang.Long](1)).map(_.toVector)).toMap
    val composed = sigs(Dedup.minhashSignature(col("text"), 3, 32))
    val fused = sigs(graft.plans.MinhashSignature(col("text"), 3, 32))
    assert(fused === composed)
    // spot-check semantics: dup docs agree, null-signature short docs
    assert(fused(1L) === fused(2L))
    assert(fused(5L).get.forall(_ == null))
    assert(fused(6L).get.forall(_ == null))
    assert(fused(7L).get.forall(_ != null))
    // null text: the composed form propagates the null into every
    // array_min slot (array of k nulls); the fused form must match
    // rather than short-circuit to a null array
    assert(fused(8L).isDefined && fused(8L).get.size === 32 &&
      fused(8L).get.forall(_ == null))
  }

  test("fused expression equals the relational pipeline's signatures") {
    val real = docs.filter(length(col("text")) > 30)
    val relational = Dedup.minhashSignatures(real, "text", "id", 3, 32)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong).toVector)
      .toMap
    val fused = real.select(col("id"),
      graft.plans.MinhashSignature(col("text"), 3, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(fused === relational)
  }
}
