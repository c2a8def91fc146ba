package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes of a token array, in one compiled
  * pass — the fused form of
  * `array_distinct(transform(shingles, s => xxhash64(s)))` over
  * `transform(sequence(...), i => concat_ws(" ", element_at(toks, i), ...))`.
  *
  * Value-identical to that composition: shingles are the space-joined
  * n-grams (concat_ws semantics — null tokens skipped), hashed with
  * Spark's xxhash64 (XXH64 over the UTF8 bytes, seed 42), deduplicated
  * keeping first occurrence. The composed form pays interpreted lambda
  * dispatch per ELEMENT (two HOF walks per row — the measured ~25 µs/
  * element pattern); this expression is one virtual call per ROW with the
  * whole loop in compiled code (CodegenFallback is fine here: the cost is
  * the per-element work, not the single dispatch).
  *
  * Null array => null (like transform); fewer than n tokens => empty.
  */
case class WordShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.catalogString}")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](len - n + 1)
    var outLen = 0
    val seen = new java.util.HashSet[java.lang.Long](out.length * 2)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) {
        parts(k) = toks.getUTF8String(i + k) // null => concatWs skips it
        k += 1
      }
      val s = UTF8String.concatWs(space, parts: _*)
      val h = XXH64.hashUTF8String(s, 42L)
      if (seen.add(h)) { out(outLen) = h; outLen = 1 + outLen }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
  override def prettyName: String = "word_shingle_hashes"
}

object WordShingleHashes {
  def apply(toks: Column, n: Int): Column =
    GraftBridge.column(new WordShingleHashes(GraftBridge.expression(toks), n))
}
