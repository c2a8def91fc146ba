package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash signature in one compiled pass — the fused form of
  * [[graft.operators.Dedup.minhashSignature]]'s
  * `array(array_min(transform(base, h => pmod(h*a_i + b_i, p))) x k)`
  * composition, which walks the shingle array through interpreted lambda
  * dispatch once per permutation (k passes). This expression computes
  * every shingle's md5-portable base hash once and folds all k minima in
  * a single tight loop — the difference between an ingest-rate cost and a
  * corpus-scale one on the streaming gate path (q94: the interpreted form
  * priced the gate at ~6 s; see MinhashSignatureParitySpec for the
  * value-identity pin).
  *
  * Reproduces the composed form bit-for-bit:
  *  - tokens: `split(text, " ")` semantics (Java regex, limit -1 — empty
  *    tokens preserved);
  *  - shingles: space-joined n-grams, 1-based windows (order irrelevant
  *    here: minima are permutation-invariant, so the composed form's
  *    array_distinct can be skipped);
  *  - base hash: first 8 hex chars of md5 over the UTF-8 bytes, read as
  *    an unsigned 32-bit value ([[graft.functions.TextFunctions.portableHash32]]);
  *  - permutation i: `(h * (1 + 2i) + 12582917 * (i + 1)) mod (2^31-1)`
  *    (all operands positive, so Java % equals pmod);
  *  - fewer than n tokens: k NULL minima (array_min of an empty array),
  *    matching the short-doc contract the stream gate documents;
  *  - NULL text: also k NULL minima — the composed form propagates the
  *    null through split/transform into every array_min slot, producing
  *    `array(null x k)`, NOT a null array, so this expression overrides
  *    the UnaryExpression null short-circuit to match bit-for-bit
  *    (MinhashSignatureParitySpec pins both degenerate rows).
  *
  * CodegenFallback like [[WordShingleHashes]]: the cost is the
  * per-element loop, not the single virtual dispatch per row.
  */
case class MinhashSignature(child: Expression, shingleN: Int, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(shingleN >= 1, s"shingle width must be >= 1, got $shingleN")
  require(k >= 1, s"signature length must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.catalogString}")
  }

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val p = 2147483647L // 2^31 - 1

  // the result is an array of k (possibly null) minima for EVERY input,
  // null text included — never a null array
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) new GenericArrayData(Array.fill[Any](k)(null))
    else nullSafeEval(value)
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < shingleN)
      return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = Array.fill(k)(Long.MaxValue)
    val md = md5.get()
    var i = 0
    while (i <= toks.length - shingleN) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < shingleN) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var t = 0
      while (t < k) {
        val v = (h * (1L + 2L * t) + 12582917L * (t + 1)) % p
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {
  def apply(text: Column, shingleN: Int, k: Int): Column =
    GraftBridge.column(
      new MinhashSignature(GraftBridge.expression(text), shingleN, k))
}
