package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions of a string, in one
  * compiled pass — the fused form of the q176 rolling-hash SQL:
  * explode positions 1..len, `h(pos) = Σ_{j<window} ascii(char at
  * pos−j) · 31^j` via a `window`-deep lag chain, boundary iff
  * `pos >= window && h % modulus == 0`, plus the final position, made
  * distinct and sorted.
  *
  * Value-identical to that composition: positions count Spark STRING
  * CHARACTERS (code points, exactly `substring`'s unit) and each
  * character contributes its code point value (exactly `ascii`'s value
  * for the 1-char substring). The relational form paid one row PER
  * CHARACTER through an exchange and a per-character lag window — a
  * byte-linear shuffle whose only product is this per-document array.
  *
  * Null string => null; empty string => empty array (callers filter
  * empty docs first, matching the relational form's `length(t) > 0`).
  */
case class CdcBoundaries(child: Expression, window: Int, modulus: Int)
  extends UnaryExpression with CodegenFallback {

  require(window >= 2 && window <= 8,
    s"window must be in [2,8], got $window")
  require(modulus >= 2, s"modulus must be >= 2, got $modulus")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.catalogString}")
  }

  private val pow31: Array[Long] = {
    val a = new Array[Long](window)
    a(0) = 1L
    var j = 1
    while (j < window) { a(j) = a(j - 1) * 31L; j += 1 }
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // code points in order (the unit substring/ascii count by)
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val cp = new Array[Long](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val c = s.codePointAt(off)
      cp(ci) = c.toLong
      ci += 1
      off += Character.charCount(c)
    }
    val out = new Array[Long](n)
    var outLen = 0
    var pos = window
    while (pos <= n) {
      var h = 0L
      var j = 0
      while (j < window) { h += cp(pos - 1 - j) * pow31(j); j += 1 }
      if (h % modulus == 0) { out(outLen) = pos.toLong; outLen += 1 }
      pos += 1
    }
    if (outLen == 0 || out(outLen - 1) != n.toLong) {
      out(outLen) = n.toLong
      outLen += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
  override def prettyName: String = "cdc_boundaries"
}

object CdcBoundaries {
  def apply(text: Column, window: Int, modulus: Int): Column =
    GraftBridge.column(
      new CdcBoundaries(GraftBridge.expression(text), window, modulus))
}
