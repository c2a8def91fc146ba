package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key from two `bits`-bit coordinates (bits ≤ 16):
  * interleaves the low `bits` bits of `x` (even output bits) and `y`
  * (odd output bits) into a 2·bits-bit key.
  *
  * Why an Expression: the z-key is evaluated once per ROW of the table
  * being laid out — the full-scan hot path of
  * [[graft.sources.Layout.zOrderBuckets]] and the q63 layout key. The
  * branchless magic-number bit spread (the classic
  * `0x00FF00FF → 0x55555555` doubling ladder) is 8 shift/mask ops per
  * coordinate inside generated code; the composed per-bit
  * `shiftleft`/`bitwiseAND` Column tree ([[graft.sources.Layout]]'s
  * pre-fusion form, still the >16-bit fallback) produces the same
  * value but as a 2·bits-term expression tree.
  *
  * Exactness: pure integer arithmetic — bit-identical in any engine
  * (the DuckDB oracle replays the identical ladder on BIGINTs).
  * Inputs are masked to `bits` bits, so the result is in [0, 2^2bits).
  *
  * Null semantics: null input ⇒ null (BinaryExpression default).
  */
case class InterleaveBits(left: Expression, right: Expression,
                          bits: Int = 16)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  private def mask: Long = (1L << bits) - 1L

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      s"""
         |long $sx = $a & ${mask}L;
         |long $sy = $b & ${mask}L;
         |$sx = ($sx | ($sx << 8)) & 0x00FF00FFL;
         |$sx = ($sx | ($sx << 4)) & 0x0F0F0F0FL;
         |$sx = ($sx | ($sx << 2)) & 0x33333333L;
         |$sx = ($sx | ($sx << 1)) & 0x55555555L;
         |$sy = ($sy | ($sy << 8)) & 0x00FF00FFL;
         |$sy = ($sy | ($sy << 4)) & 0x0F0F0F0FL;
         |$sy = ($sy | ($sy << 2)) & 0x33333333L;
         |$sy = ($sy | ($sy << 1)) & 0x55555555L;
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "interleave_bits"
}

object InterleaveBits {
  /** Shared by interpreted eval and tests. */
  def compute(x: Long, y: Long, bits: Int = 16): Long = {
    val mask = (1L << bits) - 1L
    def spread(v0: Long): Long = {
      var v = v0 & mask
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }

  def apply(x: Column, y: Column): Column = apply(x, y, 16)

  def apply(x: Column, y: Column, bits: Int): Column =
    GraftBridge.column(
      new InterleaveBits(GraftBridge.expression(x), GraftBridge.expression(y),
        bits))
}
