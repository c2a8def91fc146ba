package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns.
  *
  * Why an Expression: [[graft.operators.Clustering.semDedup]] evaluates
  * one dot per CANDIDATE PAIR — the hot inner loop of the intra-cluster
  * prune. The composed `aggregate(zip_with(...))` form allocates a
  * zipped intermediate array and evaluates two interpreted lambdas per
  * pair (higher-order functions don't participate in whole-stage
  * codegen); this is a single tight multiply-accumulate inside the
  * generated code, and it also serves the per-row squared norm as
  * `LongDot(sv, sv)`.
  *
  * Exactness: pure long arithmetic, any evaluation order. Overflow
  * bound: |x·y|·dim < 2⁶³ — at the ±(scale + small) component bound used
  * by semDedup (scale 10³, dim 64) the headroom is ~2³⁰.
  *
  * Null semantics: null input array ⇒ null (BinaryExpression default);
  * null element or length mismatch ⇒ null.
  */
case class LongDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |long $acc = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $acc += $a.getLong($i) * $b.getLong($i); }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "long_dot"
}

object LongDot {
  /** Shared by interpreted eval and tests. */
  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      new LongDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
