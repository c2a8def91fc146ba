package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused signed-hyperplane projection of a quantized (long) vector:
  * returns the `outDim` exact integer dot products with a ±1 sign
  * matrix — the per-row core of signed random projection (SRP) sketches.
  *
  * Why an Expression: the composed form unrolls outDim·dim element_at
  * terms (~2k expression nodes at 16×64), whose janino compilation
  * dominated the q148 gate (the [[ArgminDistance]] story again — fixed
  * compile cost, not per-row work). Fused, the sign matrix is ONE
  * referenced object and the hot loop a tight two-level
  * multiply-accumulate inside whole-stage codegen.
  *
  * Exactness: pure long arithmetic, identical to the composed sum in any
  * order. Overflow bound: |q|·dim < 2⁶³ per projection — at the
  * quantization scale used by the SRP operator (|q| ≤ ~2·10⁴, dim 64)
  * headroom is ~2³⁰.
  *
  * Null semantics: null array, null element, or length ≠ the matrix
  * width ⇒ null (the [[ArgminDistance]] convention).
  */
case class SignedProjection(child: Expression, signs: Array[Array[Long]])
  extends UnaryExpression {

  require(signs.nonEmpty && signs.forall(_.length == signs(0).length),
    "signed_projection: sign matrix must be rectangular and non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SignedProjection.compute(input.asInstanceOf[ArrayData], signs)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("signs", signs, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.freshName("mat")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      s"""
         |final long[][] $mat = $matRef;
         |final int $dim = $mat[0].length;
         |boolean $bad = ($a.numElements() != $dim);
         |for (int $i = 0; !$bad && $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else {
         |  final long[] $out = new long[$mat.length];
         |  for (int $j = 0; $j < $mat.length; $j++) {
         |    final long[] $row = $mat[$j];
         |    long $acc = 0L;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += $a.getLong($d) * $row[$d];
         |    }
         |    $out[$j] = $acc;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
  override def prettyName: String = "signed_projection"
}

object SignedProjection {
  /** Shared by interpreted eval and tests. */
  def compute(a: ArrayData, signs: Array[Array[Long]]): Any = {
    val dim = signs(0).length
    if (a.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Long](signs.length)
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      var acc = 0L
      var d = 0
      while (d < dim) {
        acc += a.getLong(d) * row(d)
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(qv: Column, signs: Array[Array[Long]]): Column =
    GraftBridge.column(
      new SignedProjection(GraftBridge.expression(qv), signs))
}
