package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Cosine similarity over symmetric-int8-quantized vectors
  * ([[graft.functions.VectorFunctions.quantizeInt8]]'s output) — the
  * QUERY-side primitive of the memory-bound ANN path.
  *
  * Because the quantization is symmetric (one positive scale per
  * vector), the scales cancel out of the cosine:
  *
  *   cos(a·s_a, b·s_b) = (Σ a_i b_i) / (sqrt(Σ a_i²) · sqrt(Σ b_i²))
  *
  * so the whole hot loop is INTEGER multiply-accumulate — exact in any
  * evaluation order (|q| ≤ 127 ⇒ per-term ≤ 16129; a 2³¹-dim vector
  * cannot overflow the long accumulators), with exactly one deterministic
  * FP divide at the end. That makes the quantized similarity bit-exact
  * across engines with NO fold-order caveat — stronger than the float
  * form, whose sequential-fold contract both sides must honor.
  *
  * Same fused-loop rationale as [[CosineSimilarity]]: one primitive loop
  * in whole-stage codegen vs three interpreted HOF array walks.
  *
  * Null semantics: null array, null element, or length mismatch ⇒ null;
  * a zero vector (all-zero quantization, norm 0) ⇒ null — cosine is
  * undefined, and the oracle mirrors it with NULLIF.
  */
case class Int8Cosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> (quantized) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    Int8Cosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |long $dot = 0L, $na = 0L, $nb = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  final long $x = $a.getInt($i);
         |  final long $y = $b.getInt($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($bad || $na == 0L || $nb == 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (double) $dot / (Math.sqrt((double) $na) * Math.sqrt((double) $nb)); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
  override def prettyName: String = "int8_cosine"
}

object Int8Cosine {
  /** Shared by interpreted eval and tests. */
  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getInt(i).toLong
      val y = b.getInt(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(new Int8Cosine(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
