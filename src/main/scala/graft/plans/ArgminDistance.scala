package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused nearest-centroid assignment over a quantized (long) vector:
  * returns the composite key `minDist * k + j0` (j0 = 0-based index of
  * the nearest centroid, ties to the smaller j — the same total order
  * the composed `least(dist_j * k + j)` form encodes).
  *
  * Why an Expression: [[graft.operators.Clustering.kMeansLloyd]] needs a
  * fresh assignment plan per Lloyd round (the centroids are new
  * literals each time). The composed form unrolls k·dim element_at
  * terms — ~(8·64)·2 expression nodes whose janino compilation dominates
  * the round at small data and re-runs EVERY round. This fused form is
  * ONE expression holding the centroid matrix as a referenced object:
  * trivial to compile, and the hot loop is a tight two-level
  * long-multiply-accumulate inside whole-stage codegen.
  *
  * Exactness: pure integer arithmetic — identical to the composed form
  * and to the q145 oracle's relational twin in any evaluation order.
  * Overflow bound: dist ≤ dim·maxDiff² and dist·k must stay < 2⁶³ — at
  * the quantization scales used here (|q| ≤ 2·10⁴, dim 64, k ≤ 2¹⁰)
  * the headroom is ~2²⁰.
  *
  * Null semantics: null array, null element, or a length ≠ the centroid
  * width ⇒ null (mirrors the composed form, whose element_at on a short
  * array would error instead — the gate never feeds ragged input).
  */
case class ArgminDistance(child: Expression, cents: Array[Array[Long]])
  extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "argmin_distance: centroid matrix must be rectangular and non-empty")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArgminDistance.compute(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("cents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.freshName("mat")
      val dim = ctx.freshName("dim")
      val best = ctx.freshName("best")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val c = ctx.freshName("c")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val key = ctx.freshName("key")
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
         |  long $best = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $mat.length; $j++) {
         |    final long[] $c = $mat[$j];
         |    long $dist = 0L;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      final long $diff = $a.getLong($d) - $c[$d];
         |      $dist += $diff * $diff;
         |    }
         |    final long $key = $dist * $mat.length + $j;
         |    if ($key < $best) { $best = $key; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
  override def prettyName: String = "argmin_distance"
}

object ArgminDistance {
  /** Shared by interpreted eval and tests. */
  def compute(a: ArrayData, cents: Array[Array[Long]]): Any = {
    val dim = cents(0).length
    if (a.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    var best = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var dist = 0L
      var d = 0
      while (d < dim) {
        val diff = a.getLong(d) - c(d)
        dist += diff * diff
        d += 1
      }
      val key = dist * cents.length + j
      if (key < best) best = key
      j += 1
    }
    best
  }

  def apply(qv: Column, cents: Array[Array[Long]]): Column =
    GraftBridge.column(new ArgminDistance(GraftBridge.expression(qv), cents))
}
