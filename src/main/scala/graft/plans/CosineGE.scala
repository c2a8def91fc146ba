package graft.plans

import java.math.BigInteger

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Exact integer cosine-threshold predicate over two quantized (long)
  * vectors with precomputed squared norms:
  * `cos(a, b) >= tauNum/tauDen`, decided as
  * `dot > 0 AND tauDen²·dot² >= tauNum²·na2·nb2` in arbitrary-precision
  * integers — no float boundary, any parameter magnitude (the DuckDB
  * twin computes the same products in HUGEINT).
  *
  * Why an Expression: this predicate is
  * [[graft.operators.Clustering.semDedup]]'s pair-join condition. As a
  * composed filter, Catalyst substitutes the `dot` alias into the join
  * condition on pushdown and the 64-wide dot product evaluates three
  * times per candidate pair (once per reference). Fused, the dot runs
  * ONCE per pair, and the only non-codegen work is the boundary compare.
  *
  * Semantics: ragged input (length mismatch, null element) ⇒ false, not
  * null — this is a join predicate; a pair that cannot be compared is
  * not a duplicate. Null ARRAY/norm inputs ⇒ null (standard null-safe
  * predicate behavior; such rows never reach the gate's join).
  */
case class CosineGE(sva: Expression, svb: Expression,
                    na2: Expression, nb2: Expression,
                    tauNum: Long, tauDen: Long)
  extends QuaternaryExpression {

  require(tauNum > 0 && tauDen > 0, "threshold must be positive")

  override def first: Expression = sva
  override def second: Expression = svb
  override def third: Expression = na2
  override def fourth: Expression = nb2

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (sva.dataType, svb.dataType, na2.dataType, nb2.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>, bigint, " +
          s"bigint), got $other")
    }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    CosineGE.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Long], d.asInstanceOf[Long], tauNum, tauDen)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val (tn, td) = (tauNum, tauDen)
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.plans.CosineGE.compute($a, $b, $c, $d, " +
        s"${tn}L, ${td}L);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, o: Expression)
  : Expression = copy(sva = f, svb = s, na2 = t, nb2 = o)
  override def prettyName: String = "cosine_ge"
}

object CosineGE {
  /** Shared by interpreted eval, codegen (static call), and tests. */
  def compute(a: ArrayData, b: ArrayData, na2: Long, nb2: Long,
              tauNum: Long, tauDen: Long): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var dot = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    if (dot <= 0L) return false
    val bd = BigInteger.valueOf(dot)
    val lhs = BigInteger.valueOf(tauDen * tauDen).multiply(bd.multiply(bd))
    val rhs = BigInteger.valueOf(tauNum * tauNum)
      .multiply(BigInteger.valueOf(na2))
      .multiply(BigInteger.valueOf(nb2))
    lhs.compareTo(rhs) >= 0
  }

  def apply(sva: Column, svb: Column, na2: Column, nb2: Column,
            tauNum: Long, tauDen: Long): Column =
    GraftBridge.column(new CosineGE(
      GraftBridge.expression(sva), GraftBridge.expression(svb),
      GraftBridge.expression(na2), GraftBridge.expression(nb2),
      tauNum, tauDen))
}
