package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd haversine distance (meters) — the custom-Expression
  * form of graft.functions.GeoFunctions.haversineMeters (reference
  * expression tree: src/polaroam/utils.py:290-313).
  *
  * Semantics are bit-identical to the composed-builtin version: same Math
  * calls in the same order (sin/cos/asin/sqrt/pow), R = 6371000 m. The
  * payoff over the composed form is one fused expression node instead of
  * ~15 (smaller codegen, fewer boxed intermediates); it stays inside
  * whole-stage codegen via doGenCode.
  */
case class Haversine(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override def nullSafeEval(lat1: Any, lon1: Any,
                            lat2: Any, lon2: Any): Any =
    Haversine.compute(
      lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la1, lo1, la2, lo2) =>
      s"${ev.value} = graft.plans.Haversine.compute($la1, $lo1, $la2, $lo2);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(newFirst, newSecond, newThird, newFourth)
}

object Haversine {
  /** Shared by interpreted eval and generated code: formula term-for-term
    * identical to the composed-builtin version.
    */
  def compute(lat1: Double, lon1: Double,
              lat2: Double, lon2: Double): Double = {
    val la1 = Math.toRadians(lat1)
    val la2 = Math.toRadians(lat2)
    val dLat = la2 - la1
    val dLon = Math.toRadians(lon2) - Math.toRadians(lon1)
    val a = Math.pow(Math.sin(dLat / 2), 2) +
      Math.cos(la1) * Math.cos(la2) * Math.pow(Math.sin(dLon / 2), 2)
    2 * 6371000.0 * Math.asin(Math.sqrt(a))
  }

  /** Column builder over the native expression. */
  def distanceMeters(lat1: Column, lon1: Column,
                     lat2: Column, lon2: Column): Column =
    GraftBridge.column(Haversine(
      GraftBridge.expression(lat1), GraftBridge.expression(lon1),
      GraftBridge.expression(lat2), GraftBridge.expression(lon2)))
}
