package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a whole-stage-codegen scalar, parity-pinned
  * to DuckDB's `jaro_winkler_similarity` (the verify oracle):
  *
  *  - either side empty ⇒ 0.0 (DuckDB returns 0.0 even for two empties);
  *  - match window `max(|a|,|b|)/2 - 1` (floored at 0), greedy
  *    left-to-right matching;
  *  - transpositions halved with INTEGER division (an odd mismatch count
  *    rounds down — probed against the oracle, "abcdef"/"bcadef" =
  *    0.944..., not the 0.9166... a float halving would give);
  *  - Winkler boost `+ l·0.1·(1-jaro)` with prefix cap 4, applied only
  *    when jaro > 0.7.
  *
  * Comparison is per Unicode codepoint; the oracle compares UTF-8 per
  * its own unit, so callers keep join inputs ASCII (the q227 twin feeds
  * TPC-H part names). Why an Expression rather than a UDF: this is a
  * join-side predicate input evaluated once per candidate pair inside
  * the block join's codegen stage; a Scala UDF would break the
  * WholeStageCodegen span at exactly the hot spot.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  /** Shared by interpreted eval, codegen (static call), and tests. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && b(j) == a(i)) {
          aMatched(i) = true
          bMatched(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a(i) != b(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2 // integer halving — see scaladoc
    val jaro =
      (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxL = math.min(4, math.min(la, lb))
      var l = 0
      while (l < maxL && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(new JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
