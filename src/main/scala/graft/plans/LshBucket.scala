package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH bucket id as ONE fused codegen'd loop — the
  * custom-Expression form of Similarity.lshBuckets' original
  * `aggregate(transform(...))` column, kept bit-identical to it:
  *
  *   proj_i = Σ_pos  (double) emb[pos] · u(seed, i, pos)
  *   u      = xxhash64(seed: long, i: int, pos: int) / Long.MaxValue
  *   bucket = OR_i  (proj_i >= 0 ? 1L << i : 0)
  *
  * with the xxhash64 chain exactly as Spark's XxHash64 expression folds
  * its arguments (running hash seeded 42, hashLong then hashInt twice)
  * and the per-bit sums accumulated in element order, so float addition
  * order matches `aggregate`'s sequential fold.
  *
  * The HOF form walks the array through interpreted lambda dispatch once
  * per bit (b · len closure calls per row — the NOTES_r3-measured ~25 µs/
  * element pattern); this is a single primitive loop inside whole-stage
  * codegen. The per-bit hash prefix hashInt(i, hashLong(seed, 42)) is
  * precomputed once at construction.
  *
  * Null semantics match the composed form: a null array or any null
  * element nulls every projection, and `when(null >= 0, ...)`'s otherwise
  * branch contributes 0 — so the bucket is 0L, never null.
  */
case class LshBucket(child: Expression, bits: Int, seed: Long)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> input, got " +
        dt.catalogString)
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // hashInt(bit, hashLong(seed, 42)) — the constant prefix of the
  // xxhash64(seed, bit, pos) chain, one per bit.
  private lazy val prefixes: Array[Long] = {
    val h1 = XXH64.hashLong(seed, 42L)
    Array.tabulate(bits)(i => XXH64.hashInt(i, h1))
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucket.compute(v.asInstanceOf[ArrayData], prefixes, elemIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val pre = ctx.addReferenceObj("lshPrefixes", prefixes, "long[]")
    val a = childGen.value
    val n = ctx.freshName("n")
    val pos = ctx.freshName("pos")
    val i = ctx.freshName("i")
    val proj = ctx.freshName("proj")
    val x = ctx.freshName("x")
    val bad = ctx.freshName("bad")
    val bucket = ctx.freshName("bucket")
    val getX =
      if (elemIsFloat) s"(double) $a.getFloat($pos)" else s"$a.getDouble($pos)"
    val xxh = classOf[XXH64].getName
    val maxL = java.lang.Long.MAX_VALUE.toDouble
    val body =
      s"""
         |long $bucket = 0L;
         |if (!${childGen.isNull}) {
         |  final int $n = $a.numElements();
         |  final double[] $proj = new double[$bits];
         |  boolean $bad = false;
         |  for (int $pos = 0; $pos < $n; $pos++) {
         |    if ($a.isNullAt($pos)) { $bad = true; break; }
         |    final double $x = $getX;
         |    for (int $i = 0; $i < $bits; $i++) {
         |      $proj[$i] += $x *
         |        (((double) $xxh.hashInt($pos, $pre[$i])) / ${maxL}D);
         |    }
         |  }
         |  if (!$bad) {
         |    for (int $i = 0; $i < $bits; $i++) {
         |      // !(x < 0), not (x >= 0): Spark's >= orders NaN above all
         |      // numbers, so a NaN projection sets its bit in the
         |      // composed form and must here too
         |      if (!($proj[$i] < 0.0)) $bucket |= (1L << $i);
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = childGen.code + code"$body",
      isNull = FalseLiteral,
      value = JavaCode.variable(bucket, LongType))
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
  override def prettyName: String = "lsh_bucket"
}

object LshBucket {
  /** Interpreted twin of the generated loop — identical fold order. */
  def compute(a: ArrayData, prefixes: Array[Long], isFloat: Boolean): Long = {
    val n = a.numElements()
    val bits = prefixes.length
    val proj = new Array[Double](bits)
    var pos = 0
    while (pos < n) {
      if (a.isNullAt(pos)) return 0L
      val x = if (isFloat) a.getFloat(pos).toDouble else a.getDouble(pos)
      var i = 0
      while (i < bits) {
        proj(i) += x * (XXH64.hashInt(pos, prefixes(i)).toDouble /
          Long.MaxValue.toDouble)
        i += 1
      }
      pos += 1
    }
    var bucket = 0L
    var i = 0
    while (i < bits) {
      // !(x < 0) matches Spark's NaN-is-greatest `>=` in the composed form
      if (!(proj(i) < 0.0)) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  def apply(emb: Column, bits: Int, seed: Long): Column =
    GraftBridge.column(new LshBucket(GraftBridge.expression(emb), bits, seed))
}
