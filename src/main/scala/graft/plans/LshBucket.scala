package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Deterministic hyperplane table for [[LshBucket]]: component (i, pos) is
  * derived from the first 32 bits of `md5("<seed>:<i>:<pos>")`, scaled to
  * [-1, 1). md5 renders identical hex in every engine (Spark, DuckDB,
  * Trino) and h/2^31 − 1 touches only exact double operations (h has 32
  * significant bits; division by a power of two and the subtraction are
  * exact), so the plane — and therefore every bucket id built on it — is
  * bit-reproducible from plain SQL. That turns the ANN bucketing from an
  * engine-private artifact into an auditable, oracle-checkable one (same
  * rationale as TextFunctions.portableHash32 for the minhash family; the
  * previous xxhash64 chain was seeded Spark-internally and blocked the
  * q32 oracle).
  *
  * The table depends only on (seed, bits, dims): each task lazily builds
  * rows up to the largest dimension it has seen (geometric growth, one
  * md5 per cell) and amortizes to a plain array lookup per element. It is
  * a reference object in the generated code, so the plan carries only
  * (seed, bits), never the table.
  */
final class LshPlanes(val seed: Long, val bits: Int) extends Serializable {
  // rebuilt on demand after deserialization; growth is deterministic so
  // concurrent rebuilds in racing tasks produce identical rows
  @transient @volatile private var table: Array[Array[Double]] = _

  private def cell(i: Int, pos: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(
      s"$seed:$i:$pos".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h.toDouble / 2147483648.0 - 1.0
  }

  /** Table with at least `n` position rows; row(pos)(i) = u(seed, i, pos). */
  def ensure(n: Int): Array[Array[Double]] = {
    val t = table
    if (t != null && t.length >= n) t
    else synchronized {
      val cur = table
      if (cur != null && cur.length >= n) cur
      else {
        val m = math.max(n, if (cur == null) 64 else cur.length * 2)
        val grown = Array.tabulate(m) { pos =>
          if (cur != null && pos < cur.length) cur(pos)
          else Array.tabulate(bits)(i => cell(i, pos))
        }
        table = grown
        grown
      }
    }
  }
}

/** Random-hyperplane LSH bucket id as ONE fused codegen'd loop — the
  * custom-Expression form of Similarity.lshBuckets' composed
  * `aggregate(transform(...))` column, kept bit-identical to it:
  *
  *   proj_i = Σ_pos  (double) emb[pos] · u(seed, i, pos)
  *   u      = md5_32("seed:i:pos") / 2^31 − 1        (see [[LshPlanes]])
  *   bucket = OR_i  (proj_i >= 0 ? 1L << i : 0)
  *
  * with the per-bit sums accumulated in element order, so float addition
  * order matches `aggregate`'s sequential fold — and matches a SQL
  * `list_reduce` fold, which is what lets the q32 oracle reproduce the
  * bucket assignment exactly.
  *
  * The HOF form walks the array through interpreted lambda dispatch once
  * per bit (b · len closure calls per row — the NOTES_r3-measured ~25 µs/
  * element pattern); this is a single primitive loop inside whole-stage
  * codegen reading a precomputed plane table.
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

  private lazy val planes = new LshPlanes(seed, bits)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucket.compute(v.asInstanceOf[ArrayData], planes, elemIsFloat)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val pl = ctx.addReferenceObj("lshPlanes", planes,
      classOf[LshPlanes].getName)
    val a = childGen.value
    val n = ctx.freshName("n")
    val tab = ctx.freshName("tab")
    val pos = ctx.freshName("pos")
    val i = ctx.freshName("i")
    val proj = ctx.freshName("proj")
    val x = ctx.freshName("x")
    val bad = ctx.freshName("bad")
    val bucket = ctx.freshName("bucket")
    val getX =
      if (elemIsFloat) s"(double) $a.getFloat($pos)" else s"$a.getDouble($pos)"
    val body =
      s"""
         |long $bucket = 0L;
         |if (!${childGen.isNull}) {
         |  final int $n = $a.numElements();
         |  final double[][] $tab = $pl.ensure($n);
         |  final double[] $proj = new double[$bits];
         |  boolean $bad = false;
         |  for (int $pos = 0; $pos < $n; $pos++) {
         |    if ($a.isNullAt($pos)) { $bad = true; break; }
         |    final double $x = $getX;
         |    final double[] ${tab}_r = $tab[$pos];
         |    for (int $i = 0; $i < $bits; $i++) {
         |      $proj[$i] += $x * ${tab}_r[$i];
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
  def compute(a: ArrayData, planes: LshPlanes, isFloat: Boolean): Long = {
    val n = a.numElements()
    val bits = planes.bits
    val tab = planes.ensure(n)
    val proj = new Array[Double](bits)
    var pos = 0
    while (pos < n) {
      if (a.isNullAt(pos)) return 0L
      val x = if (isFloat) a.getFloat(pos).toDouble else a.getDouble(pos)
      val row = tab(pos)
      var i = 0
      while (i < bits) {
        proj(i) += x * row(i)
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
