package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Bloom-filter membership test with the bit words held as a REFERENCE
  * OBJECT in the generated code, not a literal array in the plan.
  *
  * The composed form (BloomPrune.mightContainComposed — k chained
  * `element_at`/bit-test Columns over `lit(words)`) is elegant at the
  * default 2^20 bits (16 K longs) but embeds the whole filter into the
  * plan TREE: a 2^27-bit filter would be a 2M-element literal walked by
  * every plan transform, serialized into every explain/plan string, and
  * re-materialized per expression chain (k copies — one per hash). Here
  * the words array rides the task binary once, the k probes share it, and
  * the plan carries O(1) state regardless of filter size.
  *
  * Hash chain per probe i: `XXH64.hashLong(key, XXH64.hashInt(i, 42))` —
  * exactly Spark's `xxhash64(lit(i), key)` fold (seed 42, literal int
  * first, key second), so filters built by BloomPrune.buildBits probe
  * identically through either form; integral keys of any width hash via
  * the int/long path Spark's XxHash64 uses for that width.
  *
  * Null keys return false (nullable = false): a bloom pre-filter feeds an
  * equi-join, and a null key can never match one — dropping it early is
  * the join's own semantics.
  */
case class BloomProbe(child: Expression, words: Array[Long], numHashes: Int)
  extends UnaryExpression {

  require(words.nonEmpty && (words.length & (words.length - 1)) == 0,
    s"word count must be a power of two, got ${words.length}")
  require(numHashes >= 1, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${dt.catalogString}; " +
        "hash non-integral keys into a long upstream")
  }

  // xxhash64(lit(i), key) folds the literal first: per-hash prefix.
  private lazy val prefixes: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  private def keyIsLong: Boolean = child.dataType == LongType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else {
      val key: Long = v match {
        case l: java.lang.Long => l
        case n: java.lang.Number => n.intValue().toLong
      }
      BloomProbe.test(key, keyIsLong, words, prefixes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val pre = ctx.addReferenceObj("bloomPrefixes", prefixes, "long[]")
    val xxh = classOf[XXH64].getName
    val hit = ctx.freshName("hit")
    val i = ctx.freshName("i")
    val h = ctx.freshName("h")
    val pos = ctx.freshName("pos")
    val mask = words.length.toLong * 64L - 1L
    val hashCall =
      if (keyIsLong) s"$xxh.hashLong(${childGen.value}, $pre[$i])"
      else s"$xxh.hashInt((int) ${childGen.value}, $pre[$i])"
    val body =
      s"""
         |boolean $hit = false;
         |if (!${childGen.isNull}) {
         |  $hit = true;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    final long $h = $hashCall;
         |    final long $pos = $h & ${mask}L;
         |    if (($w[(int) ($pos >>> 6)] & (1L << $pos)) == 0L) {
         |      $hit = false;
         |      break;
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = childGen.code + code"$body",
      isNull = FalseLiteral,
      value = JavaCode.variable(hit, BooleanType))
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
  override def prettyName: String = "bloom_probe"

  // words can be huge: keep equality/explain cheap and stable by identity
  // (the array is driver-built per query; no two probes share one by
  // coincidence)
  override def toString: String =
    s"bloom_probe($child, ${words.length} words, k=$numHashes)"
}

object BloomProbe {
  /** Interpreted twin of the generated loop. `1L << pos` in Java shifts by
    * pos & 63 — the word bit — matching the composed form's
    * shiftleft(1, pos & 63).
    */
  def test(key: Long, keyIsLong: Boolean, words: Array[Long],
           prefixes: Array[Long]): Boolean = {
    val mask = words.length.toLong * 64L - 1L
    var i = 0
    while (i < prefixes.length) {
      val h =
        if (keyIsLong) XXH64.hashLong(key, prefixes(i))
        else XXH64.hashInt(key.toInt, prefixes(i))
      val pos = h & mask
      if ((words((pos >>> 6).toInt) & (1L << pos.toInt)) == 0L) return false
      i += 1
    }
    true
  }

  def apply(key: Column, words: Array[Long], numHashes: Int): Column =
    GraftBridge.column(
      new BloomProbe(GraftBridge.expression(key), words, numHashes))
}
