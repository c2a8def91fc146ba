package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning (beyond the reference's surface): build a
  * bloom filter over the dim side's join keys, pre-filter the fact side
  * with a pure expression BEFORE its shuffle, then run the real join on
  * the survivors. At 100 TB the win is shuffle volume: a selective dim
  * predicate means most fact rows have no match, and dropping them at the
  * scan (the filter is a per-row expression, so it rides whole-stage
  * codegen next to the parquet reader) means they are never hashed,
  * serialized, or spilled. Spark's own runtime row-level filtering does
  * this for equi-joins when statistics cooperate; this operator is the
  * explicit, statistics-independent form.
  *
  * Implementation is deliberately engine-native all the way down:
  *  - BUILD is a distributed aggregation — explode each key into its k
  *    bit positions, `bit_or` the per-word masks, collect only the ≤
  *    numBits/64 non-zero words (a 2^20-bit filter is 16 KiB — driver
  *    traffic is the filter size, never the key set).
  *  - PROBE is one fused codegen'd loop (graft.plans.BloomProbe) whose
  *    word array is a reference object in the generated code — no UDF,
  *    and the plan tree stays O(1) even for a 2^27-bit filter.
  *
  * False positives only (never false negatives), so the follow-up join
  * keeps the result exact; fpp ≈ (1 - e^(-k·n/m))^k as usual.
  */
object BloomPrune {

  /** Dense bloom bit words for the distinct values of `keyCol`.
    * numBits must be a power of two (the position mask is `h & (m-1)`).
    */
  def buildBits(keys: DataFrame, keyCol: Column, numBits: Int,
                numHashes: Int): Array[Long] = {
    require(numBits > 0 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two, got $numBits")
    val hashes = (0 until numHashes).map(i => xxhash64(lit(i), keyCol))
    val words = keys
      .select(explode(array(hashes: _*)).as("h"))
      .select(col("h").bitwiseAND(lit(numBits - 1L)).as("pos"))
      .select(shiftright(col("pos"), 6).as("word"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(63L)).cast("int")).as("mask"))
      .groupBy("word")
      .agg(bit_or(col("mask")).as("bits"))
      .collect()
    val dense = new Array[Long](numBits / 64)
    words.foreach(r => dense(r.getLong(0).toInt) = r.getLong(1))
    dense
  }

  /** Membership test for an integral key — one fused codegen loop
    * ([[graft.plans.BloomProbe]]) whose word array rides the generated
    * code as a reference object, so the PLAN stays O(1) no matter the
    * filter size (a 2^27-bit filter through the composed form below is a
    * 2M-element literal in the plan tree, k times over). Null keys test
    * false — an equi-join can't match them anyway.
    */
  def mightContain(bits: Array[Long], numHashes: Int, key: Column): Column =
    graft.plans.BloomProbe(key, bits, numHashes)

  /** The composed-Column membership test — k hash + element_at + bit-test
    * chains over `lit(bits)`. Probe-identical to [[mightContain]]
    * (parity-pinned in SkewBloomSpec); used for non-integral key types
    * and small filters, where the plan-embedded literal is harmless.
    * Null keys are null (filter-false), same survivors either way.
    */
  def mightContainComposed(bits: Array[Long], numHashes: Int,
                           key: Column): Column = {
    val m = bits.length.toLong * 64L
    val arr = lit(bits)
    (0 until numHashes).map { i =>
      val pos = xxhash64(lit(i), key).bitwiseAND(lit(m - 1L))
      val word = element_at(arr, shiftright(pos, 6).cast("int") + lit(1))
      word.bitwiseAND(call_function("shiftleft", lit(1L),
        pos.bitwiseAND(lit(63L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Exact left-semi join with bloom pre-pruning of the fact side.
    * Size m for the dim's expected distinct-key count: m ≈ 14·n bits
    * gives fpp ≈ 1e-3 at k=7; the default 2^20 covers ~75k keys.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, numBits: Int = 1 << 20,
               numHashes: Int = 7): DataFrame = {
    // xxhash64 hashes int and long inputs differently, so joinable keys of
    // different integral widths would make every probe a false negative —
    // violating the false-positives-only contract. Hash both sides through
    // a common type: widen integrals to long, otherwise demand equality.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    val (buildKey, probeKey) =
      if (ft == dt) (col(dimKey), col(factKey))
      else if (integral(ft) && integral(dt))
        (col(dimKey).cast("long"), col(factKey).cast("long"))
      else throw new IllegalArgumentException(
        s"bloom semiJoin key types differ and are not both integral: " +
          s"$factKey is $ft, $dimKey is $dt")
    val bits = buildBits(dim.select(buildKey.as(dimKey)), col(dimKey),
      numBits, numHashes)
    val probe =
      if (integral(ft)) mightContain(bits, numHashes, probeKey)
      else mightContainComposed(bits, numHashes, probeKey)
    fact.filter(probe)
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }
}
