package graft

import graft.operators.{BloomPrune, Salting}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: bloom semi join equals plain semi join") {
    val fact = (1L to 2000L).map(i => (i % 500, i)).toDF("k", "payload")
    val dim = (0L to 499L by 7L).toDF("dk") // 72 keys
    val got = BloomPrune.semiJoin(fact, dim, "k", "dk",
        numBits = 1 << 12, numHashes = 5)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = fact.join(dim, $"k" === $"dk", "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("pruning filter drops most non-matching rows pre-join") {
    val fact = (1L to 10000L).toDF("k")
    val dim = (1L to 50L).toDF("dk")
    val bits = BloomPrune.buildBits(dim.select($"dk"), $"dk",
      numBits = 1 << 14, numHashes = 7)
    val kept = fact.filter(BloomPrune.mightContain(bits, 7, $"k")).count()
    // 50 true keys; fpp at m=16384, n=50, k=7 is ~0 — allow a loose 2%.
    assert(kept >= 50 && kept < 250, s"bloom kept $kept of 10000")
  }

  test("mixed int/long key types still find every match") {
    // xxhash64 over IntegerType vs LongType differs; without the common
    // cast every probe is a false negative and the semi join returns 0.
    val fact = (1 to 2000).map(i => (i % 500, i)).toDF("k", "payload") // int
    val dim = (0L to 499L by 7L).toDF("dk") // long
    val got = BloomPrune.semiJoin(fact, dim, "k", "dk",
        numBits = 1 << 12, numHashes = 5)
      .select("k", "payload").collect().map(r => (r.getInt(0), r.getInt(1)))
      .toSet
    val want = fact.join(dim, $"k" === $"dk", "left_semi")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("non-integral mismatched key types are rejected up front") {
    val fact = Seq(("1", 1)).toDF("k", "payload")
    val dim = Seq(1L).toDF("dk")
    val e = intercept[IllegalArgumentException] {
      BloomPrune.semiJoin(fact, dim, "k", "dk")
    }
    assert(e.getMessage.contains("not both integral"))
  }

  test("membership expression stays codegen (no UDF in plan)") {
    val dim = (1L to 10L).toDF("dk")
    val bits = BloomPrune.buildBits(dim.select($"dk"), $"dk", 1 << 10, 5)
    val plan = (1L to 10L).toDF("k")
      .filter(BloomPrune.mightContain(bits, 5, $"k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"),
      s"expected pure-expression probe, got:\n$plan")
  }

  test("fused probe is decision-identical to the composed literal form") {
    val dim = (0L to 400L by 3L).toDF("dk")
    val bits = BloomPrune.buildBits(dim.select($"dk"), $"dk", 1 << 12, 7)
    val keys = (0L to 2000L).toDF("k")
    val fused = keys.filter(BloomPrune.mightContain(bits, 7, $"k"))
      .collect().map(_.getLong(0)).toSet
    val composed = keys.filter(BloomPrune.mightContainComposed(bits, 7, $"k"))
      .collect().map(_.getLong(0)).toSet
    assert(fused === composed)
    assert((0L to 400L by 3L).toSet.subsetOf(fused)) // no false negatives
    // int-typed keys take the hashInt path and must agree with a filter
    // BUILT from ints
    val dimI = (0 to 400 by 3).toDF("dk")
    val bitsI = BloomPrune.buildBits(dimI.select($"dk"), $"dk", 1 << 12, 7)
    val keysI = (0 to 2000).toDF("k")
    val fusedI = keysI.filter(BloomPrune.mightContain(bitsI, 7, $"k"))
      .collect().map(_.getInt(0)).toSet
    val composedI = keysI
      .filter(BloomPrune.mightContainComposed(bitsI, 7, $"k"))
      .collect().map(_.getInt(0)).toSet
    assert(fusedI === composedI)
    assert((0 to 400 by 3).toSet.subsetOf(fusedI))
  }

  test("a 2^26-bit filter keeps the plan tree small") {
    // 2^26 bits = 1M words = 8 MB: as a plan literal this was k copies of
    // a million-element array in every explain/transform; as a reference
    // object the plan string stays O(1).
    val dim = (1L to 5000L).toDF("dk")
    val bits = BloomPrune.buildBits(dim.select($"dk"), $"dk", 1 << 26, 7)
    assert(bits.length === (1 << 26) / 64)
    val probed = (1L to 20000L).toDF("k")
      .filter(BloomPrune.mightContain(bits, 7, $"k"))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.length < 100000,
      s"plan string blew up to ${plan.length} chars")
    val kept = probed.count()
    // 5000 true keys, fpp at m=2^26, n=5000, k=7 is ~0
    assert(kept >= 5000 && kept < 5100, s"kept $kept")
  }
}

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedStats equals the unsalted aggregate") {
    val df = Seq.tabulate(5000)(i =>
      (if (i % 100 == 0) "cold" else "hot", i.toLong, i * 1.5))
      .toDF("g", "id", "v")
    val got = Salting.saltedStats(df, Seq("g"), $"v", $"id", 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val want = df.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .withColumn("avg", round($"total" / $"n", 6))
      .withColumn("total", round($"total", 2))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got === want)
  }

  test("saltedCountDistinct equals plain count distinct") {
    val df = Seq.tabulate(3000)(i => ("g" + (i % 3), (i % 97).toLong))
      .toDF("g", "v")
    val got = Salting.saltedCountDistinct(df, Seq("g"), $"v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = df.groupBy("g").agg(countDistinct("v").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("saltedJoin equals plain inner join") {
    val fact = Seq.tabulate(2000)(i => ((i % 5).toLong, i.toLong))
      .toDF("k", "fid")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "label")
    val got = Salting.saltedJoin(fact, dim, "k", $"fid", 4)
      .select("k", "fid", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = fact.join(dim, "k").select("k", "fid", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === want)
  }

  test("salted shuffle key spreads a hot group over sub-keys") {
    val df = Seq.tabulate(1000)(i => ("hot", i.toLong, 1.0))
      .toDF("g", "id", "v")
    val partial = df
      .withColumn("_salt", pmod(xxhash64($"id"), lit(8)))
      .groupBy("g", "_salt").agg(count(lit(1)).as("n"))
    // all 8 sub-keys materialize for the single hot key
    assert(partial.count() === 8)
  }
}

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf: hand-computed weights on a 3-doc corpus") {
    val docs = Seq(
      (1L, "a b a"),   // tf(a)=2 tf(b)=1
      (2L, "a c"),
      (3L, "c c d")
    ).toDF("doc_id", "text")
    val got = graft.operators.Frequency.tfidf(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // a: df=2, b: df=1, c: df=2, d: df=1; N=3
    val ln32 = math.log(3.0 / 2.0)
    val ln3 = math.log(3.0)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, "a")) === ((2L, 2L, r6(2 * ln32))))
    assert(got((1L, "b")) === ((1L, 1L, r6(ln3))))
    assert(got((2L, "c")) === ((1L, 2L, r6(ln32))))
    assert(got((3L, "c")) === ((2L, 2L, r6(2 * ln32))))
    assert(got((3L, "d")) === ((1L, 1L, r6(ln3))))
    assert(got.size === 6)
  }
}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate word/trigram ratios, hand-computed") {
    val docs = Seq(
      (1L, "a b a b a b"), // words: 6 total 2 distinct; trigrams: 4 total 2 distinct
      (2L, "x y z"),       // no repetition: 3/3 words, 1/1 trigram
      (3L, "q r")          // shorter than a trigram -> ratio 0
    ).toDF("doc_id", "text")
    val staged = docs.select($"doc_id", split($"text", " ").as("toks"))
    val tri = graft.functions.TextFunctions.shinglesFromTokens($"toks", 3)
    val got = staged.select($"doc_id",
        round(lit(1.0) - size(array_distinct($"toks")).cast("double") /
          size($"toks"), 6).as("w"),
        when(size(tri) > 0, round(lit(1.0) -
          size(array_distinct(tri)).cast("double") / size(tri), 6))
          .otherwise(lit(0.0)).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got(1L) === ((0.666667, 0.5))) // round(1 - 2/6, 6), round(1 - 2/4, 6)
    assert(got(2L) === ((0.0, 0.0)))
    assert(got(3L) === ((0.0, 0.0)))
  }
}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx distinct and quantile stay inside their error bounds") {
    val df = Seq.tabulate(20000)(i => ("g" + (i % 4), (i % 3001).toLong,
      (i % 997).toDouble)).toDF("g", "k", "v")
    val rows = df.groupBy("g")
      .agg(countDistinct($"k").as("exact_d"),
        // rsd = 0.01: the bound below is 3 sigma (default rsd 0.05 gave a
        // perfectly in-spec 7.7% miss on one group)
        approx_count_distinct($"k", 0.01).as("approx_d"),
        expr("percentile(v, 0.5)").as("exact_med"),
        percentile_approx($"v", lit(0.5), lit(1000)).as("approx_med"))
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (ed, ad) = (r.getLong(1), r.getLong(2))
      assert(math.abs(ad - ed).toDouble / ed < 0.03,
        s"HLL rel err ${math.abs(ad - ed).toDouble / ed} for ${r.getString(0)}")
      val (em, am) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(am - em) / (em max 1.0) < 0.05,
        s"quantile err: exact $em approx $am")
    }
  }
}
