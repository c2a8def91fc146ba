package graft

import graft.plans.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("parity with DuckDB jaro_winkler_similarity on probed values") {
    // Every expected value below was probed against duckdb 1.0.0
    // (the verify oracle engine) — see plans/JaroWinkler.scala scaladoc.
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DwAyNE", "DuANE", 0.8400000000000001), // case-sensitive
      ("crate", "trace", 0.7333333333333334),
      ("hello", "hello world of text", 0.8526315789473684),
      // boost threshold: jaro = 0.6 <= 0.7 => NO prefix boost
      ("abcdxxxxxx", "abcdyyyyyy", 0.6),
      ("abcdefxxxxxxxxxx", "abcdefyyyyyyyyyy", 0.5833333333333334),
      // odd transposition count halves with INTEGER division
      ("abcdef", "bcadef", 0.9444444444444445),
      ("aabbcc", "bbaacc", 0.8888888888888888),
      ("aaaaaaaaab", "aaaaaaaaba", 0.98),
      // window 0 at len 2: only same-position chars can match
      ("ab", "ba", 0.0),
      ("abab", "baba", 0.8333333333333334),
      // DuckDB returns 0.0 for ANY empty side, even both empty
      ("", "", 0.0),
      ("", "abc", 0.0),
      ("abc", "", 0.0),
      ("a", "a", 1.0),
      ("abc", "abc", 1.0))
    for ((a, b, want) <- cases) {
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
      assert(math.abs(jw(b, a) - want) < 1e-12, s"jw($b, $a) symmetric")
    }
  }

  test("random-string invariants: symmetry, bounds, identity") {
    // small alphabet + short lengths stress the match-window and
    // transposition logic where hand-picked cases have gaps
    val rnd = new scala.util.Random(42)
    def rs(): String =
      (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString
    for (_ <- 1 to 5000) {
      val (a, b) = (rs(), rs())
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"bounds: jw($a, $b) = $s")
      assert(s === jw(b, a), s"symmetry: $a / $b")
      if (a.nonEmpty) assert(jw(a, a) === 1.0, s"identity: $a")
    }
  }

  test("null propagation and codegen/interpreted agreement") {
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_name"),
        JaroWinkler(col("p_name"), lit("small ring")).as("s1"),
        JaroWinkler(lit(null).cast("string"), col("p_name")).as("s2"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = jw(r.getString(0), "small ring")
      assert(math.abs(r.getDouble(1) - expected) < 1e-15)
      assert(r.isNullAt(2))
    }
  }

  test("stays inside whole-stage codegen") {
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .select(JaroWinkler(col("p_name"), lit("small ring")).as("s"))
      .filter(col("s") > 0.5)
    // collect() so this frame's execution finalizes; codegen membership
    // prints as the "*(n)" stage prefix (HaversineSpec convention)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) (Project|Filter) \[?jaro_winkler""".r
      .findFirstIn(plan).isDefined, s"no codegen'd jaro_winkler in:\n$plan")
  }

  test("blocked pair join finds the variant tier and respects threshold") {
    val pairs = graft.operators.EditDistance.jaroWinklerPairs(
      Tables.part(spark, "/root/testdata/sf0.001"), "p_name", 0.84)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b, s) = (r.getString(0), r.getString(1), r.getDouble(2))
      assert(a < b)
      assert(a.split(" ").head === b.split(" ").head, "blocked pairs only")
      assert(s >= 0.84 && s <= 1.0)
      assert(math.abs(s - BigDecimal(jw(a, b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }
}
