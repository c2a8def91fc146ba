package graft

import graft.operators.EditDistance
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(strings: Seq[String]): Set[(String, String, Long)] =
    EditDistance.fuzzyPairs(strings.toDF("s"), "s")
      .as[(String, String, Long)].collect().toSet

  private def brute(strings: Seq[String]): Set[(String, String, Long)] = {
    val u = strings.distinct
    (for {
      a <- u; b <- u if a < b
      d = levDist(a, b) if d <= 1
    } yield (a, b, d.toLong)).toSet
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("all three edit classes are found; distance-2 lookalikes are not") {
    val fixture = Seq(
      "spark", "spurk",      // substitution at pos 2
      "sprk",                // deletion of 'a'
      "sparkk",              // insertion
      "ab", "ba",            // dist 2, but deletion sets intersect
      "query", "quer", "qxery",
      "solo")                // no neighbor
    val got = pairsOf(fixture)
    val want = brute(fixture)
    assert(got === want)
    // the candidate-killer cases, explicitly:
    assert(got.contains(("spark", "spurk", 1L)))
    assert(got.contains(("spark", "sprk", 1L)))
    assert(got.contains(("spark", "sparkk", 1L)))
    assert(!got.exists(p => p._1 == "ab" && p._2 == "ba"),
      "ab/ba share deletion variants but are at distance 2")
    assert(!got.exists(p => p._1 == "solo" || p._2 == "solo"))
  }

  test("deletion-neighborhood join = brute force on a pseudo-random pool") {
    // deterministic generator (no Random: reproducible fixture), string
    // lengths 1..8 over a 4-letter alphabet so near-collisions are dense
    val pool = (0 until 400).map { i =>
      val h = i * 2654435761L
      val len = 1 + (h % 8).toInt.abs
      (0 until len).map(k => ('a' + ((h >> (4 * k)) & 3)).toChar).mkString
    }
    assert(pairsOf(pool) === brute(pool))
  }

  test("duplicates and empty strings: vocabulary is distinct, empty joins to 1-char") {
    val got = pairsOf(Seq("", "a", "a", "b", ""))
    assert(got === Set(("", "a", 1L), ("", "b", 1L), ("a", "b", 1L)))
  }
}
