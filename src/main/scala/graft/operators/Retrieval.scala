package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion for hybrid retrieval (beyond the reference's surface —
  * the RAG-stack pattern: a lexical ranker and a vector ranker each
  * return a top-k list, and reciprocal-rank fusion combines them
  * without comparable scores).
  *
  * RRF (Cormack/Clarke/Buettcher, SIGIR'09): fused(d) =
  * Σ_lists 1/(k + rank_list(d)). Kept exact as MICRO-units via integer
  * division (`1000000 div (k + rank)`) — no float accumulation, so the
  * fused score and its ranking are bit-identical in any engine and any
  * fold order.
  *
  * Scale shape: each input list is already top-k (tiny relative to the
  * corpus); fusion is a union + one hash aggregate on the id, then a
  * TakeOrdered-style rank over the fused set. The expensive work
  * stays in the rankers, which are independently scale-audited
  * (q150's BM25, q24's cosine).
  */
object Retrieval {

  /** Fuse ranked lists, each with columns (`idCol`, `rankCol`; rank is
    * 1-based). Returns (`idCol`, n_lists, rrf_micro, rank) — rank over
    * the fused union, ties to the smaller id.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              kConst: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    require(kConst >= 1, s"kConst must be >= 1, got $kConst")
    val u = lists.map(_.select(col(idCol), col(rankCol).as("__r")))
      .reduce(_ unionByName _)
    u.groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"1000000 div (${kConst} + __r)")).as("rrf_micro"))
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("rrf_micro").desc, col(idCol).asc))
          .cast("long"))
  }
}
