package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics: first-order Markov transition statistics over
  * per-user event sequences (beyond-reference operator, first-class per
  * the build brief) — the "what do users do next" matrix behind funnel
  * design and session modeling.
  *
  * Determinism: the sequence order is (ts, tieBreak) — a TOTAL order per
  * user, so the lead pairing is unique; counts are exact integers and
  * the row probability is ONE division rounded once (the q131
  * discipline), so the matrix is engine-exact.
  *
  * Scale shape: one user-keyed exchange serves the lead window; the
  * (from, to) aggregate is partial-aggregatable on an alphabet-sized
  * key space; row totals ride the same contracted frame (broadcast
  * join). Terminal events (a user's last) pair with the explicit 'end'
  * state so rows sum to each user's full journey.
  */
object Journey {

  /** One row per (from_state, to_state): transition count and the
    * row-normalized probability (round 6).
    */
  def transitions(events: DataFrame, userCol: String, stateCol: String,
                  tsCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreakCol))
    val pairs = events
      .select(col(userCol), col(stateCol).as("from_state"),
        col(tsCol), col(tieBreakCol))
      .withColumn("to_state",
        coalesce(lead(col("from_state"), 1).over(w), lit("end")))
    val counts = pairs.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_state")
      .agg(sum("n").as("row_total"))
    counts.join(broadcast(totals), "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        round(col("n").cast("double") / col("row_total").cast("double"), 6)
          .as("p"))
  }

  /** Top-k FULL journey prefixes ([[transitions]]' pairwise matrix
    * can't distinguish A→B→C from A→B→D beyond one hop): each user's
    * first `prefixLen` states in (ts, tieBreak) order joined with '>',
    * counted across users, top k by (count desc, path asc) with the
    * exact share in basis points — the Sankey/top-paths product
    * analytics staple.
    *
    * Deterministic: the per-user sequence is assembled by ONE
    * sort_array(collect_list(struct(ts, tie, state))) hash aggregate
    * (struct order = the total order — no window, no sort exchange),
    * and top-k is TakeOrdered under a total order. Scale: the path
    * aggregate is path-vocabulary-sized; user count rides a broadcast
    * single-row total (J5).
    */
  def topPaths(events: DataFrame, userCol: String, stateCol: String,
               tsCol: String, tieBreakCol: String,
               prefixLen: Int, k: Int): DataFrame = {
    require(prefixLen >= 1 && k >= 1, "prefixLen and k must be >= 1")
    val perUser = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol), col(tieBreakCol),
        col(stateCol).as("s")))).as("seq"))
      .select(concat_ws(">",
        transform(slice(col("seq"), 1, prefixLen), x => x.getField("s")))
        .as("path"))
    val totals = perUser.agg(count(lit(1)).as("n_users"))
    perUser.groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
      .crossJoin(broadcast(totals))
      .withColumn("share_bps", expr("n * 10000 div n_users"))
  }
}
