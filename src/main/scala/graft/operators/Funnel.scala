package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis: for each user, the earliest
  * greedy completion of an ordered stage list — stage k's event must
  * strictly follow the chosen stage-(k-1) event, optionally within a
  * conversion window of the stage-0 event. The standard product-analytics
  * conversion primitive (signup -> activation -> purchase), and the one
  * query shape SQL engines cover with MATCH_RECOGNIZE, which Spark lacks;
  * this is the relational re-expression (beyond-reference operator,
  * first-class per the build brief).
  *
  * Greedy-earliest is the conventional funnel semantics: t0 = the user's
  * first stage-0 event; t_k = the first stage-k event after t_{k-1} (and
  * inside the window). Greedy matching maximizes completed stage count
  * for per-stage ORDERED events, so the reported drop-off is exact, not
  * an artifact of match choice.
  *
  * Scale shape: one conditional-min hash aggregate per stage, each keyed
  * on the user column — every join and groupBy in the chain shares the
  * SAME hash partitioning, so Catalyst plans ONE user exchange per stage
  * input (the filtered event slice) and reuses sort orders; no windows,
  * no per-user state beyond the k running timestamps. Stage frames carry
  * (user, t0..tk) — functionally dependent on user, grouped along to
  * stay in the aggregate.
  */
object Funnel {

  /** Earliest greedy completion of `stages` per user. Returns one row per
    * user with a stage-0 event: (user, t_0, ..., t_{n-1}, n_stages) where
    * t_k is null once the funnel stalls and n_stages counts non-null
    * stages. `windowExpr` (optional) bounds every later stage to
    * `ts <= t_0 + window` in the timestamp column's own units.
    */
  def earliestCompletion(events: DataFrame, userCol: String,
                         typeCol: String, tsCol: String,
                         stages: Seq[String],
                         window: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel: at least one stage")
    val u = col(userCol)
    def slice(stage: String): DataFrame =
      events.filter(col(typeCol) === stage)
        .select(u.as("user"), col(tsCol).cast("long").as("ts"))
    // `joined` walks the inner chain (only users still converting);
    // `out` left-joins each stage's time back onto the stage-0 frame so
    // stalled funnels keep their row with null later stages
    val f0 = slice(stages.head).groupBy(col("user"))
      .agg(min(col("ts")).as("t0"))
    var out = f0
    var joined = f0
    for (i <- 1 until stages.length) {
      val prevT = col(s"t${i - 1}")
      val inWindow: Column = window
        .map(w => col("ts") <= col("t0") + lit(w))
        .getOrElse(lit(true))
      val carried = (0 until i).map(j => col(s"t$j"))
      joined = slice(stages(i))
        .join(joined, "user")
        .filter(col("ts") > prevT && inWindow)
        .groupBy(col("user") +: carried: _*)
        .agg(min(col("ts")).as(s"t$i"))
      out = out.join(
        joined.select(col("user"), col(s"t$i")), Seq("user"), "left")
    }
    val nStages = (1 until stages.length)
      .map(i => when(col(s"t$i").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    out.withColumn("n_stages", nStages)
      .withColumnRenamed("user", userCol)
  }
}
