package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained text classification, exactly verifiable — multinomial Naive
  * Bayes with Laplace smoothing, the classical trained language-ID /
  * quality-routing model (the learned upgrade of q22's character-
  * heuristic langid).
  *
  * Training and scoring are BOTH engine-exact under the q147 micro-nat
  * discipline: every model parameter is one ln over an exact integer
  * rational — ln((cnt_{c,t}+1)/(n_c+V)) for seen tokens,
  * ln(1/(n_c+V)) for unseen, ln(docs_c/docs) for the prior — rounded
  * ONCE to micro-nats; a document's class score is then an exact LONG
  * sum (prior + Σ tf·ℓ) under any partitioning, and the argmax
  * (score desc, class asc) cannot differ between engines. No float
  * ever crosses an aggregate.
  *
  * Scale shape: one token explode over the train split builds the
  * (class, token) table (vocab×classes-sized); the test side explodes
  * once, crosses the CLASS list (a handful of rows, broadcast), left
  * joins the parameter table on (token, class), and aggregates per
  * (doc, class) — the per-doc argmax window partitions by doc. The
  * model never leaves the cluster; there is no driver loop.
  */
object Classifier {

  /** Train on `train`, score `test`; returns one row per test doc:
    * (idCol, classCol (truth), pred, score_micro, correct).
    */
  def naiveBayes(train: DataFrame, test: DataFrame, idCol: String,
                 textCol: String, classCol: String): DataFrame = {
    def micro(c: org.apache.spark.sql.Column) =
      round(log(c) * 1e6, 0).cast("long")
    val tok = graft.CacheScope.track(train
      .select(col(classCol).as("c"),
        explode(split(col(textCol), " ")).as("t"))
      .groupBy("c", "t").agg(count(lit(1)).as("cnt"))
      .persist()) // class totals, vocab, and the parameter table
    val nC = tok.groupBy("c").agg(sum("cnt").as("n_c"))
    val vocab = tok.agg(countDistinct("t").as("v"))
    val classes = graft.CacheScope.track(train
      .groupBy(col(classCol).as("c")).agg(count(lit(1)).as("docs_c"))
      .join(nC, "c").crossJoin(broadcast(vocab))
      .crossJoin(broadcast(
        train.agg(count(lit(1)).as("docs"))))
      .select(col("c"),
        micro(col("docs_c") / col("docs")).as("prior_micro"),
        micro(lit(1) / (col("n_c") + col("v"))).as("l0_micro"),
        col("n_c"), col("v"))
      .persist()) // broadcast into both the seen table and the test side
    val seen = tok.join(classes, "c")
      .select(col("t"), col("c"),
        micro((col("cnt") + 1) / (col("n_c") + col("v"))).as("l_micro"))
    val testTok = test
      .select(col(idCol).as("id"), col(classCol).as("truth"),
        explode(split(col(textCol), " ")).as("t"))
      .groupBy("id", "truth", "t").agg(count(lit(1)).as("tf"))
    val scored = testTok
      .crossJoin(broadcast(classes.select(col("c"), col("prior_micro"),
        col("l0_micro"))))
      .join(seen, Seq("t", "c"), "left")
      .groupBy("id", "truth", "c")
      .agg((max(col("prior_micro")) +
        sum(col("tf") * coalesce(col("l_micro"), col("l0_micro"))))
        .as("score_micro"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy("id")
        .orderBy(col("score_micro").desc, col("c"))))
      .filter(col("rk") === 1)
      .select(col("id").as(idCol), col("truth").as(classCol),
        col("c").as("pred"), col("score_micro"),
        (col("c") === col("truth")).as("correct"))
  }

  /** Per-class evaluation of a (truth, pred) frame — exact integer
    * confusion counts and basis-point precision/recall/F1 (one integer
    * division each, the repo's ratio discipline; a class with zero
    * predicted or zero actual rows nulls the undefined ratio instead of
    * dividing by zero — DuckDB ERRORS on integer // 0, Spark nulls, so
    * the CASE is structural, not cosmetic). Classes = everything seen
    * as truth OR prediction (full outer on the class key). Three
    * class-keyed aggregates over the prediction frame; nothing scans
    * the corpus again.
    */
  def evaluatePerClass(pred: DataFrame, truthCol: String,
                       predCol: String): DataFrame = {
    val t = col(truthCol)
    val p = col(predCol)
    // persisted: the truth-keyed and pred-keyed aggregates are two
    // consumers — unpersisted, the caller's whole scoring pipeline
    // (q246: the full NB train+score) runs twice
    val cached = graft.CacheScope.track(pred
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val byTruth = cached.groupBy(t.as("class"))
      .agg(sum(when(p === t, 1L).otherwise(0L)).as("tp"),
        sum(when(p =!= t, 1L).otherwise(0L)).as("fn"))
    val byPred = cached.groupBy(p.as("class"))
      .agg(sum(when(p =!= t, 1L).otherwise(0L)).as("fp"))
    byTruth.join(byPred, Seq("class"), "full_outer")
      .select(col("class"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
      .withColumn("precision_bps",
        when(col("tp") + col("fp") > 0,
          expr("tp * 10000 div (tp + fp)")))
      .withColumn("recall_bps",
        when(col("tp") + col("fn") > 0,
          expr("tp * 10000 div (tp + fn)")))
      .withColumn("f1_bps",
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          expr("2 * tp * 10000 div (2 * tp + fp + fn)")))
  }
}
