package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations and joins (beyond the reference's
  * surface — the 100 TB curation workloads these operators serve are
  * dominated by power-law keys: a handful of languages/sources own most
  * of the corpus, so a plain `groupBy(key)` funnels the hot key's entire
  * partition through one reducer task).
  *
  * Spark's map-side partial aggregation already collapses per-partition
  * duplicates for algebraic aggregates, and AQE splits skewed JOIN
  * partitions — but neither helps a high-cardinality-payload aggregate
  * (collect_list, exact distinct counting) or a pre-AQE shuffle whose hot
  * key exceeds one task. Salting is the explicit fix: spread each key
  * over `salt` sub-keys, aggregate twice.
  *
  * Determinism: the salt is a hash of a caller-chosen row-identity
  * column, not `rand()` — reruns and retried tasks produce identical
  * partials, so results are stable under speculative execution.
  */
object Salting {

  /** Two-stage skew-safe aggregation: stage 1 aggregates on
    * (keys, salt(idCol) % salt) — hot keys spread over `salt` reducer
    * tasks; stage 2 (tiny: |keys| · salt rows) combines the partials.
    * Output: (keys..., n, total, avg) for `valueCol`, exactly equal to
    * the unsalted plan's result.
    */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: Column,
                  idCol: Column, salt: Int): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("_salt", pmod(xxhash64(idCol), lit(salt)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_sum"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum("_n").as("n"), sum("_sum").as("total"))
      .withColumn("avg", round(col("total") / col("n"), 6))
      .withColumn("total", round(col("total"), 2))
  }

  /** Skew-safe exact count-distinct: stage 1 dedups (keys, value) pairs
    * spread by a hash of the VALUE (duplicates of one value collide into
    * the same sub-key, so the dedup is exact); stage 2 counts survivors
    * per key. A hot key's distinct set is counted across `salt` tasks
    * instead of one.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String],
                          valueCol: Column): DataFrame = {
    val keyCols = keys.map(col)
    df.select(keyCols :+ valueCol.as("_v"): _*)
      .distinct() // shuffles on (keys, _v): hot keys spread by value hash
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_distinct"))
  }

  /** Skew-safe equi-join: each fact row picks one of `salt` sub-keys; the
    * (small) dim side is replicated `salt`-fold so every sub-key finds its
    * match. The shuffle key becomes (key, salt) — a hot key occupies
    * `salt` reducer tasks instead of one. Use when the dim side is too
    * big to broadcast but small enough to replicate; inner join only.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factId: Column, salt: Int): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(xxhash64(factId), lit(salt)))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-skew report — the measurement BEFORE choosing a salt factor
    * (this file's other operators are the cure; this is the
    * diagnosis): the top-k hottest keys with exact share bps and the
    * global skew factor `max·n_keys·1000 div total` (hot-key rows vs
    * a perfectly uniform key, in milli). One count aggregate, one
    * single-row stats broadcast, TakeOrdered top-k — the report never
    * funnels the key space through one task.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(sum("n").as("total"),
      count(lit(1)).as("n_keys"), max("n").as("max_n"))
    counts
      .orderBy(col("n").desc, col("key").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key").asc)).cast("long"))
      .crossJoin(broadcast(stats))
      .select(col("rank"), col("key"), col("n"),
        expr("n * 10000 div total").as("share_bps"),
        expr("max_n * n_keys * 1000 div total").as("skew_milli"))
  }
}
