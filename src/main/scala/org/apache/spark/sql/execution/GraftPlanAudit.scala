package org.apache.spark.sql.execution

import java.util.{Collections, IdentityHashMap}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Plan-shape fingerprints taken from the EXECUTED plan tree, not its
  * string rendering.
  *
  * The previous fingerprint counted "Exchange" lines in
  * `executedPlan.toString` — which inflates arbitrarily whenever a cached
  * frame prints its nested subplan at every reference site (the r12
  * q17/q18 jump 52→87 with zero plan change), and under AQE renders the
  * PRE-adaptive plan anyway. This walker instead descends the final
  * adaptive physical plan:
  *
  *  - `AdaptiveSparkPlanExec` → its `finalPhysicalPlan` once executed
  *    (the re-planned tree the job actually ran), falling back to the
  *    current plan for an unexecuted frame;
  *  - query stages (leaf nodes under AQE) → their materialized plan;
  *  - `InMemoryTableScanExec` → the cached relation's plan, visited ONCE
  *    per relation (the cache materializes once per session, so its
  *    shuffles execute once no matter how many scans reference it);
  *  - `ReusedExchangeExec` → not descended (the reused exchange is
  *    counted at its defining site);
  *  - subquery plans (scalar/IN subqueries hang off expressions, not
  *    children) are walked too.
  *
  * Every node is visited at most once by identity, so reuse — stage
  * reuse, exchange reuse, shared cached plans — can never double-count.
  */
object GraftPlanAudit {

  /** Number of distinct shuffle exchanges in the final executed plan.
    * Call AFTER an action: on an executed frame this reads the cached
    * final adaptive plan (no re-execution); on an unexecuted one it
    * counts the statically planned tree.
    */
  def shuffleCount(df: DataFrame): Int = count(df)(_.isInstanceOf[ShuffleExchangeLike])

  /** Distinct physical nodes matching `p` in the final executed plan
    * (same traversal rules as [[shuffleCount]]).
    */
  def count(df: DataFrame)(p: SparkPlan => Boolean): Int =
    collectFinal(df)(pl => if (p(pl)) Some(()) else None).size

  /** Collect over the final executed plan tree with the adaptive /
    * stage / cache descent rules above. Returns one entry per DISTINCT
    * matching node (identity-deduped).
    */
  def collectFinal[T](df: DataFrame)(f: SparkPlan => Option[T]): Seq[T] = {
    val visited = Collections.newSetFromMap(
      new IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val seenCaches = Collections.newSetFromMap(
      new IdentityHashMap[AnyRef, java.lang.Boolean]())
    val out = Seq.newBuilder[T]
    def walk(plan: SparkPlan): Unit = {
      if (!visited.add(plan)) return
      f(plan).foreach(out += _)
      plan match {
        case a: AdaptiveSparkPlanExec =>
          // finalPhysicalPlan would EXECUTE stages on a fresh frame; only
          // take it once the adaptive loop has finished.
          walk(if (a.isFinalPlan) a.finalPhysicalPlan else a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: ReusedExchangeExec => ()
        case t: InMemoryTableScanExec =>
          // dedup on the CachedRDDBuilder, not the relation: every scan
          // of the same cache holds a COPY of the InMemoryRelation (new
          // attribute ids), but they all share the one builder that owns
          // the materialized RDD
          if (seenCaches.add(t.relation.cacheBuilder)) walk(t.relation.cachedPlan)
        case other => other.children.foreach(walk)
      }
      plan.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.result()
  }
}
