package graft.queries

import graft.{CacheScope, Graft, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Dedup, HomeWork, Intervals, Multimodal, Similarity, StopClusters, StopDetect}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Shared._

/** Graph analytics: CC, PageRank, k-core, triangles,
  * BFS/SSSP, link prediction, modularity, BOM rollup.
  *
  * One registry slice of [[graft.SparkEntry]] (split per r9 verdict ask
  * #3): `defs` are the Spark-side query definitions, `oracles` the
  * DuckDB twins, merged back into the single driver-contract maps by
  * SparkEntry. Entry semantics, names and column contracts are the
  * SparkEntry originals, moved verbatim.
  */
private[graft] object GraphQueries extends QuerySlice {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank over the order-part co-occurrence graph (keys contracted
    // mod 997 into a ~2k-node bipartite graph): 10 fixed power-method
    // rounds, damping 0.85, one shuffle per round with lineage-truncated
    // ranks (Graphs.pageRank). Oracle = the identical iteration unrolled
    // as 10 chained CTEs in DuckDB; ranks rounded to 6 so IEEE
    // summation-order drift (~1e-15 over the run) cannot flip the hash.
    "q109_pagerank" -> ((s, d) => {
      val e = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 997).as("src"),
          (lit(1000L) + col("l_partkey") % 997).as("dst"))
      graft.operators.Graphs.pageRank(e, "src", "dst", iterations = 10)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    }),

    // Per-node triangle counts (Graphs.triangleCounts, degree-oriented
    // wedge join) over the thinned co-purchase graph: parts sharing an
    // order. The quantity filter keeps basket fan-out (and thus edge
    // density) realistic; the oracle enumerates the same triangle set by
    // plain id order — orientation only changes WHERE each triangle is
    // counted, never the set.
    "q121_triangles" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") <= 10)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("ok"), col("l_partkey").as("pb"))
      val pairs = a.join(b, "ok").filter(col("pa") < col("pb"))
      graft.operators.Graphs.triangleCounts(pairs, "pa", "pb")
    }),

    // Multi-source BFS (Graphs.bfsDistances): min hop distance from the
    // seed parts over the same co-purchase graph, capped at 4 hops. The
    // oracle unrolls the four frontier expansions as chained CTEs and
    // takes min(level) per node.
    "q122_bfs" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") <= 10)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("ok"), col("l_partkey").as("pb"))
      val pairs = a.join(b, "ok").filter(col("pa") < col("pb"))
      val seeds = Tables.lineitem(s, d)
        .filter(col("l_partkey") < 3).select("l_partkey")
      graft.operators.Graphs.bfsDistances(pairs, "pa", "pb",
        seeds, "l_partkey", maxHops = 4)
    }),

    // k-core (Graphs.kCore): the 4-core of the co-purchase graph with
    // in-core degrees. Peeling's fixpoint is deletion-order-independent,
    // so the driver queue peel, the distributed round peel, and the
    // oracle's unrolled rounds (48 >> the ~36 needed; extra rounds are
    // identity) agree exactly.
    "q128_kcore" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") <= 10)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("ok"), col("l_partkey").as("pb"))
      val pairs = a.join(b, "ok").filter(col("pa") < col("pb"))
      graft.operators.Graphs.kCore(pairs, "pa", "pb", k = 4)
    }),

    // Bounded-hop weighted shortest paths (Graphs.weightedHopDistances,
    // synchronous Bellman-Ford rounds): cheapest route from the seed
    // parts within 4 edges over the co-purchase graph, edge weight =
    // the deterministic integer 1 + (u + 2v) mod 7. Integer weights
    // keep every distance exact; the oracle unrolls the identical
    // relaxation rounds.
    "q129_sssp" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") <= 10)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("ok"), col("l_partkey").as("pb"))
      val pairs = a.join(b, "ok").filter(col("pa") < col("pb"))
        .withColumn("w", lit(1L) + pmod(col("pa") + lit(2L) * col("pb"),
          lit(7L)))
      val seeds = Tables.lineitem(s, d)
        .filter(col("l_partkey") < 3).select("l_partkey")
      graft.operators.Graphs.weightedHopDistances(pairs, "pa", "pb", "w",
        seeds, "l_partkey", maxHops = 4)
    }),

    // Common-neighbors link prediction over the q121 co-purchase graph
    // (Graphs.commonNeighborCandidates): non-adjacent part pairs sharing
    // >= 2 co-purchase neighbors, with integer degrees for downstream
    // Jaccard / preferential-attachment scoring.
    "q157_link_prediction" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") <= 10)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("ok"), col("l_partkey").as("pb"))
      val pairs = a.join(b, "ok").filter(col("pa") < col("pb"))
      graft.operators.Graphs.commonNeighborCandidates(
        pairs, "pa", "pb", minCommon = 2)
    }),

    // Bill-of-materials rollup (Graphs.bomExtend): bounded-depth
    // ancestor closure with per-path quantity products summed across
    // paths. Synthetic DAG over parts: p -> p div 10 (qty 1 + p%4)
    // plus a second parent p div 10 + 1 (qty 2) for p%3==0 — the
    // diamond edges keep the multi-path sum arm (n_paths > 1) live.
    "q191_bom_rollup" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey").as("pk"))
        .filter(col("pk") >= 10)
      val e1 = p.select(col("pk").as("child"),
        expr("pk div 10").as("parent"),
        (pmod(col("pk"), lit(4L)) + 1).as("qty"))
      val e2 = p.filter(pmod(col("pk"), lit(3L)) === 0)
        .select(col("pk").as("child"),
          (expr("pk div 10") + 1).as("parent"), lit(2L).as("qty"))
      graft.operators.Graphs.bomExtend(
        e1.unionAll(e2), "child", "parent", "qty", maxDepth = 4)
    }),

    // Top journey paths (Journey.topPaths): each user's first-4 event
    // prefix counted corpus-wide, top 10 with exact share bps — the
    // Sankey query q152's pairwise matrix cannot answer. One
    // sort_array(collect_list) hash aggregate per user (no window),
    // path-vocabulary-sized count, TakeOrdered top-k.
    "q197_top_paths" -> ((s, d) =>
      graft.operators.Journey.topPaths(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id",
        prefixLen = 4, k = 10)),

    // Partition-quality certificate (Graphs.modularity): Newman
    // modularity per community over the sparse (quantity <= 2)
    // co-purchase graph, communities = connected components — every
    // contribution an exact rational in DECIMAL(38,0), floor'd to
    // micro for presentation. The auditable objective behind the
    // q37/q82 community operators.
    "q219_modularity" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") <= 2)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("ok"), col("l_partkey").as("pb"))
      val pairs = a.join(b, "ok").filter(col("pa") < col("pb"))
      val nodes = li.select(col("l_partkey").as("id")).distinct()
      val labels = graft.operators.Graphs.connectedComponents(
        pairs, "pa", "pb", nodes, "id")
      graft.operators.Graphs.modularity(pairs, "pa", "pb",
        labels, "id", "component")
    }),

    // Degree-distribution profile (Graphs.degreeProfile): log2 buckets
    // computed EXACTLY via binary-string length (an FP log2 rounds on
    // the boundary at every power of two), share in bps — the graph
    // health report over the co-purchase graph.
    "q220_degree_profile" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_quantity") <= 10)
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.select(col("ok"), col("l_partkey").as("pa"))
      val b = li.select(col("ok"), col("l_partkey").as("pb"))
      graft.operators.Graphs.degreeProfile(
        a.join(b, "ok").filter(col("pa") < col("pb")), "pa", "pb")
    }),
  )

  val oracles: Map[String, String] = Map(

    "q109_pagerank" -> sqlQ109PageRank,

    // Naive id-ordered triangle enumeration over the same co-purchase
    // edge set: each triangle (a < b < c) found exactly once, so the
    // per-node counts equal the degree-oriented form's.
    "q121_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_quantity <= 10),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |    greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM und e1 JOIN und e2 ON e2.u = e1.v
        |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nodes AS (
        |  SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM nodes GROUP BY id""".stripMargin,

    // Four frontier expansions unrolled as chained CTEs; min(level) per
    // node = BFS distance (level k holds ALL nodes at distance exactly k,
    // possibly plus closer ones — the min collapses them).
    "q122_bfs" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_quantity <= 10),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |    greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey),
        |sym AS MATERIALIZED (
        |  SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |s0 AS (SELECT DISTINCT l_partkey AS id FROM lineitem
        |       WHERE l_partkey < 3),
        |s1 AS (SELECT DISTINCT e.v AS id FROM sym e JOIN s0 ON e.u = s0.id),
        |s2 AS (SELECT DISTINCT e.v AS id FROM sym e JOIN s1 ON e.u = s1.id),
        |s3 AS (SELECT DISTINCT e.v AS id FROM sym e JOIN s2 ON e.u = s2.id),
        |s4 AS (SELECT DISTINCT e.v AS id FROM sym e JOIN s3 ON e.u = s3.id),
        |lv AS (
        |  SELECT id, 0 AS d FROM s0 UNION ALL SELECT id, 1 FROM s1
        |  UNION ALL SELECT id, 2 FROM s2 UNION ALL SELECT id, 3 FROM s3
        |  UNION ALL SELECT id, 4 FROM s4)
        |SELECT id, CAST(min(d) AS BIGINT) AS dist FROM lv GROUP BY id""".stripMargin,

    "q128_kcore" -> sqlQ128KCore,

    // Four relaxation rounds unrolled; each round = previous distances
    // union one-edge extensions, min per node. Integer weights, exact.
    "q129_sssp" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_quantity <= 10),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |    greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey),
        |sym AS MATERIALIZED (
        |  SELECT u, v, 1 + (u + 2 * v) % 7 AS w FROM und
        |  UNION ALL SELECT v, u, 1 + (u + 2 * v) % 7 FROM und),
        |d0 AS MATERIALIZED (
        |  SELECT DISTINCT l_partkey AS id, CAST(0 AS BIGINT) AS dist
        |  FROM lineitem WHERE l_partkey < 3),
        |d1 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
        |  SELECT id, dist FROM d0 UNION ALL
        |  SELECT e.v, d.dist + e.w FROM sym e JOIN d0 d ON d.id = e.u)
        |  GROUP BY id),
        |d2 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
        |  SELECT id, dist FROM d1 UNION ALL
        |  SELECT e.v, d.dist + e.w FROM sym e JOIN d1 d ON d.id = e.u)
        |  GROUP BY id),
        |d3 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
        |  SELECT id, dist FROM d2 UNION ALL
        |  SELECT e.v, d.dist + e.w FROM sym e JOIN d2 d ON d.id = e.u)
        |  GROUP BY id),
        |d4 AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
        |  SELECT id, dist FROM d3 UNION ALL
        |  SELECT e.v, d.dist + e.w FROM sym e JOIN d3 d ON d.id = e.u)
        |  GROUP BY id)
        |SELECT id, dist FROM d4""".stripMargin,

    // Naive wedge enumeration over the same deduped co-purchase graph;
    // NOT EXISTS is the anti-join (no nulls in the edge list).
    "q157_link_prediction" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ok, l_partkey FROM lineitem
        |  WHERE l_quantity <= 10),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |    greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.ok = b.ok
        |  WHERE a.l_partkey < b.l_partkey),
        |sym AS MATERIALIZED (
        |  SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS MATERIALIZED (
        |  SELECT u AS id, count(*) AS d FROM sym GROUP BY u),
        |cand AS MATERIALIZED (
        |  SELECT n1.v AS a, n2.v AS b, count(*) AS common
        |  FROM sym n1 JOIN sym n2 ON n1.u = n2.u AND n1.v < n2.v
        |  GROUP BY n1.v, n2.v
        |  HAVING count(*) >= 2)
        |SELECT c.a AS u, c.b AS v, c.common,
        |  da.d AS deg_u, db.d AS deg_v
        |FROM cand c
        |JOIN deg da ON da.id = c.a
        |JOIN deg db ON db.id = c.b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM und e WHERE e.u = c.a AND e.v = c.b)""".stripMargin,

    // Four unrolled depth CTEs (tree walk with the diamond edges), sum
    // of per-path products, min depth, path count.
    "q191_bom_rollup" ->
      """WITH e AS (
        |  SELECT p_partkey AS child, p_partkey // 10 AS parent,
        |    p_partkey % 4 + 1 AS q
        |  FROM part WHERE p_partkey >= 10
        |  UNION ALL
        |  SELECT p_partkey, p_partkey // 10 + 1, 2
        |  FROM part WHERE p_partkey >= 10 AND p_partkey % 3 = 0),
        |d1 AS (SELECT parent AS anc, child AS dsc, 1 AS depth, q AS ext
        |       FROM e),
        |d2 AS (SELECT e.parent AS anc, d1.dsc, 2 AS depth,
        |         d1.ext * e.q AS ext
        |       FROM d1 JOIN e ON d1.anc = e.child),
        |d3 AS (SELECT e.parent AS anc, d2.dsc, 3 AS depth,
        |         d2.ext * e.q AS ext
        |       FROM d2 JOIN e ON d2.anc = e.child),
        |d4 AS (SELECT e.parent AS anc, d3.dsc, 4 AS depth,
        |         d3.ext * e.q AS ext
        |       FROM d3 JOIN e ON d3.anc = e.child),
        |u AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2
        |      UNION ALL SELECT * FROM d3 UNION ALL SELECT * FROM d4)
        |SELECT anc AS ancestor, dsc AS descendant,
        |  CAST(sum(ext) AS BIGINT) AS ext_qty,
        |  CAST(min(depth) AS BIGINT) AS min_depth,
        |  count(*) AS n_paths
        |FROM u GROUP BY 1, 2""".stripMargin,

    // The identical first-4 prefix assembly (string_agg under the same
    // total order), count, and deterministic top-10.
    "q197_top_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 4 GROUP BY user_id),
        |tot AS (SELECT count(*) AS n_users FROM p),
        |c AS (SELECT path, count(*) AS n FROM p GROUP BY 1)
        |SELECT path, n, tot.n_users, n * 10000 // tot.n_users AS share_bps
        |FROM c, tot
        |ORDER BY n DESC, path ASC LIMIT 10""".stripMargin,

    // Recursive component closure (bounded: the qty<=2 graph's largest
    // component is 11 nodes), then the identical exact modularity
    // arithmetic in HUGEINT.
    "q219_modularity" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_quantity <= 2),
        |und AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |    greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |e AS (SELECT u AS s, v AS d FROM und
        |      UNION SELECT v, u FROM und),
        |nodes AS (SELECT DISTINCT s AS id FROM e),
        |reach AS (
        |  SELECT id, id AS r FROM nodes
        |  UNION
        |  SELECT e.d, reach.r FROM e JOIN reach ON e.s = reach.id),
        |comp AS (SELECT id, min(r) AS community FROM reach GROUP BY 1),
        |mm AS (SELECT count(*) AS m FROM und),
        |ein AS (
        |  SELECT ca.community, count(*) AS e_in
        |  FROM und JOIN comp ca ON ca.id = und.u
        |  JOIN comp cb ON cb.id = und.v
        |  WHERE ca.community = cb.community GROUP BY 1),
        |deg AS (SELECT id, count(*) AS deg FROM (
        |          SELECT u AS id FROM und
        |          UNION ALL SELECT v FROM und) GROUP BY 1),
        |agg AS (
        |  SELECT c.community, count(*) AS n_nodes,
        |    CAST(sum(d.deg) AS BIGINT) AS d_sum
        |  FROM deg d JOIN comp c ON c.id = d.id GROUP BY 1)
        |SELECT a.community, a.n_nodes,
        |  CAST(coalesce(e.e_in, 0) AS BIGINT) AS e_in, a.d_sum,
        |  a.d_sum - 2 * coalesce(e.e_in, 0) AS cut,
        |  CAST(mm.m AS BIGINT) AS m,
        |  CAST((4 * CAST(mm.m AS HUGEINT) * coalesce(e.e_in, 0)
        |      - CAST(a.d_sum AS HUGEINT) * a.d_sum) * 1000000
        |    // (4 * CAST(mm.m AS HUGEINT) * mm.m) AS BIGINT) AS q_micro
        |FROM agg a LEFT JOIN ein e USING (community), mm""".stripMargin,

    // The identical dedup/degree aggregates and the bin-length bucket.
    "q220_degree_profile" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_quantity <= 10),
        |und AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |    greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |deg AS (SELECT id, count(*) AS deg FROM (
        |          SELECT u AS id FROM und
        |          UNION ALL SELECT v FROM und) GROUP BY 1),
        |tot AS (SELECT count(*) AS n_nodes_total FROM deg)
        |SELECT CAST(len(bin(deg)) - 1 AS BIGINT) AS bucket,
        |  count(*) AS n_nodes, min(deg) AS deg_min, max(deg) AS deg_max,
        |  CAST(tot.n_nodes_total AS BIGINT) AS n_nodes_total,
        |  count(*) * 10000 // tot.n_nodes_total AS share_bps
        |FROM deg, tot GROUP BY 1, tot.n_nodes_total""".stripMargin,
  )
}
