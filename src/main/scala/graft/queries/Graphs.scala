package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._

/** Graph-analytics family over the order/lineitem-derived graphs:
  * centrality (PageRank flavors, HITS, betweenness, harmonic,
  * eccentricity), cohesion (triangles, k-core, k-truss, clustering
  * coefficient, modularity), traversal (k-hop BFS, weighted paths,
  * random walks, MST), and link prediction. Split from [[Relational]]
  * (round 8) purely mechanically — query names, semantics, and oracles
  * unchanged.
  */
object Graphs extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Personalized PageRank: teleport restarts at seed customers
    // (custkey % 100 = 0) over the SYMMETRIZED purchase graph — the
    // bipartite recommendation walk (seed → their suppliers → those
    // suppliers' other customers). Same exact integer recurrence as
    // q63; output is the seeds' 3-hop neighborhood, not the graph.
    "q323_personalized_pagerank" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cs = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      val edges = cs.unionAll(cs.select(col("dst").as("src"),
        col("src").as("dst")))
      val seeds = t.customer.filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey").as("node"))
      graft.ops.PageRank.personalizedPageRank(edges, "src", "dst", seeds)
    }),


    // Bounded-horizon eccentricities from the q340 seed sample — the
    // diameter-lower-bound readout; n_reached shows where the 4-hop
    // horizon truncates (ecc exact iff the component fits).
    "q349_eccentricity" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cs = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      val seeds = t.customer.filter(col("c_custkey") % 200 === 1)
        .select(col("c_custkey").as("node"))
      graft.ops.Bfs.eccentricity(cs, "src", "dst", seeds, hops = 4)
    }),


    // Harmonic centrality from the q340 seed sample: Σ 1/d in integer
    // micros over per-seed 3-hop distances — the closeness variant
    // that survives disconnection (unreachable contributes 0, not ∞).
    "q345_harmonic" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cs = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      val seeds = t.customer.filter(col("c_custkey") % 200 === 1)
        .select(col("c_custkey").as("node"))
      graft.ops.Bfs.harmonicCentrality(cs, "src", "dst", seeds, hops = 3)
    }),


    // Seeded betweenness (Brandes dependency accumulation from the
    // q323 seed sample, 3-hop horizon): the broker/bottleneck score —
    // transit, not endpoint prominence. Integer-micro delta terms so
    // the whole backward sweep hash-matches the oracle's replay.
    "q340_betweenness" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cs = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      val seeds = t.customer.filter(col("c_custkey") % 200 === 1)
        .select(col("c_custkey").as("node"))
      graft.ops.Betweenness.fromSeeds(cs, "src", "dst", seeds, hops = 3)
    }),


    // Trade-backbone MAXIMUM spanning tree over the nation graph
    // (Borůvka on negated volume): the n−1 strongest trade links that
    // still connect every nation — the correlation-network backbone
    // readout. Unique under the (w, a, b) total order, so the whole
    // iterative construction hash-matches the oracle's Kruskal replay.
    "q332_trade_mst" -> ((s, dir) => {
      val t = Tables(s, dir)
      val vol = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
        .select(
          least(col("c_nationkey"), col("s_nationkey")).as("na"),
          greatest(col("c_nationkey"), col("s_nationkey")).as("nb"),
          Exact.cents(col("l_extendedprice")).as("cents"))
        .filter(col("na") =!= col("nb"))
        .groupBy(col("na"), col("nb")).agg(sum(col("cents")).as("vol"))
      graft.ops.Mst.boruvka(
        vol.select(col("na").as("src"), col("nb").as("dst"),
          (-col("vol")).as("w")),
        "src", "dst", "w")
        .select(col("a"), col("b"), (-col("w")).as("volume_cents"))
    }),


    // DeepWalk corpus over the undirected purchase graph: 2 walks of 4
    // steps from every node, each step chosen by the portable hash over
    // the walk identity — the node-sequence sentences graph-embedding
    // trainers consume, reproducible across runs/partitionings/engines
    // (the oracle replays every step).
    "q330_random_walks" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cs = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      val edges = cs.unionAll(cs.select(col("dst").as("src"),
        col("src").as("dst")))
      graft.ops.Walks.deterministicWalks(edges, "src", "dst",
        walksPerNode = 2, steps = 4, salt = "walk-v1")
    }),


    // PageRank in exact integer arithmetic over the customer→supplier
    // purchase graph — deterministic across partitionings and engines,
    // so the whole iterative computation hash-matches the oracle.
    "q63_pagerank" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      graft.ops.PageRank.pageRank(edges, "src", "dst")
    }),


    // HITS hubs & authorities over the same customer-supplier graph:
    // hubs = customers whose orders concentrate on well-endorsed
    // suppliers, authorities = those suppliers — the curator/content
    // split PageRank's single score conflates. Integer max-normalized
    // recurrence, so the 2-round fixpoint approximation hash-matches.
    "q151_hits" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      graft.ops.PageRank.hits(edges, "src", "dst")
    }),


    // Degree assortativity of the same graph: do high-degree customers
    // concentrate on high-degree suppliers? One exact-integer Pearson
    // over endpoint degrees — the topology summary that decides whether
    // curation should cap hubs or sample the core.
    "q161_assortativity" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      graft.ops.PageRank.degreeAssortativity(edges, "src", "dst")
    }),


    // Synchronous label propagation over the same customer-supplier
    // graph: majority-vote communities (reachability-blind, unlike q37's
    // CC), deterministic via the total (count desc, label asc) tie-break.
    "q104_label_prop" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      graft.ops.PageRank.labelPropagation(edges, "src", "dst")
    }),


    // Triangle counting over the part co-purchase graph (parts sharing
    // an order): degree-ordered orientation, so wedge fan-out is bounded
    // at the skewed hubs. The q63 customer-supplier graph is bipartite
    // (triangle-free by construction) — co-purchase is the unipartite
    // projection where density lives.
    "q119_triangles" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.Triangles.triangleCounts(edges, "src", "dst")
    }),


    // 8-truss of the co-purchase graph: edges corroborated by ≥ 6
    // triangles among surviving edges, 4 synchronous peels (the k-core
    // bounded-round contract) — EDGE cohesion, immune to the star-hub
    // false positive degree cuts admit. Support per round via the
    // q119 adjacency-intersection, every witness crediting all three
    // triangle edges.
    "q341_ktruss" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.Truss.kTruss(edges, "src", "dst", k = 8)
    }),

    // Densest subgraph by (1+ε)-peeling over the same co-purchase
    // graph: the round trace (nodes, edges, density) with the densest
    // round flagged — "which peel level was densest", beside q121's
    // fixed-k core. log n degree-count rounds, integer-exact threshold,
    // no per-round collect.
    "q422_densest" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.Densest.densestSubgraphTrace(edges, "src", "dst",
        epsNum = 1L, epsDen = 10L, rounds = 12)
    }),


    // Link prediction over repeat customer-supplier relationships
    // (≥ 2 distinct orders): customer pairs scored by Adamic–Adar over
    // shared suppliers — rare shared suppliers certify, ubiquitous ones
    // barely count. Integer bit-length log keeps scores engine-exact.
    "q130_link_predict" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
        .agg(countDistinct(col("o_orderkey")).as("__no"))
        .filter(col("__no") >= 2).select(col("src"), col("dst"))
      graft.ops.LinkPredict.adamicAdar(edges, "src", "dst",
        minCommon = 3L, maxDeg = 100000L)
    }),


    // Local clustering coefficients over the REPEATED co-purchase graph
    // (parts sharing >= 2 orders — 2.4k-3.9k edges at every SF, so the
    // bench doesn't re-pay q119's full wedge join): clique members read
    // 1, star centers ~0 — the link-farm/bot-ring density signal.
    "q163_clustering_coef" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") >= 2)
        .select(col("src"), col("dst"))
      graft.ops.Triangles.clusteringCoefficients(edges, "src", "dst")
    }),


    // k-core over the same co-purchase graph: k = 70 sits inside the
    // degree distribution at both test SFs, so the peel genuinely
    // cascades (sf0.001: 185 → 153 nodes over the 4 rounds) instead of
    // converging trivially in round one.
    "q121_kcore" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.KCore.kCore(edges, "src", "dst", k = 70, rounds = 4)
    }),

    // FULL coreness decomposition of the same graph via h-index
    // propagation — every part's core number beside q121's fixed-k
    // survivor set; 6 synchronous rounds (monotone upper bound, exact
    // when the peel cascade fits — spec-pinned on known graphs).
    "q444_coreness" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.KCore.corenessHIndex(edges, "src", "dst", rounds = 6)
    }),


    // Bellman-Ford weighted distances on the co-purchase graph
    // (closeness weight = 1000 div shared-order count): exact shortest
    // weighted paths within the 3-round horizon, unrolled oracle.
    "q217_weighted_paths" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"),
          col("b.l_partkey").as("dst"))
        .agg(count(lit(1)).as("shared")).filter(col("shared") >= 2)
        .select(col("src"), col("dst"),
          expr("1000 div shared").as("w"))
      val seeds = Tables(s, dir).part
        .filter(col("p_partkey") % 50 === 0)
        .select(col("p_partkey"))
      graft.ops.Bfs.weightedDistances(edges, "src", "dst", "w", seeds,
        hops = 3)
    }),


    // k-hop BFS blast radius on the co-purchase graph: every part
    // within 3 hops of the seeded part set, with exact shortest-hop
    // distance — fixed synchronous frontier rounds, unrolled oracle.
    "q197_khop_bfs" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val edges = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"),
          col("b.l_partkey").as("dst"))
        .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
        .select(col("src"), col("dst"))
      val seeds = Tables(s, dir).part
        .filter(col("p_partkey") % 50 === 0)
        .select(col("p_partkey"))
      graft.ops.Bfs.kHopDistances(edges, "src", "dst", seeds, hops = 3)
    }),


    // Modularity of the q104 label-propagation communities over the
    // same customer-supplier graph: are those communities structure or
    // noise? Exact-rational per-community q_num = 4·m·m_c − d_c², one
    // IEEE division readout — LPA + modularity hash-match end-to-end.
    "q222_modularity" -> ((s, dir) => {
      val t = Tables(s, dir)
      val edges = t.orders.join(t.lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + Relational.supplierNodeOffset).as("dst"))
      graft.ops.PageRank.modularity(edges, "src", "dst")
    }),
  )

  def oracleSql: Map[String, String] = Map(

    "q63_pagerank" ->
      graft.ops.PageRank.pageRankOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin),


    "q349_eccentricity" ->
      graft.ops.Bfs.eccentricityOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
        "SELECT c_custkey AS node FROM customer WHERE c_custkey % 200 = 1",
        hops = 4),


    "q345_harmonic" ->
      graft.ops.Bfs.harmonicOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
        "SELECT c_custkey AS node FROM customer WHERE c_custkey % 200 = 1",
        hops = 3),


    "q340_betweenness" ->
      graft.ops.Betweenness.fromSeedsOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
        "SELECT c_custkey AS node FROM customer WHERE c_custkey % 200 = 1",
        hops = 3),


    "q332_trade_mst" -> {
      val inner = graft.ops.Mst.boruvkaOracleSql(
        """SELECT na AS src, nb AS dst, -vol AS w FROM (
          |  SELECT least(c_nationkey, s_nationkey) AS na,
          |         greatest(c_nationkey, s_nationkey) AS nb,
          |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |           AS BIGINT) AS vol
          |  FROM lineitem
          |  JOIN orders ON l_orderkey = o_orderkey
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN supplier ON l_suppkey = s_suppkey
          |  WHERE c_nationkey <> s_nationkey
          |  GROUP BY 1, 2)""".stripMargin)
      s"SELECT a, b, -w AS volume_cents FROM ($inner) t"
    },


    "q330_random_walks" ->
      graft.ops.Walks.walksOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |UNION ALL
           |SELECT l_suppkey + ${Relational.supplierNodeOffset} AS src, o_custkey AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
        walksPerNode = 2, steps = 4, salt = "walk-v1"),


    "q323_personalized_pagerank" ->
      graft.ops.PageRank.personalizedPageRankOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |UNION ALL
           |SELECT l_suppkey + ${Relational.supplierNodeOffset} AS src, o_custkey AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin,
        "SELECT c_custkey AS node FROM customer WHERE c_custkey % 100 = 0"),


    "q151_hits" ->
      graft.ops.PageRank.hitsOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin),


    "q161_assortativity" ->
      graft.ops.PageRank.assortativityOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin),


    "q104_label_prop" ->
      graft.ops.PageRank.labelPropagationOracleSql(
        s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin),


    // Same triangle set via plain id-ordering (a < b < c): orientation
    // choice never changes WHICH triangles exist, only join sizes — so
    // the oracle stays three self-joins on the canonical edge list.
    "q422_densest" -> graft.ops.Densest.densestSubgraphOracleSql(
      """SELECT a.l_partkey AS src, b.l_partkey AS dst
        |FROM lineitem a
        |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |               AND a.l_partkey < b.l_partkey""".stripMargin,
      epsNum = 1L, epsDen = 10L, rounds = 12),

    "q341_ktruss" -> graft.ops.Truss.kTrussOracleSql(
      """SELECT a.l_partkey AS src, b.l_partkey AS dst
        |FROM lineitem a
        |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |               AND a.l_partkey < b.l_partkey""".stripMargin,
      k = 8),


    "q119_triangles" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |                 AND a.l_partkey < b.l_partkey
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri
        |)
        |GROUP BY 1""".stripMargin,


    "q163_clustering_coef" ->
      """WITH e AS (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |                 AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |), t AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri
        |  )
        |  GROUP BY 1
        |), deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1
        |)
        |SELECT deg.node, deg,
        |       coalesce(t.n_triangles, 0) AS n_triangles,
        |       CASE WHEN deg >= 2 THEN
        |         CAST(2 * coalesce(t.n_triangles, 0) AS DOUBLE)
        |           / CAST(deg * (deg - 1) AS DOUBLE)
        |       END AS cc
        |FROM deg LEFT JOIN t USING (node)""".stripMargin,


    "q130_link_predict" ->
      """WITH e AS (
        |  SELECT o_custkey AS c, l_suppkey AS z
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT o_orderkey) >= 2
        |), w AS (
        |  SELECT z, 1000000 // length(bin(d)) AS w
        |  FROM (SELECT z, count(*) AS d FROM e GROUP BY 1)
        |  WHERE d <= 100000
        |), ew AS (
        |  SELECT e.c, e.z, w.w FROM e JOIN w USING (z)
        |)
        |SELECT a.c AS c1, b.c AS c2,
        |       CAST(count(*) AS BIGINT) AS common,
        |       CAST(sum(a.w) AS BIGINT) AS aa_score
        |FROM ew a JOIN ew b ON a.z = b.z AND a.c < b.c
        |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,


    "q121_kcore" -> graft.ops.KCore.kCoreOracleSql(
      """SELECT a.l_partkey AS src, b.l_partkey AS dst
        |FROM lineitem a
        |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |              AND a.l_partkey < b.l_partkey""".stripMargin,
      k = 70, rounds = 4),

    "q444_coreness" -> graft.ops.KCore.corenessOracleSql(
      """SELECT a.l_partkey AS src, b.l_partkey AS dst
        |FROM lineitem a
        |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |              AND a.l_partkey < b.l_partkey""".stripMargin,
      rounds = 6),


    "q217_weighted_paths" -> graft.ops.Bfs.weightedOracleSql(
      """SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |       1000 // count(*) AS w
        |FROM lineitem a
        |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |              AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
      "SELECT p_partkey AS node FROM part WHERE p_partkey % 50 = 0",
      hops = 3),


    "q197_khop_bfs" -> graft.ops.Bfs.kHopOracleSql(
      """SELECT a.l_partkey AS src, b.l_partkey AS dst
        |FROM lineitem a
        |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |              AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
      "SELECT p_partkey AS node FROM part WHERE p_partkey % 50 = 0",
      hops = 3),


    "q222_modularity" -> graft.ops.PageRank.modularityOracleSql(
      s"""SELECT o_custkey AS src, l_suppkey + ${Relational.supplierNodeOffset} AS dst
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin),
  )
}
