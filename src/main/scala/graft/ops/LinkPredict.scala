package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction with Adamic–Adar weighting — "who
  * should be connected that isn't": candidate (node, node) pairs scored
  * by Σ_z 1/log deg(z) over their shared neighbors z, so a RARE shared
  * neighbor certifies similarity far more than a ubiquitous one (the
  * property plain common-neighbor counting lacks). Standard on bipartite
  * interaction graphs: customers sharing suppliers, users sharing items,
  * docs sharing rare terms.
  *
  * Engine-exact arithmetic: the 1/log weight is `scale div blog(deg)`
  * with `blog(x) = length(bin(x)) = floor(log2 x) + 1` — the integer
  * bit-length quantization of q116's LM scoring, so scores are exact
  * longs and hash-match the oracle (a double Σ1/ln(d) would diverge by
  * addition order).
  *
  * Scale shape: the pair generation is the wedge join at each shared
  * neighbor — Σ deg² rows — bounded by `maxDeg`: a hub neighbor both
  * blows up C(deg, 2) AND carries ≈ zero Adamic–Adar signal, so cutting
  * it is the df-cut of near-dup pairs (`NearDup.jaccardPairs`) wearing
  * graph clothes. Everything else is keyed aggregation.
  */
object LinkPredict {

  /** Scored candidate pairs over a bipartite edge list (`srcCol` nodes
    * linked through shared `nbrCol` neighbors). Parallel edges collapse;
    * neighbors with degree > `maxDeg` are cut BEFORE pair generation.
    *
    * @return (c1, c2, common, aa_score) — c1 < c2, common ≥ minCommon;
    *         aa_score = Σ_z scale div blog(deg z), an exact long */
  def adamicAdar(edges: DataFrame, srcCol: String, nbrCol: String,
      minCommon: Long, maxDeg: Long = Long.MaxValue,
      scale: Long = 1000000L): DataFrame = {
    require(minCommon >= 1 && maxDeg >= 1 && scale >= 1)
    val e = edges.select(col(srcCol).as("c"), col(nbrCol).as("z")).distinct()
    val w = e.groupBy(col("z")).agg(count(lit(1)).as("d"))
      .filter(col("d") <= maxDeg)
      .select(col("z"), expr(s"$scale div length(bin(d))").as("w"))
    val ew = e.join(w, Seq("z"))
    ew.as("a").join(ew.as("b"),
        col("a.z") === col("b.z") && col("a.c") < col("b.c"))
      .groupBy(col("a.c").as("c1"), col("b.c").as("c2"))
      .agg(count(lit(1)).as("common"), sum(col("a.w")).as("aa_score"))
      .filter(col("common") >= minCommon)
  }

  /** Deterministic negative-edge sampling — the non-links a link-
    * prediction or graph-embedding trainer contrasts against: up to `k`
    * hash-chosen non-neighbor candidates per node, reproducible on
    * every run (resume-safe, exactly like the corpus split hashing).
    *
    * Mechanics: nodes get a dense 1..n index by the [[Ranking
    * .globalOrdinals]] recipe (per-shard offsets — no single sorted
    * partition), candidate i of a node is the node at index
    * `hash60(node‖i) mod n` + 1, then self-pairs and EXISTING edges are
    * removed by one anti-join on the normalized pair key. Per-node
    * output may fall short of `k` (collisions, self-hits, true
    * neighbors) — documented; callers oversample `k` rather than
    * rejection-loop, the standard practice.
    *
    * @return (node, neg, i) — `i` the sample slot that produced the pair
    */
  def negativeSamples(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64)
    import graft.functions.Hash64
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val nodes = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node"))).distinct()
      .withColumn("__shard", pmod(col("node"), lit(64L)))
    val indexed = Ranking.globalOrdinals(nodes, "__shard", Seq("node"))
      .select(col("node"), col("ordinal"))
    val n = indexed.agg(count(lit(1)).as("__n"))
    val cands = indexed
      .crossJoin(broadcast(n))
      .select(col("node"),
        explode(sequence(lit(1L), lit(k.toLong))).as("i"),
        col("__n"))
      .withColumn("__cidx",
        pmod(Hash64.hash60(concat_ws("_", col("node"), col("i"))),
          col("__n")) + 1)
      .join(indexed.select(col("ordinal").as("__cidx"),
        col("node").as("neg")), Seq("__cidx"))
      .filter(col("node") =!= col("neg"))
      .select(col("node"), col("neg"), col("i"))
    cands
      .withColumn("u", least(col("node"), col("neg")))
      .withColumn("v", greatest(col("node"), col("neg")))
      .join(e, Seq("u", "v"), "left_anti")
      .select(col("node"), col("neg"), col("i"))
  }

  /** DuckDB oracle for [[negativeSamples]]: `edgeSql` yields (src, dst). */
  def negativeSamplesOracleSql(edgeSql: String, k: Int): String =
    s"""WITH e AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM ($edgeSql)
       |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
       |), nodes AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
       |), idx AS (
       |  SELECT node, CAST(row_number() OVER (ORDER BY node % 64, node)
       |    AS BIGINT) AS ordinal
       |  FROM nodes
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
       |cands AS (
       |  SELECT idx.node, i.i,
       |         ${graft.functions.Hash64.duckSql(
                    "CAST(idx.node AS VARCHAR) || '_' || CAST(i.i AS VARCHAR)")}
       |           % nn.n + 1 AS cidx
       |  FROM idx, (SELECT unnest(range(1, ${k + 1})) AS i) i, nn
       |), paired AS (
       |  SELECT c.node, b.node AS neg, CAST(c.i AS BIGINT) AS i
       |  FROM cands c JOIN idx b ON b.ordinal = c.cidx
       |  WHERE c.node <> b.node
       |)
       |SELECT node, neg, i FROM paired p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM e
       |  WHERE e.u = least(p.node, p.neg) AND e.v = greatest(p.node, p.neg))
       |""".stripMargin
}
