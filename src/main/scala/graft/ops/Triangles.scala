package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the clustering-coefficient /
  * community-density primitive (co-purchase bundles, link-farm
  * detection). Node-iterator with DEGREE-ORDERED edge orientation
  * (Chiba–Nishizeki / "compact-forward"), the formulation that survives
  * skew at scale:
  *
  * Every undirected edge is oriented from its lower- to its
  * higher-ranked endpoint under the total order (degree, id). A
  * triangle then has exactly ONE node with out-edges to the other two,
  * so it is found exactly once: wedge (u→v, u→w) closed by v→w. The
  * payoff is the wedge join's size — Σ out-deg² is O(m^1.5) under
  * degree orientation, versus Σ deg² for naive id-orientation, where
  * one celebrity hub (deg 10⁶) alone would generate 10¹² wedges. Hubs
  * get HIGH rank, so almost everything points AT them and their
  * out-degree stays ≤ O(√m).
  *
  * All three joins are equi-joins on node keys (shuffle-partitioned,
  * AQE-planned); nothing is collected. The result is orientation-
  * independent — any total order finds the same triangle set — which
  * is what lets the DuckDB oracle use plain id-ordering while this
  * implementation orders by degree.
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected graph
    * given as (possibly duplicated, possibly bidirectional) edge pairs.
    * Self-loops and NULL endpoints are dropped; parallel edges collapse.
    * Nodes in no triangle drop out (count 0 is absence).
    *
    * @return (node, n_triangles) */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // Canonical undirected edge set: (u < v), deduped, loop-free.
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient low rank → high rank under (degree, id), carrying the HEAD
    // endpoint's rank (`rt`) so the wedge stage can order out-neighbor
    // pairs without a re-join. Persisted: it is read three times below
    // (wedge legs + closing edge), and without materialization each read
    // re-runs the whole scan → canonicalize → degree-join pipeline (repo
    // caching contract — callers clearCache).
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"),
        when(lower, struct(col("dv").as("d"), col("v").as("n")))
          .otherwise(struct(col("du").as("d"), col("u").as("n"))).as("rt"))
      .persist()
    // Wedge at the lowest-ranked corner, generated rank-ORDERED
    // (rank b < rank c): each unordered out-neighbor pair appears once,
    // not twice — C(out-deg, 2) wedge rows instead of out-deg² — and the
    // closing edge b→c (oriented low→high rank by construction) matches
    // the wedge's ordering exactly, so each triangle still counts once.
    val tri = o.select(col("s"), col("t").as("b"), col("rt").as("rb"))
      .join(o.select(col("s"), col("t").as("c"), col("rt").as("rc")), Seq("s"))
      .filter(col("rb") < col("rc"))
      .join(o.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
    tri.select(explode(array(col("s"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficients: cc(v) = triangles(v) / C(deg v, 2)
    * — "how much of v's neighborhood is itself connected", the
    * community-density readout on top of [[triangleCounts]]. cc = 1 is
    * a clique member, cc ≈ 0 a star center; link farms and bot rings
    * sit near 1 while organic hubs sit low. Degree-1 nodes have no
    * pair to close and read NULL (no verdict), not 0.
    *
    * The double derives from one integer division pair —
    * `2·t / (d·(d−1))` both cast once — so it is bit-portable.
    *
    * @return (node, deg, n_triangles, cc) over every non-isolated node */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    deg.join(triangleCounts(edges, srcCol, dstCol), Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("cc", when(col("deg") >= 2,
        (lit(2L) * col("n_triangles")).cast("double") /
          (col("deg") * (col("deg") - 1L)).cast("double")))
  }
}
