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
  * Triangles are then CLOSED BY ADJACENCY INTERSECTION, not by a wedge
  * join: each oriented edge (s,t) contributes |N⁺(s) ∩ N⁺(t)| triangles
  * (w ranks above both, so the triangle is found exactly once, at its
  * lowest-ranked edge). The intersection form touches the same
  * Σ out-deg² elements the wedge join would, but as contiguous
  * in-memory array probes inside one codegen'd `array_intersect` —
  * no O(Σ out-deg²) wedge ROWS are ever materialized or shuffled, and
  * the third join disappears. Degree orientation is also what bounds
  * the collected adjacency arrays: out-deg ≤ O(√(2m)), so a per-node
  * neighbor list is ≤ ~√(2m)·8 bytes even at 10⁹ edges — a hub's list
  * at m = 10⁹ is ~360 KB, never a driver or executor hazard.
  *
  * All joins are equi-joins on node keys (shuffle-partitioned,
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
    // Orient low rank → high rank under (degree, id). Persisted: read
    // twice below (adjacency build + edge stream), and without
    // materialization each read re-runs the whole scan → canonicalize →
    // degree-join pipeline (repo caching contract — callers clearCache).
    val lower = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val o = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
      .persist()
    // Out-adjacency arrays under the orientation: |N⁺| ≤ O(√(2m)) by the
    // degree ordering, so every array is boundedly small. Persisted: fed
    // to both sides of the edge join (recomputing the groupBy per join
    // arm would double the shuffle).
    val adj = o.groupBy(col("s").as("n"))
      .agg(collect_list(col("t")).as("nbrs")).persist()
    // A triangle a<b<c (rank order) is closed exactly once, at its
    // lowest edge (a,b): c ∈ N⁺(a) ∩ N⁺(b). Inner joins are exact — an
    // endpoint with no out-neighbors closes nothing.
    val inter = o
      .join(adj.select(col("n").as("s"), col("nbrs").as("__ns")), Seq("s"))
      .join(adj.select(col("n").as("t"), col("nbrs").as("__nt")), Seq("t"))
      .select(col("s"), col("t"),
        array_intersect(col("__ns"), col("__nt")).as("__ws"))
      .filter(size(col("__ws")) > 0)
      .persist()
    // Per-triangle credit to all three corners: s and t once per element
    // of the intersection, each w once per appearance. Only triangle-
    // count rows flow here — Σ out-deg² never materializes as rows.
    val sides = inter
      .select(col("s").as("node"), size(col("__ws")).cast("long").as("c"))
      .unionAll(inter.select(col("t").as("node"),
        size(col("__ws")).cast("long").as("c")))
      .unionAll(inter.select(explode(col("__ws")).as("node"), lit(1L).as("c")))
    sides.groupBy(col("node")).agg(sum(col("c")).as("n_triangles"))
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
