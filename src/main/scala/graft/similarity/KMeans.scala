package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One Lloyd (k-means) iteration over an embedding corpus — the training
  * counterpart of [[IVF]]: IVF consumes a centroid model, this produces
  * one. Run it a handful of times from the driver (centroids are
  * MODEL-scale — K·dim doubles collected per round, like
  * [[IVF.collectCentroids]]) and feed the result straight to
  * [[IVF.assign]]/[[IVF.topK]].
  *
  * Scale shape:
  *  - Assignment reuses [[IVF.cellExpr]] — literal centroids, pure
  *    codegen'd projection, NO shuffle of the corpus.
  *  - The update is ONE map-side-combinable aggregation: vectors fan out
  *    to (cell, dim, quantized-component) rows and sum exactly; dim×
  *    row growth is scan-bound work that partial aggregation collapses
  *    to C·dim rows before the only shuffle.
  *  - Components are quantized to integers (`floor(x·scale)`) before
  *    summing, so the sums are EXACT and order-independent — a double
  *    sum would be shuffle-order-dependent and non-reproducible across
  *    runs/engines. The mean divides back out in doubles. Centroid drift
  *    from quantization is ≤ 1/scale per dimension per step — noise
  *    relative to k-means' own convergence tolerance.
  */
object KMeans {

  /** One assignment + centroid-update step.
    *
    * @param cents  current centroids (collected, literal-sized)
    * @param scale  quantization factor for the exact component sums
    * @param assign cell-assignment strategy — [[IVF.assign]] (cosine /
    *               spherical k-means, the q58 oracle path) by default;
    *               [[PQ.train]] passes an L2 argmin so sub-quantizers
    *               train in the same metric ADC scores with
    * @return (cell, n, centroid: array<double>) — one row per non-empty
    *         cell; empty cells drop out (standard Lloyd degeneracy, the
    *         caller re-seeds or accepts K shrinking)
    */
  def lloydStep(base: DataFrame, cents: Seq[(Long, Seq[Double])],
      vecCol: String = "ev", scale: Double = 1e6,
      assign: (DataFrame, Seq[(Long, Seq[Double])], String) => DataFrame =
        IVF.assign(_, _, _)): DataFrame = {
    val assigned = assign(base, cents, vecCol)
    exactMeanByKey(assigned, "cell", vecCol, scale)
      .select(col("cell"), col("n"), col("vec").as("centroid"))
  }

  /** Exact quantized per-key mean of a vector column — [[lloydStep]]'s
    * centroid update factored out, because it IS the general embedding
    * pooling operator: mean-pooling chunk embeddings back to document
    * embeddings (the standard aggregation after chunked encoding) is the
    * same per-key exact mean with the document as the key. Components
    * quantize to integers before the one keyed sum (order-independent →
    * bit-reproducible, oracle-able); dim× row fan-out is scan-bound and
    * collapses map-side.
    *
    * @return (keyCol, n, vec: array<double>) — one row per key */
  def exactMeanByKey(df: DataFrame, keyCol: String, vecCol: String,
      scale: Double = 1e6): DataFrame = {
    val dims = df.select(col(keyCol),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(keyCol), col("pos").cast("long").as("pos"),
        floor(col("x") * lit(scale)).as("q"))
    dims.groupBy(col(keyCol), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .withColumn("m", col("s").cast("double") / col("n") / lit(scale))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m")).as("vec"))
  }

  /** Pairwise cosine similarity between per-group centroids — the
    * cluster/label geometry report (which classes are embedding-space
    * neighbors, which sources cover the same semantic region). The
    * centroid-level sibling of SemDeDup's member-level question.
    *
    * Exactness: centroids are the [[exactMeanByKey]] exact means,
    * RE-quantized to integer milli components (`floor(m·1000)` — floor
    * of a bit-identical double is bit-portable), so the pair dot
    * products and norms are exact integer sums (|c| ≤ scale·1000 keeps
    * every product far inside int64) and the cosine is one fixed IEEE
    * sequence. The milli grid costs ~1e-3 relative precision — nothing
    * at similarity-matrix granularity — and buys engine-exact output.
    *
    * Scale shape: everything after the one exactMeanByKey aggregation
    * operates on |groups|·dim rows; the pair join is position-keyed
    * with |groups| fan-out per position.
    *
    * @return (group_a, group_b, dot_q, norm_a_q, norm_b_q, cosine)
    */
  def centroidCosineMatrix(df: DataFrame, keyCol: String, vecCol: String)
      : DataFrame = {
    val cents = exactMeanByKey(df, keyCol, vecCol)
      .select(col(keyCol).as("g"),
        posexplode(col("vec")).as(Seq("pos", "m")))
      .select(col("g"), col("pos"),
        floor(col("m") * lit(1000.0)).cast("long").as("c"))
    val norms = cents.groupBy(col("g"))
      .agg(sum(col("c") * col("c")).as("nq"))
    val dots = cents.as("a")
      .join(cents.as("b"), Seq("pos"))
      .filter(col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("group_a"), col("b.g").as("group_b"))
      .agg(sum(col("a.c") * col("b.c")).as("dot_q"))
    dots
      .join(broadcast(norms.select(col("g").as("group_a"),
        col("nq").as("norm_a_q"))), Seq("group_a"))
      .join(broadcast(norms.select(col("g").as("group_b"),
        col("nq").as("norm_b_q"))), Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("dot_q"),
        col("norm_a_q"), col("norm_b_q"),
        when(col("norm_a_q") > 0 && col("norm_b_q") > 0,
          col("dot_q").cast("double") /
            (sqrt(col("norm_a_q").cast("double")) *
              sqrt(col("norm_b_q").cast("double")))).as("cosine"))
  }

  /** DuckDB oracle for [[centroidCosineMatrix]] over
    * `table(keyCol, vecCol)`. */
  def centroidCosineOracleSql(table: String, keyCol: String,
      vecCol: String, scale: Double = 1e6): String =
    s"""WITH dims AS (
       |  SELECT $keyCol AS g, CAST(pr[2] AS BIGINT) AS pos,
       |         CAST(floor(pr[1] * $scale) AS BIGINT) AS q
       |  FROM (SELECT $keyCol, unnest(list_zip($vecCol,
       |          range(0, len($vecCol)))) AS pr FROM $table)
       |), mean AS (
       |  SELECT g, pos,
       |         CAST(sum(q) AS DOUBLE) / count(*) / $scale AS m
       |  FROM dims GROUP BY 1, 2
       |), cq AS (
       |  SELECT g, pos, CAST(floor(m * 1000.0) AS BIGINT) AS c FROM mean
       |), nrm AS (
       |  SELECT g, CAST(sum(c * c) AS BIGINT) AS nq FROM cq GROUP BY 1
       |), dot AS (
       |  SELECT a.g AS group_a, b.g AS group_b,
       |         CAST(sum(a.c * b.c) AS BIGINT) AS dot_q
       |  FROM cq a JOIN cq b ON a.pos = b.pos AND a.g < b.g
       |  GROUP BY 1, 2
       |)
       |SELECT group_a, group_b, dot_q, na.nq AS norm_a_q, nb.nq AS norm_b_q,
       |       CASE WHEN na.nq > 0 AND nb.nq > 0 THEN
       |         CAST(dot_q AS DOUBLE)
       |           / (sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE)))
       |       END AS cosine
       |FROM dot
       |JOIN nrm na ON na.g = group_a
       |JOIN nrm nb ON nb.g = group_b""".stripMargin

  /** Simplified (centroid-based) silhouette — the clustering-quality
    * readout that prices separation, complementing [[lloydStep]]'s
    * convergence and the q280 ARI's label agreement: per point,
    * a = distance to its own (nearest) centroid, b = distance to the
    * runner-up centroid, s = (b − a) / max(a, b). With argmin
    * assignment a ≤ b always, so s ∈ [0, 1) reads as a separation
    * margin — s → 0 means the point sits on a cell boundary (k too
    * large / overlapping clusters), s → 1 tight isolated cells. Full
    * silhouette's O(n²) pairwise distances never happen: centroids are
    * literal-sized, so the whole scoring stage is ONE scan-projection
    * with zero shuffle, then one keyed aggregation.
    *
    * Cross-engine exactness: distances are [[PQ.qdistToLit]] integer-
    * quantized squared L2 (the q75/q76-proven folds); s derives in
    * doubles from those integers (IEEE sqrt is correctly rounded — bit
    * identical on both engines) and re-quantizes before the mean, so
    * the per-cell sum is order-independent.
    *
    * @param cents literal centroids (≥ 2), the [[lloydStep]] shape
    * @return (cell, n, mean_s) — assignment here is L2-argmin (ties to
    *         lowest cid), the metric the silhouette itself scores */
  def simplifiedSilhouette(base: DataFrame, cents: Seq[(Long, Seq[Double])],
      vecCol: String = "ev"): DataFrame = {
    require(cents.size >= 2, "silhouette needs >= 2 centroids")
    val dists = array_sort(array(cents.map { case (cid, cv) =>
      struct(PQ.qdistToLit(col(vecCol), cv).cast("long").as("d2"),
        lit(cid).as("cid"))
    }: _*))
    val a2 = element_at(dists, 1).getField("d2")
    val b2 = element_at(dists, 2).getField("d2")
    val s = when(b2 > 0L,
      (sqrt(b2.cast("double")) - sqrt(a2.cast("double"))) /
        sqrt(b2.cast("double"))).otherwise(lit(0.0))
    base
      .select(element_at(dists, 1).getField("cid").as("cell"),
        floor(s * lit(1e6)).cast("long").as("__qs"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("__qs")).as("__sq"))
      .select(col("cell"), col("n"),
        (col("__sq").cast("double") / col("n") / lit(1e6)).as("mean_s"))
  }

  /** DuckDB oracle for [[simplifiedSilhouette]]: `bSql`/`cSql` are CTE
    * bodies producing (id, ev) points and (cid, cv) centroids;
    * `qdistSql` the shared quantized-L2 fragment over (ev, cv). */
  def silhouetteOracleSql(bSql: String, cSql: String,
      qdistSql: String): String =
    s"""WITH b AS ($bSql), c AS ($cSql),
       |d AS (
       |  SELECT b.id, c.cid, $qdistSql AS qd2 FROM b CROSS JOIN c
       |), r AS (
       |  SELECT id, cid, qd2,
       |         row_number() OVER (PARTITION BY id ORDER BY qd2, cid) AS rn
       |  FROM d
       |), ab AS (
       |  SELECT a.id, a.cid AS cell, a.qd2 AS a2, bb.qd2 AS b2
       |  FROM r a JOIN r bb ON a.id = bb.id AND a.rn = 1 AND bb.rn = 2
       |), s AS (
       |  SELECT cell,
       |         CAST(floor(CASE WHEN b2 > 0 THEN
       |             (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
       |               / sqrt(CAST(b2 AS DOUBLE))
       |           ELSE 0.0 END * 1000000.0) AS BIGINT) AS qs
       |  FROM ab
       |)
       |SELECT cell, CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(qs) AS DOUBLE) / count(*) / 1000000.0 AS mean_s
       |FROM s GROUP BY 1""".stripMargin
}
