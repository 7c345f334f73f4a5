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
}
