package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** IVF (inverted-file) ANN: partition the corpus into coarse cells by
  * nearest centroid, search only the query's `nProbe` nearest cells.
  * The scale path complementary to [[Similarity.lshBucket]]: LSH needs no
  * model but its buckets ignore the data distribution; IVF spends a small
  * trained model (the centroids) to get data-adaptive cells and a tunable
  * scanned-fraction ≈ nProbe / C.
  *
  * Spark shape — the part that must survive 100 TB:
  *  - Centroids are MODEL-scale (C vectors), not corpus-scale, so they are
  *    collected once and baked into the plan as literals. Cell assignment
  *    is then a pure per-row codegen'd expression ([[DotProduct]] against
  *    literal arrays + `array_max` argmax): NO shuffle, no join, no UDF —
  *    the corpus is touched by exactly one scan-project.
  *  - Probing broadcasts the (tiny) exploded query×probe frame; candidate
  *    generation is a broadcast hash join on `cell`. Cells are disjoint
  *    (unlike multi-band LSH), so no candidate dedup step is needed.
  *  - Rerank is exact cosine + [[TopK.perGroup]] two-phase top-k.
  *
  * Everything is deterministic and fold-order-exact, so the whole operator
  * has a DuckDB oracle (q36): ties break on lowest centroid/vector id, and
  * cosines left-fold from 0.0 in both engines.
  *
  * Centroid provenance: any (id, vector) frame works — a k-means fit, a
  * coreset sample, or (harness/oracle) the first C corpus vectors. The
  * operator takes the frame; training is out of scope.
  */
object IVF {

  /** Collect a centroid frame (cid, cv: array<double>) to driver values.
    * Centroids are broadcast-scale by contract — C in the hundreds-to-
    * thousands even at 100 TB corpus scale. */
  def collectCentroids(centroids: DataFrame, idCol: String, vecCol: String): Seq[(Long, Seq[Double])] =
    centroids.select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector)).toVector.sortBy(_._1)

  /** Cosine of a vector column against one literal centroid — the same
    * left-fold evaluation order as [[Similarity.cosine]], with the
    * centroid's self-norm also computed in-plan (constant per row but
    * bit-identical to the oracle's recomputation; C·dim multiplies per row
    * is scan-bound work, not shuffle work). */
  private def cosToLit(ev: Column, cv: Seq[Double]): Column = {
    val litArr = array(cv.map(lit): _*)
    DotProduct.dot(ev, litArr) /
      sqrt(DotProduct.dot(ev, ev)) /
      sqrt(DotProduct.dot(litArr, litArr))
  }

  /** (cosine, −cid) structs: `array_max`/`sort_array` on them order by
    * best cosine first, lowest cid on ties. */
  private def scoredCells(ev: Column, cents: Seq[(Long, Seq[Double])]): Column =
    array(cents.map { case (cid, cv) =>
      struct(cosToLit(ev, cv).as("c"), lit(-cid).as("nc"))
    }: _*)

  /** Nearest-centroid cell id, as a shuffle-free expression. */
  def cellExpr(ev: Column, cents: Seq[(Long, Seq[Double])]): Column =
    -array_max(scoredCells(ev, cents)).getField("nc")

  /** The query's `nProbe` nearest cell ids (best first). */
  def probeExpr(qv: Column, cents: Seq[(Long, Seq[Double])], nProbe: Int): Column =
    transform(
      slice(reverse(array_sort(scoredCells(qv, cents))), 1, nProbe),
      s => -s.getField("nc"))

  /** Corpus with its cell assignment appended (one scan, no shuffle). */
  def assign(base: DataFrame, cents: Seq[(Long, Seq[Double])],
      vecCol: String = "ev"): DataFrame =
    base.withColumn("cell", cellExpr(col(vecCol), cents))

  /** Every vector's nearest cell AND the cosine to it, with the vector
    * kept — [[assign]] plus the assignment quality in one zero-shuffle
    * scan (argmax ties best-cosine-then-lowest-cid, the oracle's
    * `ORDER BY cos DESC, cid`). The shared core of [[outliers]] (which
    * filters it) and the q455 spherical-k-means objective (which
    * aggregates it: Σ cos(x, assigned centroid) is the quantity one
    * Lloyd step provably does not decrease — cosine is scale-invariant,
    * so the un-normalized exact mean scores identically to the
    * normalized spherical centroid).
    *
    * @return (idCol, vecCol, cell, best_cos) */
  def bestCells(base: DataFrame, cents: Seq[(Long, Seq[Double])],
      idCol: String = "id", vecCol: String = "ev"): DataFrame = {
    val best = array_max(scoredCells(col(vecCol), cents))
    base.select(col(idCol), col(vecCol),
      (-best.getField("nc")).as("cell"), best.getField("c").as("best_cos"))
  }

  /** Embedding-space outlier report: vectors whose cosine to their
    * NEAREST centroid is below `minCos` — i.e. far from every cluster
    * the model knows. The noise/contamination filter run before
    * clustering-derived curation (SemDeDup cells, IVF search, per-cell
    * sampling all silently degrade on cluster-less vectors). Same
    * zero-shuffle shape as [[assign]] (see [[bestCells]]).
    *
    * @return (idCol, cell, best_cos) for vectors with best_cos < minCos */
  def outliers(base: DataFrame, cents: Seq[(Long, Seq[Double])],
      minCos: Double, idCol: String = "id",
      vecCol: String = "ev"): DataFrame =
    bestCells(base, cents, idCol, vecCol)
      .select(col(idCol), col("cell"), col("best_cos"))
      .filter(col("best_cos") < minCos)

  /** IVF top-k: score only vectors in the query's `nProbe` nearest cells.
    * Output (qid, id, cosine, rn) — same contract as
    * [[Similarity.bruteForceTopK]], against which SimilaritySpec measures
    * recall and scanned fraction. */
  def topK(base: DataFrame, queries: DataFrame, cents: Seq[(Long, Seq[Double])],
      nProbe: Int, k: Int): DataFrame = {
    val assigned = assign(base, cents)
    val probes = queries
      .withColumn("cell", explode(probeExpr(col("qv"), cents, nProbe)))
    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .withColumn("cosine", Similarity.cosineNative(col("qv"), col("ev")))
    TopK.perGroup(cands, Seq("qid"), "id", "cosine", k)
      .select(col("qid"), col("id"), col("cosine"), col("rn"))
  }
}
