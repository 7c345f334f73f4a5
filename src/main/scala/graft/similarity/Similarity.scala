package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an `array<float>` embedding column.
  *
  * Brute-force cosine top-k is the exactness baseline: broadcast the (small)
  * query set, score every row, per-query top-k. One pass over the corpus, no
  * shuffle of the corpus side — at 100 TB this is scan-bound and
  * embarrassingly parallel.
  *
  * The scale path is [[lshBuckets]]: random-hyperplane LSH cuts candidates
  * to one bucket's worth per query (probing only matching sign-bit buckets),
  * trading recall for a ~2^bits candidate reduction. Hyperplanes are derived
  * deterministically from xxhash64 so the operator needs no stored model.
  *
  * All expressions are built-in higher-order functions (`zip_with`,
  * `aggregate`) — codegen'd, no UDF (SURVEY §7.5).
  */
object Similarity {

  /** Cast array<float> → array<double> so both engines multiply/accumulate
    * in double from the start (cross-engine bit parity). */
  def toDouble(arr: Column): Column = transform(arr, x => x.cast("double"))

  /** Sequential-fold dot product: `((0+p1)+p2)+...` — bit-identical to
    * DuckDB's `list_reduce`, since `0.0 + p1 == p1` exactly. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))

  /** Brute-force cosine top-k: broadcast `queries` (qid, qv), score all of
    * `base` (id, ev), keep k best per query (deterministic tie-break on id). */
  def bruteForceTopK(base: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = base.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine(col("qv"), col("ev")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("cosine"), col("rn"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * portable-hash-derived value in [-0.5, 0.5). Uses [[Hash64.hash60]]
    * (md5-based, non-negative) rather than xxhash64 so the DuckDB oracle
    * can derive the identical hyperplanes — which upgrades the ANN query
    * from a rows-only check to a full hash-compared oracle. */
  private def planeComponent(plane: Int, dim: Column): Column =
    ((graft.functions.Hash64.hash60(concat_ws("_", lit(plane), dim)) % lit(1000L))
      .cast("double") / lit(1000.0)) - lit(0.5)

  /** Random-hyperplane LSH bucket id: one sign bit per plane over the
    * embedding's dot product with each hyperplane. */
  def lshBucket(ev: Column, dim: Int, bits: Int = 8): Column =
    (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(ev, sequence(lit(0), lit(dim - 1)),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via LSH buckets: candidates = rows sharing the query's bucket,
    * reranked by exact cosine, top-k per query. Recall < 1 by construction;
    * increase probes/bands for higher recall at proportional cost. */
  def annTopK(base: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame = {
    val bucketed = base.withColumn("bucket", lshBucket(col("ev"), dim))
    val qBucketed = queries.withColumn("bucket", lshBucket(col("qv"), dim))
    val cands = bucketed.join(broadcast(qBucketed), Seq("bucket"))
      .withColumn("cosine", cosine(col("qv"), col("ev")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    cands.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id"), col("cosine"), col("rn"), col("bucket"))
  }
}
