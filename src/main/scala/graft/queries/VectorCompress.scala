package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hash64
import graft.similarity.Similarity

/** Vector COMPRESSION and matrix-statistics queries, split out of
  * [[Vectors]] (file-size bar): PQ encode/ADC, int8 quantization, JL
  * projection, Matryoshka truncation, covariance/standardize/
  * Mahalanobis/PCA, and embedding pooling. Same conventions
  * ([[QueryModule]]); shared frames come from [[Vectors.base]]. */
object VectorCompress extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Matryoshka truncation curve: recall@5 of leading-d-dim cosine
    // top-k against the full-dim ground truth, d ∈ {8, 16, 32, 64} —
    // the dims-vs-recall readout that decides how far an MRL embedding
    // can be cut for first-stage retrieval (PQ's bytes-vs-recall
    // question, answered by truncation instead of quantization).
    "q348_matryoshka" -> ((s, dir) => {
      val t = Tables(s, dir)
      Similarity.matryoshkaOverlap(Vectors.base(t), Vectors.queriesDf(t), 5,
        Seq(8, 16, 32, 64))
    }),


    // Johnson-Lindenstrauss projection 64→16: the byte-volume reducer
    // before ANN/clustering sweeps. Long form + micro quantization so
    // the comparator sees integers; zero shuffles.
    "q145_jl_project" -> ((s, dir) =>
      Similarity.randomProject(Vectors.base(Tables(s, dir)),
        "id", "ev", dim = 64, outDims = 16)),


    // int8 quantization calibration + per-label reconstruction-error
    // report: per-dim min/max affine codes, errors quantized to integer
    // micros BEFORE summation, rail-saturation counts.
    "q189_int8_quant" -> ((s, dir) =>
      graft.similarity.Quantize.quantizeError(
        Tables(s, dir).embeddings, "label", "embedding")),


    // Exact covariance matrix (upper triangle): per-row nested position
    // explode feeding one map-side-combinable Gram aggregation — no
    // vector self-join; covariance derived from exact integer sums.
    "q191_covariance" -> ((s, dir) =>
      graft.similarity.Covariance.covarianceMatrix(
        Tables(s, dir).embeddings, "embedding", dim = 64)),


    // StandardScaler: per-dim z-normalization from exact micro sums,
    // long-form output, constant dims yield NULL.
    "q192_standardize" -> ((s, dir) =>
      graft.similarity.Covariance.standardize(
        Tables(s, dir).embeddings, "vec_id", "embedding")),


    // Diagonal-Mahalanobis outlier score: Σz² over portable trunc'd
    // milli z-scores — the per-axis outlier read the norm misses.
    "q199_mahalanobis" -> ((s, dir) =>
      graft.similarity.Covariance.mahalanobisDiag(
        Tables(s, dir).embeddings, "vec_id", "embedding")),


    // PCA PC1 projection: fixed-round integer power iteration on the
    // portable nano-quantized covariance — the iteration never touches
    // the corpus (dim² matrix rows), only the covariance pass and the
    // final projection do.
    "q198_pca_pc1" -> ((s, dir) =>
      graft.similarity.Pca.pc1Projection(
        Tables(s, dir).embeddings, "vec_id", "embedding", dim = 64)),


    // PC2 by deflation: subtract PC1's rank-1 variance slab from the
    // quantized covariance and power-iterate again — eigen-depth with
    // the same engine-exact integer machinery; the deflation cell term
    // runs as one fixed double sequence (identical, not exact, past
    // 2^53 — the documented q191 tier).
    "q375_pca_pc2" -> ((s, dir) =>
      graft.similarity.Pca.pc2Projection(
        Tables(s, dir).embeddings, "vec_id", "embedding", dim = 64)),


    // Chunk -> document embedding mean-pooling: vec_id div 10 groups
    // stand in for chunks of one document; exact quantized per-key mean
    // (the lloydStep update with the doc as the key). Long-form output
    // (the comparator cannot sort arrays).
    "q105_embedding_pool" -> ((s, dir) => {
      val grouped = Vectors.base(Tables(s, dir))
        .withColumn("doc", expr("id div 10"))
      graft.similarity.KMeans.exactMeanByKey(grouped, "doc", "ev")
        .select(col("doc"), col("n"),
          posexplode(col("vec")).as(Seq("pos", "c")))
        .withColumn("pos", col("pos").cast("long"))
    }),


    // PQ encode: per-subspace argmin against literal sub-codebooks —
    // one codegen'd scan-projection, no shuffle; code emitted as a
    // comma-joined string (the comparator cannot sort arrays).
    "q75_pq_encode" -> ((s, dir) => {
      val t = Tables(s, dir)
      graft.similarity.PQ.encode(Vectors.base(t), Vectors.pqCodebook(t))
        .select(col("id"), array_join(transform(col("code"),
          c => c.cast("string")), ",").as("code"))
    }),


    // PQ ADC top-k over the full code table: integer-exact quantized
    // LUT sums, two-phase top-k — the compressed-domain ANN scale path.
    "q76_pq_adc" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cb = Vectors.pqCodebook(t)
      graft.similarity.PQ.adcTopK(
        graft.similarity.PQ.encode(Vectors.base(t), cb), Vectors.queriesDf(t), cb, k = 5)
    }),
  )

  def oracleSql: Map[String, String] = Map(

    "q348_matryoshka" -> {
      val dimRows = Seq(8, 16, 32, 64).map { d =>
        s"""SELECT CAST($d AS BIGINT) AS dim,
           |  (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_queries,
           |  (SELECT CAST(count(*) AS BIGINT)
           |   FROM (
           |     SELECT qid, id FROM (
           |       SELECT qid, id, row_number() OVER (PARTITION BY qid
           |         ORDER BY cosine DESC, id) AS rn
           |       FROM (
           |         SELECT qid, id,
           |                ${Vectors.cosineSqlFor(s"qv[1:$d]", s"ev[1:$d]")} AS cosine
           |         FROM b CROSS JOIN q)
           |     ) WHERE rn <= 5
           |   ) td JOIN fulltk USING (qid, id)) AS sum_overlap"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH b AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
         |  FROM embeddings
         |), q AS MATERIALIZED (
         |  SELECT vec_id AS qid,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id < 3
         |), fulltk AS MATERIALIZED (
         |  SELECT qid, id FROM (
         |    SELECT qid, id, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, id) AS rn
         |    FROM (SELECT qid, id, ${Vectors.cosineSql} AS cosine
         |          FROM b CROSS JOIN q)
         |  ) WHERE rn <= 5
         |), curve AS (
         |$dimRows
         |)
         |SELECT dim, n_queries, sum_overlap,
         |       CAST(sum_overlap AS DOUBLE) / (n_queries * 5)
         |         AS recall_at_k
         |FROM curve""".stripMargin
    },


    "q105_embedding_pool" ->
      """WITH b AS (
        |  SELECT vec_id // 10 AS doc,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), dims AS (
        |  SELECT doc, CAST(pr[2] AS BIGINT) AS pos,
        |         CAST(floor(pr[1] * 1000000.0) AS BIGINT) AS q
        |  FROM (SELECT doc, unnest(list_zip(ev, range(0, len(ev)))) AS pr
        |        FROM b)
        |), sums AS (
        |  SELECT doc, pos, CAST(sum(q) AS BIGINT) AS s, count(*) AS n
        |  FROM dims GROUP BY 1, 2
        |)
        |SELECT doc, n, pos, CAST(s AS DOUBLE) / n / 1000000.0 AS c
        |FROM sums""".stripMargin,


    "q75_pq_encode" ->
      s"""WITH ${Vectors.pqCtes}
        |SELECT id, array_to_string(list(CAST(cid AS VARCHAR) ORDER BY s), ',') AS code
        |FROM codes GROUP BY 1""".stripMargin,


    "q76_pq_adc" ->
      s"""WITH ${Vectors.pqCtes}, q AS (
        |  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), qs AS (
        |  SELECT qid, s, qv[s * 8 + 1 : s * 8 + 8] AS x FROM q CROSS JOIN sub
        |), lut AS (
        |  SELECT qid, s, cid, ${Vectors.qdistSqlFor("x", "y")} AS d
        |  FROM qs JOIN cs USING (s)
        |), adcs AS (
        |  SELECT qid, id, CAST(sum(d) AS BIGINT) AS adc
        |  FROM codes JOIN lut USING (s, cid) GROUP BY 1, 2
        |)
        |SELECT qid, id, adc, rn FROM (
        |  SELECT qid, id, adc,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS BIGINT) AS rn
        |  FROM adcs
        |) WHERE rn <= 5""".stripMargin,


    // Plane values recomputed from the portable hash, same sequential
    // fold as the Spark literal-array aggregate, floor-micro quantized.
    "q145_jl_project" -> {
      val plane =
        s"((${Hash64.duckSql("CAST(k AS VARCHAR) || '_' || CAST(pr[2] AS VARCHAR)")} % 1000) / 1000.0 - 0.5)"
      val proj =
        s"list_reduce(list_transform(list_zip(ev, range(0, 64)), pr -> pr[1] * $plane), (a, x) -> a + x)"
      s"""WITH b AS (
        |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), ks AS (SELECT unnest(range(0, 16)) AS k)
        |SELECT id, k, CAST(floor($proj * 1000000.0) AS BIGINT) AS v_micro
        |FROM b CROSS JOIN ks""".stripMargin
    },


    "q189_int8_quant" -> graft.similarity.Quantize.quantizeErrorOracleSql(
      "embeddings", "label", "embedding"),


    "q191_covariance" -> graft.similarity.Covariance.covarianceOracleSql(
      "embeddings", "embedding", dim = 64),


    "q192_standardize" -> graft.similarity.Covariance.standardizeOracleSql(
      "embeddings", "vec_id", "embedding"),


    "q198_pca_pc1" -> graft.similarity.Pca.pc1OracleSql(
      "embeddings", "vec_id", "embedding", dim = 64),


    "q375_pca_pc2" -> graft.similarity.Pca.pc2OracleSql(
      "embeddings", "vec_id", "embedding", dim = 64),


    "q199_mahalanobis" -> graft.similarity.Covariance
      .mahalanobisDiagOracleSql("embeddings", "vec_id", "embedding"),
  )
}
