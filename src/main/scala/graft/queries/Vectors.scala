package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.NearDup
import graft.multimodal.Media
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Similarity search, near-dup detection and multimodal plumbing.
  * Brute-force cosine is oracle-checked (identical double fold order on
  * both engines); the hash-family operators (MinHash/SimHash/LSH) have no
  * portable SQL equivalent — driver records rows-only checks, exactness is
  * covered by ScalaTest.
  */
object Vectors extends QueryModule {

  private def base(t: Tables): DataFrame =
    t.embeddings.select(col("vec_id").as("id"),
      Similarity.toDouble(col("embedding")).as("ev"))

  private def queriesDf(t: Tables): DataFrame =
    t.embeddings.filter(col("vec_id") < 3).select(col("vec_id").as("qid"),
      Similarity.toDouble(col("embedding")).as("qv"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-k: broadcast queries, scan-bound scoring.
    "q25_cosine_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      Similarity.bruteForceTopK(base(t), queriesDf(t), 5)
    }),

    // ANN scale path: random-hyperplane LSH bucketing + exact rerank.
    "q26_ann_lsh" -> ((s, dir) => {
      val t = Tables(s, dir)
      Similarity.annTopK(base(t), queriesDf(t), dim = 64, k = 5)
    }),

    // MinHash+LSH near-dup: shingle → 16-hash signature → 4×4 banding →
    // bucket-join candidates → signature-agreement estimate.
    "q27_minhash_lsh" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val sig = docs.select(col("doc_id"),
        NearDup.minhashSignature(
          NearDup.shingles(TextAnalysis.tokens(col("text")))).as("sig"))
      val cands = NearDup.lshCandidatePairs(sig, "doc_id", "sig")
      cands
        .join(sig.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sig.as("s2"), col("d2") === col("s2.doc_id"))
        .withColumn("est_jaccard",
          size(filter(zip_with(col("s1.sig"), col("s2.sig"), (x, y) => x === y),
            b => b)).cast("double") / lit(16.0))
        .select(col("d1"), col("d2"), col("est_jaccard"))
    }),

    // SimHash near-dup: 64-bit signature, 16-bit band blocking, hamming gate.
    "q28_simhash" -> ((s, dir) => {
      val sigs = NearDup.simhash(Tables(s, dir).documents, "doc_id", "text")
      NearDup.simhashPairs(sigs, "doc_id", maxHamming = 16)
    }),

    // Embedding near-dup via quantized-vector fingerprint (exact dup after
    // floor(x*1000) quantization; dups injected as in q23).
    "q29_embedding_dupkey" -> ((s, dir) => {
      val e = base(Tables(s, dir))
      val withDupes = e.unionAll(
        e.filter(col("id") % 50 === 0).select((col("id") + 100000).as("id"), col("ev")))
      withDupes
        .withColumn("vkey", md5(concat_ws("_",
          transform(col("ev"), x => floor(x * lit(1000.0)).cast("long").cast("string")))))
        .groupBy(col("vkey"))
        .agg(count(lit(1)).as("n_copies"), min(col("id")).as("id"))
        .filter(col("n_copies") > 1)
    }),

    // Multimodal: binary payload column → per-partition batch decode (stubbed
    // codec, real plumbing) → feature table. Rows-only check + ScalaTest.
    "q30_multimodal" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      Media.decode(Media.syntheticMedia(s, docs)).toDF()
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q25_cosine_topk" ->
      """WITH b AS (
        |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id < 3
        |), sims AS (
        |  SELECT qid, id,
        |         list_reduce(list_transform(list_zip(qv, ev), p -> p[1] * p[2]), (a, v) -> a + v)
        |           / sqrt(list_reduce(list_transform(qv, x -> x * x), (a, v) -> a + v))
        |           / sqrt(list_reduce(list_transform(ev, x -> x * x), (a, v) -> a + v)) AS cosine
        |  FROM b CROSS JOIN q
        |)
        |SELECT qid, id, cosine, rn FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, id) AS BIGINT) AS rn
        |  FROM sims
        |) WHERE rn <= 5""".stripMargin,

    "q29_embedding_dupkey" ->
      """WITH e AS (
        |  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |  FROM embeddings
        |), with_dupes AS (
        |  SELECT * FROM e
        |  UNION ALL
        |  SELECT id + 100000 AS id, ev FROM e WHERE id % 50 = 0
        |), keyed AS (
        |  SELECT id, md5(array_to_string(
        |    list_transform(ev, x -> CAST(CAST(floor(x * 1000.0) AS BIGINT) AS VARCHAR)), '_')) AS vkey
        |  FROM with_dupes
        |)
        |SELECT vkey, count(*) AS n_copies, min(id) AS id
        |FROM keyed GROUP BY 1 HAVING count(*) > 1""".stripMargin,
  )
}
