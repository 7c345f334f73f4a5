package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every raw
  * document by how much more likely a TARGET-corpus unigram model finds
  * it than the RAW-corpus model — log w(x) = log p_target(x) − log
  * p_raw(x) under hashed bag-of-tokens models — then keep the
  * target-like mass. This is the standard way to steer a 100 TB crawl
  * toward a small high-quality reference (Wikipedia, books, a curated
  * domain) without a supervised classifier: both models are just
  * count tables.
  *
  * DSIR's hallmark is HASHED features: tokens hash into `buckets`
  * (2¹² here) so the model is a fixed-size integer vector regardless of
  * vocabulary — at scale both models stay broadcast-size by
  * construction, and feature lookup is a join against a ≤`buckets`-row
  * frame. Hashing uses the portable [[Hash64.hash60]] so the oracle
  * recomputes identical bucket ids.
  *
  * SCORE SCALE: same integer bit-length quantization as [[LangModel]]
  * (`blog(x) = length(bin(x))` = floor(log2 x)+1, exact on both
  * engines): per-token log-ratio contribution
  * `blog(c_t(b)+1) − blog(c_r(b)+1)` plus the per-token normalizer
  * difference `blog(n_r + B) − blog(n_t + B)`. Positive total = more
  * target-like than raw-average. Integer end to end — no float logs.
  *
  * Plan shape: one explode+count per model (map-side combined, output
  * ≤ `buckets` rows → broadcast), one-row totals via the sanctioned
  * stat-broadcast idiom, then scoring is a scan + two broadcast joins
  * + one keyed aggregation over the docs being scored.
  *
  * Reference analogue: none — LLM-pipeline surface.
  */
object Dsir {

  /** Integer bit length (see [[LangModel]]'s cross-engine contract). */
  private def blog(x: Column): Column = length(bin(x)).cast("long")

  private def tokBuckets(df: DataFrame, textCol: String, buckets: Int,
      keep: Column*): DataFrame =
    df.select(keep :+ explode(TextAnalysis.tokens(col(textCol))).as("__t"): _*)
      .select(keep :+ (Hash64.hash60(col("__t")) % buckets).as("bkt"): _*)

  /** Importance weights for every `docs` row.
    *
    * @param target reference corpus (same `textCol`) defining the
    *               distribution to steer toward — typically a small,
    *               curated subset
    * @param raw    the background corpus (typically `docs` itself)
    * @return (idCol, n_tokens, logw_bits, kept) — `logw_bits` is the
    *         integer-quantized log importance weight; `kept` flags
    *         docs scoring more target-like than raw-average
    *         (logw_bits ≥ 0 — with target ⊆ raw a maximally target-like
    *         doc's ratio quantizes to exactly 0 bits, so 0 means "as
    *         target-like as the bit resolution can certify", not
    *         neutral). Zero-token docs carry no evidence and
    *         drop (the [[LangModel.score]] convention). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, raw: DataFrame, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val ct = tokBuckets(target, textCol, buckets)
      .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
    val cr = tokBuckets(raw, textCol, buckets)
      .groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
    val totals = ct.agg(sum(col("ct")).as("nt"))
      .crossJoin(cr.agg(sum(col("cr")).as("nr")))
    val perTok = tokBuckets(docs, textCol, buckets, col(idCol))
      .join(broadcast(ct), Seq("bkt"), "left")
      .join(broadcast(cr), Seq("bkt"), "left")
      .select(col(idCol),
        (blog(coalesce(col("ct"), lit(0L)) + 1L) -
          blog(coalesce(col("cr"), lit(0L)) + 1L)).as("s"))
    perTok.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s")).as("bucket_bits"))
      .crossJoin(broadcast(totals)) // one row — the stat-broadcast idiom
      .withColumn("logw_bits",
        col("bucket_bits") + col("n_tokens") *
          (blog(col("nr") + buckets) - blog(col("nt") + buckets)))
      .withColumn("kept", col("logw_bits") >= 0L)
      .select(col(idCol), col("n_tokens"), col("logw_bits"), col("kept"))
  }

  /** DuckDB oracle: `docsSql`/`targetSql`/`rawSql` must each yield
    * (doc_id, toks); the identical integer recurrence. */
  def importanceOracleSql(docsSql: String, targetSql: String,
      rawSql: String, buckets: Int = 4096): String = {
    def bk(src: String) =
      s"""SELECT doc_id, ${Hash64.duckSql("t")} % $buckets AS bkt
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM ($src))""".stripMargin
    s"""WITH tb AS (${bk(targetSql)}
      |), rb AS (${bk(rawSql)}
      |), db AS (${bk(docsSql)}
      |), ct AS (SELECT bkt, count(*) AS ct FROM tb GROUP BY 1
      |), cr AS (SELECT bkt, count(*) AS cr FROM rb GROUP BY 1
      |), tot AS (
      |  SELECT (SELECT count(*) FROM tb) AS nt, (SELECT count(*) FROM rb) AS nr
      |), sc AS (
      |  SELECT db.doc_id,
      |         CAST(length(bin(coalesce(ct.ct, 0) + 1)) AS BIGINT)
      |           - CAST(length(bin(coalesce(cr.cr, 0) + 1)) AS BIGINT) AS s
      |  FROM db LEFT JOIN ct USING (bkt) LEFT JOIN cr USING (bkt)
      |), agg AS (
      |  SELECT doc_id, count(*) AS n_tokens, CAST(sum(s) AS BIGINT) AS bucket_bits
      |  FROM sc GROUP BY 1
      |)
      |SELECT doc_id, n_tokens,
      |       bucket_bits + n_tokens *
      |         (CAST(length(bin(nr + $buckets)) AS BIGINT)
      |          - CAST(length(bin(nt + $buckets)) AS BIGINT)) AS logw_bits,
      |       (bucket_bits + n_tokens *
      |         (CAST(length(bin(nr + $buckets)) AS BIGINT)
      |          - CAST(length(bin(nt + $buckets)) AS BIGINT))) >= 0 AS kept
      |FROM agg, tot""".stripMargin
  }
}
