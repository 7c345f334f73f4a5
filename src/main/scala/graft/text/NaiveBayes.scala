package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Trained multinomial Naive Bayes over hashed bag-of-tokens features —
  * the LEARNED classifier between q21's fixed heuristic language ID and
  * a real neural model, and the exact shape fastText's supervised mode
  * reduces to with a linear kernel: per-class token-count tables are
  * the entire model, so training is two aggregations and inference is a
  * broadcast join. The standard use: bootstrap labels from a heuristic
  * or a labeled slice, then classify the whole corpus cheaply.
  *
  * [[Dsir]]'s design carries over wholesale: features hash into
  * `buckets` (2¹² default) so each class model is a fixed-size integer
  * vector — broadcast-size by construction at any corpus size — and
  * scores quantize through the integer bit-length log
  * (`blog(x) = floor(log2 x)+1`), exact on both engines. Per token the
  * class cost is the Laplace-smoothed surprisal
  * `blog(n_c + B) − blog(count_c(bucket)+1)`; a document takes the
  * class minimizing total cost, ties to the smallest label. (Class
  * priors are omitted — at corpus scale the likelihood term dominates
  * and dropping the prior keeps the score a pure content signal; add a
  * per-doc constant `blog(N/N_c)` externally if priors matter.)
  *
  * Plan shape: training = one explode+count (≤ buckets·classes rows →
  * broadcast) + one per-class total; inference = scan + crossJoin with
  * the class list (broadcast, ≤ dozens of rows) + one broadcast join
  * against the count table + one keyed aggregation + one argmin
  * aggregation. No windows, no corpus-sized shuffle beyond the per-doc
  * aggregation.
  *
  * Reference analogue: none — LLM-pipeline surface.
  */
object NaiveBayes {

  private def blog(x: Column): Column = length(bin(x)).cast("long")

  private def tokBuckets(df: DataFrame, textCol: String, buckets: Int,
      units: Column => Column, keep: Column*): DataFrame =
    df.select(keep :+ explode(units(col(textCol))).as("__t"): _*)
      .select(keep :+ (Hash64.hash60(col("__t")) % buckets).as("bkt"): _*)

  /** Train on `train` (labelCol, textCol), classify every `docs` row.
    *
    * @return (idCol, pred_label, cost_bits, n_tokens) — `cost_bits` is
    *         the winning class' total integer surprisal. Zero-token docs
    *         carry no evidence and drop (the [[LangModel.score]]
    *         convention). */
  def trainAndClassify(train: DataFrame, labelCol: String, textCol: String,
      docs: DataFrame, idCol: String, buckets: Int = 4096,
      units: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val counts = tokBuckets(train.select(col(labelCol).as("__lab"),
        col(textCol)), textCol, buckets, units, col("__lab"))
      .groupBy(col("__lab"), col("bkt")).agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("__lab"))
      .agg(sum(col("__c")).as("__nl"))
    val perTok = tokBuckets(docs, textCol, buckets, units, col(idCol))
      .crossJoin(broadcast(totals))
      .join(broadcast(counts), Seq("__lab", "bkt"), "left")
      .select(col(idCol), col("__lab"),
        (blog(col("__nl") + buckets) -
          blog(coalesce(col("__c"), lit(0L)) + 1L)).as("__s"))
    perTok.groupBy(col(idCol), col("__lab"))
      .agg(count(lit(1)).as("__n"), sum(col("__s")).as("__cost"))
      .groupBy(col(idCol))
      .agg(min(struct(col("__cost"), col("__lab"), col("__n"))).as("__b"))
      .select(col(idCol), col("__b.__lab").as("pred_label"),
        col("__b.__cost").as("cost_bits"), col("__b.__n").as("n_tokens"))
  }

  /** DuckDB oracle: `trainSql` must yield (lab, toks), `docsSql`
    * (doc_id, toks); the identical integer recurrence. */
  def classifyOracleSql(trainSql: String, docsSql: String,
      buckets: Int = 4096): String =
    s"""WITH tb AS (
      |  SELECT lab, ${Hash64.duckSql("t")} % $buckets AS bkt
      |  FROM (SELECT lab, unnest(toks) AS t FROM ($trainSql))
      |), db AS (
      |  SELECT doc_id, ${Hash64.duckSql("t")} % $buckets AS bkt
      |  FROM (SELECT doc_id, unnest(toks) AS t FROM ($docsSql))
      |), c AS (SELECT lab, bkt, count(*) AS c FROM tb GROUP BY 1, 2
      |), tot AS (SELECT lab, CAST(count(*) AS BIGINT) AS nl FROM tb GROUP BY 1
      |), sc AS (
      |  SELECT db.doc_id, tot.lab,
      |         CAST(length(bin(tot.nl + $buckets)) AS BIGINT)
      |           - CAST(length(bin(coalesce(c.c, 0) + 1)) AS BIGINT) AS s
      |  FROM db CROSS JOIN tot
      |  LEFT JOIN c ON c.lab = tot.lab AND c.bkt = db.bkt
      |), agg AS (
      |  SELECT doc_id, lab, count(*) AS n, CAST(sum(s) AS BIGINT) AS cost
      |  FROM sc GROUP BY 1, 2
      |), win AS (
      |  SELECT doc_id, lab, cost, n,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY cost, lab) AS rn
      |  FROM agg
      |)
      |SELECT doc_id, lab AS pred_label, cost AS cost_bits,
      |       CAST(n AS BIGINT) AS n_tokens
      |FROM win WHERE rn = 1""".stripMargin
}
