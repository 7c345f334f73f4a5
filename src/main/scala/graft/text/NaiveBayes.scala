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
  * scores quantize through the QUARTER-BIT integer log [[blog4]]
  * (4·log2 to ±0.25-bit quantization; see its scaladoc for why
  * whole-bit `blog` was not enough), exact on both engines. Per token
  * the class cost is the Laplace-smoothed surprisal
  * `blog4(n_c + B) − blog4(count_c(bucket)+1)` in 4×-scaled bits; a
  * document takes the class minimizing total cost, ties to the
  * smallest label. (Class
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

  /** QUARTER-BIT integer log (round-9 precision upgrade): the whole-bit
    * `blog(x) = ⌊log2 x⌋+1` quantizes each token cost to ±1 bit, and
    * because the `blog(n_c + B)` term is CONSTANT per class, that
    * error is SYSTEMATIC — multiplied by document length it swamped
    * real signals (found by the q399 label-noise gate: a planted
    * 8-token class marker lost to a 58-token doc's quantization bias).
    * `blog4(x) = blog(y⁴) + 4s` with `y = x >> s` normalized to ≤ 15
    * bits (so y⁴ < 2⁶⁰ stays in BIGINT on both engines) is log2 to
    * ~0.25-bit quantization + 2⁻¹⁵ mantissa truncation — pure integer,
    * engine-identical, and scores stay "4×-scaled bits". */
  private def blog4(x: Column): Column = {
    val b = length(bin(x)).cast("long")
    val s = greatest(b - 15L, lit(0L))
    val y = call_function("shiftright", x, s.cast("int"))
    length(bin(y * y * y * y)).cast("long") + lit(4L) * s
  }

  private def blog4Sql(x: String): String = {
    val s = s"greatest(length(bin($x)) - 15, 0)"
    val y = s"(($x) >> CAST($s AS INTEGER))"
    s"(CAST(length(bin($y * $y * $y * $y)) AS BIGINT) + 4 * CAST($s AS BIGINT))"
  }

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
        (blog4(col("__nl") + buckets) -
          blog4(coalesce(col("__c"), lit(0L)) + 1L)).as("__s"))
    perTok.groupBy(col(idCol), col("__lab"))
      .agg(count(lit(1)).as("__n"), sum(col("__s")).as("__cost"))
      .groupBy(col(idCol))
      .agg(min(struct(col("__cost"), col("__lab"), col("__n"))).as("__b"))
      .select(col(idCol), col("__b.__lab").as("pred_label"),
        col("__b.__cost").as("cost_bits"), col("__b.__n").as("n_tokens"))
  }

  /** DuckDB oracle: `trainSql` must yield (lab, toks), `docsSql`
    * (doc_id, toks); the identical integer recurrence. */
  /** LABEL-NOISE audit (the Cleanlab move, NB-powered): k-fold
    * cross-validated self-classification — each document is classified
    * by a model trained on the OTHER folds only (its own label never
    * influences its prediction), and a confident disagreement flags a
    * suspect label. Folds come from the salted-hash bucket (the q43
    * device), so the split is reproducible and engine-portable; the
    * per-fold model is [[trainAndClassify]]'s integer bit-cost NB, so
    * the whole audit stays hash-exact against the oracle.
    *
    * Scale shape: `folds` independent train+classify plans (each one
    * bucket-keyed aggregation + one broadcast model join) unioned —
    * cost is folds × the single-model cost, model size is
    * labels × buckets regardless of corpus. Token-free docs cannot be
    * scored and drop out (documented; they are q19's problem).
    *
    * @return (idCol, fold, label, pred_label, cost_bits, n_tokens,
    *         agree) — one row per scoreable document */
  def labelNoiseAudit(labeled: DataFrame, idCol: String,
      labelCol: String, textCol: String, folds: Int = 3,
      salt: String = "noise", buckets: Int = 4096,
      units: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(folds >= 2, s"folds must be >= 2, got $folds")
    val f = labeled.withColumn("__fold",
      graft.ops.Sampling.hashBucket(col(idCol), salt) % folds)
    val parts = (0 until folds).map { k =>
      trainAndClassify(
        f.filter(col("__fold") =!= k)
          .select(col(labelCol), col(textCol)),
        labelCol, textCol,
        f.filter(col("__fold") === k)
          .select(col(idCol), col(textCol)),
        idCol, buckets, units)
        .withColumn("fold", lit(k.toLong))
    }
    parts.reduce(_ unionByName _)
      .join(labeled.select(col(idCol), col(labelCol).as("label")),
        Seq(idCol))
      .withColumn("agree", col("pred_label") === col("label"))
      .select(col(idCol), col("fold"), col("label"), col("pred_label"),
        col("cost_bits"), col("n_tokens"), col("agree"))
  }

  /** DuckDB oracle for [[labelNoiseAudit]]: `labeledSql` yields
    * (doc_id, lab, toks); fold assignment and the per-fold NB are the
    * [[classifyOracleSql]] chain verbatim. */
  def labelNoiseAuditOracleSql(labeledSql: String, folds: Int = 3,
      salt: String = "noise", buckets: Int = 4096): String = {
    val bucket = graft.ops.Sampling.hashBucketSql("doc_id", salt)
    val perFold = (0 until folds).map { k =>
      val tr = s"SELECT lab, toks FROM lf WHERE fold <> $k"
      val dc = s"SELECT doc_id, toks FROM lf WHERE fold = $k"
      s"SELECT *, CAST($k AS BIGINT) AS fold FROM (\n" +
        classifyOracleSql(tr, dc, buckets) + ")"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH lf AS (
      |  SELECT doc_id, lab, toks, $bucket % $folds AS fold
      |  FROM ($labeledSql)
      |), preds AS (
      |  $perFold
      |)
      |SELECT p.doc_id, p.fold, l.lab AS label, p.pred_label,
      |       p.cost_bits, p.n_tokens, p.pred_label = l.lab AS agree
      |FROM preds p JOIN (SELECT doc_id, lab FROM lf) l USING (doc_id)""".stripMargin
  }

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
      |         ${blog4Sql(s"tot.nl + $buckets")}
      |           - ${blog4Sql("coalesce(c.c, 0) + 1")} AS s
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
