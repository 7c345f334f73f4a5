package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier evaluation at corpus scale: ROC AUC and the calibration
  * curve/ECE — the two numbers that decide whether a scoring model
  * (quality classifier, risk score, relevance ranker) is usable, both
  * computed WITHOUT a global sort of the scores.
  *
  * The shared trick is the q84 histogram argument: group by the (integer)
  * score VALUE, and every rank-flavored quantity becomes a cumulative
  * window over the score histogram — bounded by score cardinality, not
  * row count. All counts are exact integers; each final ratio is one
  * fixed IEEE division.
  */
object Eval {

  /** ROC AUC by the Mann-Whitney identity: AUC = P(score⁺ > score⁻)
    * + ½·P(score⁺ = score⁻), computed from the per-score-value
    * (positives, negatives) histogram as
    * `(2·Σ neg_below·pos_at + Σ pos_at·neg_at) / (2·P·N)` — exact
    * integers until the one division. NULL when either class is empty
    * (AUC undefined).
    *
    * @param score integer score column (quantize doubles first — the
    *              resolution knob is the caller's)
    * @param label boolean/0-1 positive indicator
    * @return one row: (n, n_pos, n_neg, auc_num2, auc) —
    *         auc_num2 = 2·P·N·AUC (the exact integer numerator)
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val hist = df
      .select(score.as("__s"), label.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("pos_at"),
        sum(lit(1L) - col("__y")).as("neg_at"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = hist.withColumn("neg_below",
      coalesce(sum(col("neg_at")).over(w), lit(0L)))
    cum.agg(
        sum(col("pos_at") + col("neg_at")).as("n"),
        sum(col("pos_at")).as("n_pos"),
        sum(col("neg_at")).as("n_neg"),
        sum(lit(2L) * col("neg_below") * col("pos_at") +
          col("pos_at") * col("neg_at")).as("auc_num2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("auc_num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg"))))
  }

  /** DuckDB oracle for [[rocAuc]]: `innerSql` yields (s, y). */
  def rocAucOracleSql(innerSql: String): String =
    s"""WITH h AS (
       |  SELECT s, CAST(sum(y) AS BIGINT) AS pos_at,
       |         CAST(sum(1 - y) AS BIGINT) AS neg_at
       |  FROM ($innerSql) WHERE s IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), c AS (
       |  SELECT *, CAST(coalesce(sum(neg_at) OVER (ORDER BY s
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    AS BIGINT) AS neg_below
       |  FROM h
       |)
       |SELECT CAST(sum(pos_at + neg_at) AS BIGINT) AS n,
       |       CAST(sum(pos_at) AS BIGINT) AS n_pos,
       |       CAST(sum(neg_at) AS BIGINT) AS n_neg,
       |       CAST(sum(2 * neg_below * pos_at + pos_at * neg_at) AS BIGINT)
       |         AS auc_num2,
       |       CASE WHEN sum(pos_at) > 0 AND sum(neg_at) > 0 THEN
       |         CAST(sum(2 * neg_below * pos_at + pos_at * neg_at) AS DOUBLE)
       |           / (2.0 * sum(pos_at) * sum(neg_at))
       |       END AS auc
       |FROM c""".stripMargin

  /** Precision/recall/F1 at every decision threshold — the curve that
    * picks the operating point after [[rocAuc]] says the ranking is
    * good. One row per DISTINCT score value t (predict positive at
    * s ≥ t): TP/FP are descending cumulatives over the same score
    * histogram (cardinality-bounded, no global sort); P/R/F1 derive in
    * fixed IEEE sequences.
    *
    * @return (threshold, tp, fp, fn, tn, precision, recall, f1) —
    *         f1 NULL when precision+recall is 0
    */
  def prCurve(df: DataFrame, score: Column, label: Column): DataFrame = {
    val hist = df
      .select(score.as("threshold"), label.cast("long").as("__y"))
      .filter(col("threshold").isNotNull && col("__y").isNotNull)
      .groupBy(col("threshold"))
      .agg(sum(col("__y")).as("pos_at"),
        sum(lit(1L) - col("__y")).as("neg_at"))
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = hist
      .withColumn("tp", sum(col("pos_at")).over(wDesc))
      .withColumn("fp", sum(col("neg_at")).over(wDesc))
      .withColumn("__P", sum(col("pos_at")).over(wAll))
      .withColumn("__N", sum(col("neg_at")).over(wAll))
    val precision = col("tp").cast("double") / (col("tp") + col("fp"))
    val recall = when(col("__P") > 0, col("tp").cast("double") / col("__P"))
    cum
      .withColumn("fn", col("__P") - col("tp"))
      .withColumn("tn", col("__N") - col("fp"))
      .withColumn("precision", precision)
      .withColumn("recall", recall)
      .withColumn("f1",
        when(precision + recall > 0,
          lit(2.0) * precision * recall / (precision + recall)))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("tn"), col("precision"), col("recall"), col("f1"))
  }

  /** DuckDB oracle for [[prCurve]]: `innerSql` yields (s, y). */
  def prCurveOracleSql(innerSql: String): String = {
    val prec = "CAST(tp AS DOUBLE) / (tp + fp)"
    val rec = "CASE WHEN P > 0 THEN CAST(tp AS DOUBLE) / P END"
    s"""WITH h AS (
       |  SELECT s AS threshold, CAST(sum(y) AS BIGINT) AS pos_at,
       |         CAST(sum(1 - y) AS BIGINT) AS neg_at
       |  FROM ($innerSql) WHERE s IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), c AS (
       |  SELECT threshold,
       |    CAST(sum(pos_at) OVER (ORDER BY threshold DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS tp,
       |    CAST(sum(neg_at) OVER (ORDER BY threshold DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS fp,
       |    CAST(sum(pos_at) OVER () AS BIGINT) AS P,
       |    CAST(sum(neg_at) OVER () AS BIGINT) AS N
       |  FROM h
       |)
       |SELECT threshold, tp, fp, P - tp AS fn, N - fp AS tn,
       |       $prec AS precision,
       |       $rec AS recall,
       |       CASE WHEN $prec + $rec > 0 THEN
       |         2.0 * ($prec) * ($rec) / ($prec + $rec)
       |       END AS f1
       |FROM c""".stripMargin
  }

  /** Calibration curve over score bins: per bin, predicted-probability
    * mass vs observed outcome rate, plus each bin's contribution to the
    * Expected Calibration Error `ECE = Σ (n_b/N)·|acc_b − conf_b|` —
    * quantized to exact integer micros per bin so the scalar sums
    * exactly (`Σ ece_q / N / 1e6` downstream).
    *
    * `scoreMicro` is the model's probability in integer micros
    * (0..1e6); bins are equal-WIDTH in probability space (the standard
    * reliability-diagram convention — equal-frequency bins would hide
    * exactly the sparse high-confidence region calibration cares
    * about).
    *
    * @return (bin, n, sum_conf_micro, n_pos, conf, acc, ece_q) per
    *         non-empty bin
    */
  def calibrationCurve(df: DataFrame, scoreMicro: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val binned = df
      .select(scoreMicro.as("__p"), label.cast("long").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      // clamp 1e6 into the top bin: p = 1.0 belongs to [0.9, 1.0]
      .withColumn("bin",
        least(expr(s"(__p * $bins) div 1000000"), lit(bins - 1L)))
    val g = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__p")).as("sum_conf_micro"),
        sum(col("__y")).as("n_pos"))
      .withColumn("conf",
        col("sum_conf_micro").cast("double") / col("n") / lit(1000000.0))
      .withColumn("acc", col("n_pos").cast("double") / col("n"))
    // per-bin ECE contribution in micro units: n_b·|acc − conf| exactly
    // = |n_b·n_pos·1e6 − n_b·sum_conf| / (n_b) scaled — keep integers:
    // |1e6·n_pos − sum_conf| is n_b·1e6·|acc − conf|
    g.withColumn("ece_q",
      abs(lit(1000000L) * col("n_pos") - col("sum_conf_micro")))
  }

  /** DuckDB oracle for [[calibrationCurve]]: `innerSql` yields (p, y). */
  def calibrationOracleSql(innerSql: String, bins: Int = 10): String =
    s"""WITH b AS (
       |  SELECT least((p * $bins) // 1000000, ${bins - 1}) AS bin, p, y
       |  FROM ($innerSql) WHERE p IS NOT NULL AND y IS NOT NULL
       |), g AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(p) AS BIGINT) AS sum_conf_micro,
       |         CAST(sum(y) AS BIGINT) AS n_pos
       |  FROM b GROUP BY 1
       |)
       |SELECT CAST(bin AS BIGINT) AS bin, n, sum_conf_micro, n_pos,
       |       CAST(sum_conf_micro AS DOUBLE) / n / 1000000.0 AS conf,
       |       CAST(n_pos AS DOUBLE) / n AS acc,
       |       CAST(abs(1000000 * n_pos - sum_conf_micro) AS BIGINT)
       |         AS ece_q
       |FROM g""".stripMargin

  /** nDCG@k per query — the GRADED-relevance ranking metric [[rocAuc]]
    * (binary, rank-free) and RBO (relevance-free) both miss: how much of
    * the best achievable discounted gain does the system's ordering
    * capture in the top k?
    *
    * Published DCG divides by `log2(pos+1)` — a float whose last ulp
    * differs across engines. Here the discount is the integer
    * `1e6 // blog(pos+1)` with `blog(x) = length(bin(x)) = ⌊log2 x⌋+1`
    * (the q130 Adamic–Adar bit-length-log device): positions 1 share a
    * discount of 1e6, 2–3 of 5·10⁵, 4–7 of 2.5·10⁵ … — the same
    * staircase coarsening on both the system and the ideal ranking, so
    * the RATIO keeps its meaning while every intermediate is an exact
    * long. Ties: system order breaks by ascending item id (a total
    * order); ideal order by (relevance desc, item) — both engine-stable.
    *
    * Scale shape: two row_number windows keyed by query (per-query
    * fan-out, never global), one keyed aggregation. No collect, no
    * global sort.
    *
    * @param rel graded integer relevance ≥ 0
    * @return per query: (n_items, dcg_q, idcg_q, ndcg) —
    *         ndcg NULL when every item has zero relevance */
  def ndcgAtK(df: DataFrame, queryCol: String, item: Column, rel: Column,
      score: Column, k: Int = 10): DataFrame = {
    require(k >= 1)
    val base = df.select(col(queryCol), item.as("__i"), rel.as("__r"),
        score.as("__s"))
      .filter(col("__i").isNotNull && col("__r").isNotNull &&
        col("__s").isNotNull)
    val wSys = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col("__s").desc, col("__i"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col("__r").desc, col("__i"))
    base
      .withColumn("__ps", row_number().over(wSys).cast("long"))
      .withColumn("__pi", row_number().over(wIdeal).cast("long"))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__ps") <= k,
          col("__r") * expr("1000000 div length(bin(__ps + 1))"))
          .otherwise(0L)).as("dcg_q"),
        sum(when(col("__pi") <= k,
          col("__r") * expr("1000000 div length(bin(__pi + 1))"))
          .otherwise(0L)).as("idcg_q"))
      .withColumn("ndcg",
        when(col("idcg_q") > 0,
          col("dcg_q").cast("double") / col("idcg_q")))
  }

  /** Average Precision at k — the binary-relevance ranking metric
    * completing the retrieval-eval trio ([[ndcgAtK]] graded, MRR
    * first-hit-only; AP integrates precision at EVERY relevant rank,
    * so it rewards packing all relevant items high, not just one):
    * `AP@k = Σ_{i≤k, rel_i} P@i / min(R, k)` with `P@i` the precision
    * at rank i and R the query's total relevant count.
    *
    * Integer contract: each term is the exact micro `cum_i·10⁶ div i`
    * (cum_i = relevant seen through rank i), summed as longs and
    * divided once by `min(R, k)` — the [[ndcgAtK]] staircase doctrine,
    * deterministic on both engines. Ties break (score desc, item asc).
    *
    * Scale shape: one query-keyed row_number window + one keyed
    * aggregation — per-query fan-out, never global.
    *
    * @param rel binary relevance (0/1)
    * @return per query: (n_items, n_rel, ap_micro) — NULL ap when the
    *         query has no relevant item */
  def averagePrecisionAtK(df: DataFrame, queryCol: String, item: Column,
      rel: Column, score: Column, k: Int = 10): DataFrame = {
    require(k >= 1)
    val base = df.select(col(queryCol), item.as("__i"),
        rel.cast("long").as("__r"), score.as("__s"))
      .filter(col("__i").isNotNull && col("__r").isNotNull &&
        col("__s").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col("__s").desc, col("__i"))
    base
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(col("__r")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_items"),
        sum(col("__r")).as("n_rel"),
        sum(when(col("__rn") <= k && col("__r") === 1L,
          expr("__cum * 1000000 div __rn")).otherwise(0L)).as("__ts"))
      .withColumn("ap_micro",
        when(col("n_rel") > 0,
          expr(s"__ts div least(n_rel, CAST($k AS BIGINT))")))
      .drop("__ts")
  }

  /** DuckDB oracle for [[averagePrecisionAtK]]: `innerSql` yields
    * (`qName`, i, r, s). */
  def apOracleSql(innerSql: String, qName: String, k: Int = 10): String =
    s"""WITH b AS (
       |  SELECT $qName, i, r, s FROM ($innerSql)
       |  WHERE i IS NOT NULL AND r IS NOT NULL AND s IS NOT NULL
       |), p AS (
       |  SELECT $qName, r,
       |    CAST(row_number() OVER (PARTITION BY $qName
       |      ORDER BY s DESC, i) AS BIGINT) AS rn,
       |    CAST(sum(r) OVER (PARTITION BY $qName ORDER BY s DESC, i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM b
       |)
       |SELECT $qName, CAST(count(*) AS BIGINT) AS n_items,
       |       CAST(sum(r) AS BIGINT) AS n_rel,
       |       CAST(CASE WHEN sum(r) > 0 THEN
       |         sum(CASE WHEN rn <= $k AND r = 1
       |             THEN cum * 1000000 // rn ELSE 0 END)
       |         // least(sum(r), $k) END AS BIGINT) AS ap_micro
       |FROM p GROUP BY 1""".stripMargin

  /** QINI curve — uplift-model evaluation: targeting the top score
    * tiles, how many INCREMENTAL conversions does treatment buy over
    * the control baseline?
    * `qini(t) = cumPos_T(t) − cumPos_C(t)·cumN_T(t)/cumN_C(t)` per
    * descending score tile. The uplift sibling of [[liftTable]]
    * (response ≠ uplift: a model can rank sure-things high and score
    * zero incremental value — exactly what Qini exposes).
    *
    * Tiles come from the pooled score histogram (both arms share tile
    * boundaries — the q229 convention); all cumulatives are exact
    * longs, each qini value one fixed IEEE sequence.
    *
    * @return per tile: (tile, cum_n_t, cum_pos_t, cum_n_c, cum_pos_c,
    *         qini) — qini NULL while the control cumulative is empty
    */
  def qiniCurve(df: DataFrame, score: Column, treated: Column,
      label: Column, tiles: Int = 10): DataFrame = {
    require(tiles >= 2)
    val hist = df
      .select(score.as("__s"), treated.as("__t"),
        label.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__t").isNotNull &&
        col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("nt_at"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("pt_at"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("nc_at"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("pc_at"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val tiled = hist
      .withColumn("__bef", coalesce(sum(col("n_at")).over(wPrev), lit(0L)))
      .withColumn("__tot", sum(col("n_at")).over(wAll))
      .withColumn("tile",
        least(expr(s"(__bef * $tiles) div __tot"), lit(tiles - 1L)))
    val g = tiled.groupBy(col("tile"))
      .agg(sum(col("nt_at")).as("nt"), sum(col("pt_at")).as("pt"),
        sum(col("nc_at")).as("nc"), sum(col("pc_at")).as("pc"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("tile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    g
      .withColumn("cum_n_t", sum(col("nt")).over(wCum))
      .withColumn("cum_pos_t", sum(col("pt")).over(wCum))
      .withColumn("cum_n_c", sum(col("nc")).over(wCum))
      .withColumn("cum_pos_c", sum(col("pc")).over(wCum))
      .withColumn("qini",
        when(col("cum_n_c") > 0,
          col("cum_pos_t").cast("double") -
            col("cum_pos_c").cast("double") * col("cum_n_t") /
              col("cum_n_c")))
      .select(col("tile"), col("cum_n_t"), col("cum_pos_t"),
        col("cum_n_c"), col("cum_pos_c"), col("qini"))
  }

  /** DuckDB oracle for [[qiniCurve]]: `innerSql` yields (s, t, y). */
  def qiniOracleSql(innerSql: String, tiles: Int = 10): String =
    s"""WITH h AS (
       |  SELECT s, CAST(count(*) AS BIGINT) AS n_at,
       |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt_at,
       |    CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS pt_at,
       |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
       |      AS nc_at,
       |    CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT)
       |      AS pc_at
       |  FROM ($innerSql)
       |  WHERE s IS NOT NULL AND t IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), c AS (
       |  SELECT *,
       |    CAST(coalesce(sum(n_at) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS bef,
       |    CAST(sum(n_at) OVER () AS BIGINT) AS tot
       |  FROM h
       |), g AS (
       |  SELECT CAST(least((bef * $tiles) // tot, ${tiles - 1})
       |           AS BIGINT) AS tile,
       |         CAST(sum(nt_at) AS BIGINT) AS nt,
       |         CAST(sum(pt_at) AS BIGINT) AS pt,
       |         CAST(sum(nc_at) AS BIGINT) AS nc,
       |         CAST(sum(pc_at) AS BIGINT) AS pc
       |  FROM c GROUP BY 1
       |), q AS (
       |  SELECT tile,
       |    CAST(sum(nt) OVER w AS BIGINT) AS cum_n_t,
       |    CAST(sum(pt) OVER w AS BIGINT) AS cum_pos_t,
       |    CAST(sum(nc) OVER w AS BIGINT) AS cum_n_c,
       |    CAST(sum(pc) OVER w AS BIGINT) AS cum_pos_c
       |  FROM g
       |  WINDOW w AS (ORDER BY tile
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT tile, cum_n_t, cum_pos_t, cum_n_c, cum_pos_c,
       |       CASE WHEN cum_n_c > 0 THEN
       |         CAST(cum_pos_t AS DOUBLE)
       |           - CAST(cum_pos_c AS DOUBLE) * cum_n_t / cum_n_c
       |       END AS qini
       |FROM q""".stripMargin

  /** MRR — mean reciprocal rank's per-query ingredient: the rank of the
    * FIRST relevant item in the system ordering, and its reciprocal as
    * the exact integer `1e6 div rank` (micros — so the corpus mean is
    * `Σ rr_micro / n / 1e6`, partition-order-free; a raw `1.0/rank`
    * double sum is not). The "how deep must the user scroll" number
    * [[ndcgAtK]]'s graded sum hides.
    *
    * Queries with NO relevant item are absent from the output (MRR
    * convention: they contribute 0 — count them upstream via the query
    * universe).
    *
    * @return per query: (queryCol, first_rel_rank, rr_micro)
    */
  def mrr(df: DataFrame, queryCol: String, item: Column, rel: Column,
      score: Column): DataFrame = {
    val base = df.select(col(queryCol), item.as("__i"), rel.as("__r"),
        score.as("__s"))
      .filter(col("__i").isNotNull && col("__r").isNotNull &&
        col("__s").isNotNull)
    val wSys = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col("__s").desc, col("__i"))
    base
      .withColumn("__rank", row_number().over(wSys).cast("long"))
      .filter(col("__r") > 0)
      .groupBy(col(queryCol))
      .agg(min(col("__rank")).as("first_rel_rank"))
      .withColumn("rr_micro", expr("1000000 div first_rel_rank"))
  }

  /** DuckDB oracle for [[mrr]]: `innerSql` yields (`qName`, i, r, s). */
  def mrrOracleSql(innerSql: String, qName: String): String =
    s"""WITH b AS (
       |  SELECT $qName, i, r, s FROM ($innerSql)
       |  WHERE i IS NOT NULL AND r IS NOT NULL AND s IS NOT NULL
       |), p AS (
       |  SELECT $qName, r,
       |    CAST(row_number() OVER (PARTITION BY $qName
       |      ORDER BY s DESC, i) AS BIGINT) AS rk
       |  FROM b
       |)
       |SELECT $qName, min(rk) AS first_rel_rank,
       |       CAST(1000000 // min(rk) AS BIGINT) AS rr_micro
       |FROM p WHERE r > 0 GROUP BY 1""".stripMargin

  /** Multi-class confusion matrix with margins and diagonal
    * precision/recall — the sliced view behind every classifier
    * accuracy number (language-ID vs declared language, predicted vs
    * actual segment): WHICH classes bleed into which, not just how
    * often.
    *
    * One contingency aggregation + two margin re-aggregations joined
    * back (aggregate-sized, broadcast); rates are single IEEE divisions
    * of exact counts, populated on diagonal cells (precision/recall are
    * per-CLASS numbers — stamping them on off-diagonal cells would
    * repeat each class's value |classes| times).
    *
    * @return (actual, predicted, n, n_actual, n_predicted, precision,
    *         recall) per observed cell
    */
  def confusionMatrix(df: DataFrame, actual: Column,
      predicted: Column): DataFrame = {
    val cells = df.select(actual.as("actual"), predicted.as("predicted"))
      .filter(col("actual").isNotNull && col("predicted").isNotNull)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    val rowM = cells.groupBy(col("actual"))
      .agg(sum(col("n")).as("n_actual"))
    val colM = cells.groupBy(col("predicted"))
      .agg(sum(col("n")).as("n_predicted"))
    cells.join(broadcast(rowM), "actual")
      .join(broadcast(colM), "predicted")
      .withColumn("precision",
        when(col("actual") === col("predicted"),
          col("n").cast("double") / col("n_predicted")))
      .withColumn("recall",
        when(col("actual") === col("predicted"),
          col("n").cast("double") / col("n_actual")))
  }

  /** DuckDB oracle for [[confusionMatrix]]: `innerSql` yields (a, p). */
  def confusionMatrixOracleSql(innerSql: String): String =
    s"""WITH cells AS (
       |  SELECT a AS actual, p AS predicted,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM ($innerSql) WHERE a IS NOT NULL AND p IS NOT NULL
       |  GROUP BY 1, 2
       |), rm AS (
       |  SELECT actual, CAST(sum(n) AS BIGINT) AS n_actual
       |  FROM cells GROUP BY 1
       |), cm AS (
       |  SELECT predicted, CAST(sum(n) AS BIGINT) AS n_predicted
       |  FROM cells GROUP BY 1
       |)
       |SELECT cells.actual, cells.predicted, n, n_actual, n_predicted,
       |       CASE WHEN cells.actual = cells.predicted
       |         THEN CAST(n AS DOUBLE) / n_predicted END AS precision,
       |       CASE WHEN cells.actual = cells.predicted
       |         THEN CAST(n AS DOUBLE) / n_actual END AS recall
       |FROM cells JOIN rm ON cells.actual = rm.actual
       |          JOIN cm ON cells.predicted = cm.predicted""".stripMargin

  /** Decile lift & cumulative-gains table — the campaign-targeting view
    * of the same histogram [[rocAuc]] folds to one number: per score
    * tile (descending score), the response rate, its LIFT over the base
    * rate, and the cumulative share of all positives captured down to
    * that tile ("mail the top 2 deciles, reach 53 % of responders").
    *
    * Tiles come from the score-value histogram, not a global row sort:
    * a value's tile is where its first row lands in the descending
    * cumulative row count — all rows of one score value share a tile
    * (the q84 tie convention; a row-level ntile would split ties
    * nondeterministically anyway). Rates/lift/gain are fixed IEEE
    * sequences over exact longs.
    *
    * @return per non-empty tile (0 = highest scores):
    *         (tile, n, n_pos, rate, lift, cum_pos, gain)
    */
  def liftTable(df: DataFrame, score: Column, label: Column,
      tiles: Int = 10): DataFrame = {
    require(tiles >= 2)
    val hist = df
      .select(score.as("__s"), label.cast("long").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n_at"), sum(col("__y")).as("pos_at"))
    val wPrev = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val tiled = hist
      .withColumn("__before", coalesce(sum(col("n_at")).over(wPrev), lit(0L)))
      .withColumn("__N", sum(col("n_at")).over(wAll))
      .withColumn("__P", sum(col("pos_at")).over(wAll))
      .withColumn("tile",
        least(expr(s"(__before * $tiles) div __N"), lit(tiles - 1L)))
    val g = tiled.groupBy(col("tile"))
      .agg(sum(col("n_at")).as("n"), sum(col("pos_at")).as("n_pos"),
        max(col("__N")).as("__N"), max(col("__P")).as("__P"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("tile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    val rate = col("n_pos").cast("double") / col("n")
    val baseRate = col("__P").cast("double") / col("__N")
    g
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .withColumn("rate", rate)
      .withColumn("lift", when(col("__P") > 0, rate / baseRate))
      .withColumn("gain",
        when(col("__P") > 0, col("cum_pos").cast("double") / col("__P")))
      .select(col("tile"), col("n"), col("n_pos"), col("rate"),
        col("lift"), col("cum_pos"), col("gain"))
  }

  /** DuckDB oracle for [[liftTable]]: `innerSql` yields (s, y). */
  def liftTableOracleSql(innerSql: String, tiles: Int = 10): String =
    s"""WITH h AS (
       |  SELECT s, CAST(count(*) AS BIGINT) AS n_at,
       |         CAST(sum(y) AS BIGINT) AS pos_at
       |  FROM ($innerSql) WHERE s IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), c AS (
       |  SELECT *,
       |    CAST(coalesce(sum(n_at) OVER (ORDER BY s DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS bef,
       |    CAST(sum(n_at) OVER () AS BIGINT) AS N,
       |    CAST(sum(pos_at) OVER () AS BIGINT) AS P
       |  FROM h
       |), t AS (
       |  -- nn/pp, not N/P: DuckDB identifiers are case-insensitive, so
       |  -- a total aliased N would collide with the per-tile n below
       |  SELECT least((bef * $tiles) // N, ${tiles - 1}) AS tile,
       |         n_at, pos_at, N AS nn, P AS pp
       |  FROM c
       |), g AS (
       |  SELECT CAST(tile AS BIGINT) AS tile,
       |         CAST(sum(n_at) AS BIGINT) AS n,
       |         CAST(sum(pos_at) AS BIGINT) AS n_pos,
       |         max(nn) AS nn, max(pp) AS pp
       |  FROM t GROUP BY 1
       |)
       |SELECT tile, n, n_pos,
       |       CAST(n_pos AS DOUBLE) / n AS rate,
       |       CASE WHEN pp > 0 THEN (CAST(n_pos AS DOUBLE) / n)
       |         / (CAST(pp AS DOUBLE) / nn) END AS lift,
       |       CAST(sum(n_pos) OVER (ORDER BY tile
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS cum_pos,
       |       CASE WHEN pp > 0 THEN CAST(sum(n_pos) OVER (ORDER BY tile
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS DOUBLE) / pp END AS gain
       |FROM g""".stripMargin

  /** DuckDB oracle for [[ndcgAtK]]: `innerSql` yields
    * (`qName`, i, r, s). */
  def ndcgOracleSql(innerSql: String, qName: String, k: Int = 10): String =
    s"""WITH b AS (
       |  SELECT $qName, i, r, s FROM ($innerSql)
       |  WHERE i IS NOT NULL AND r IS NOT NULL AND s IS NOT NULL
       |), p AS (
       |  SELECT $qName, r,
       |    row_number() OVER (PARTITION BY $qName ORDER BY s DESC, i) AS ps,
       |    row_number() OVER (PARTITION BY $qName ORDER BY r DESC, i) AS pi
       |  FROM b
       |), g AS (
       |  SELECT $qName, CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(CASE WHEN ps <= $k
       |      THEN r * (1000000 // length(bin(ps + 1))) ELSE 0 END)
       |      AS BIGINT) AS dcg_q,
       |    CAST(sum(CASE WHEN pi <= $k
       |      THEN r * (1000000 // length(bin(pi + 1))) ELSE 0 END)
       |      AS BIGINT) AS idcg_q
       |  FROM p GROUP BY 1
       |)
       |SELECT $qName, n_items, dcg_q, idcg_q,
       |       CASE WHEN idcg_q > 0
       |         THEN CAST(dcg_q AS DOUBLE) / idcg_q END AS ndcg
       |FROM g""".stripMargin

  /** B-cubed clustering evaluation (Bagga & Baldwin 1998) — the
    * standard extrinsic score for dedup/entity-resolution CLUSTERINGS,
    * where the pair-counting metrics already here (ARI q280, kappa
    * q283) over-weight large clusters: B³ averages per-ITEM precision
    * `|C(i) ∩ G(i)|/|C(i)|` and recall `|C(i) ∩ G(i)|/|G(i)|`, so a
    * mega-cluster error costs exactly its member share.
    *
    * Identity used: every item in contingency cell (c, g) shares
    * P_i = n_cg/n_c and R_i = n_cg/n_g, so
    * `B³P = Σ_cells n_cg²/n_c / N` — one aggregation over the
    * contingency table (cluster-pair-free). Per-cell terms are
    * quantized to exact integer micros (`n_cg²·10⁶ div n_c` — integer
    * division, the ece_q device), so the sums are order-independent
    * longs and the final scores fixed double ratios — hash-portable.
    * Overflow ledger: `n_cg²·10⁶ < 2⁶³` requires cell sizes below
    * ~3·10⁶ items (a single cluster∩gold cell, not the corpus) —
    * beyond that, evaluate on the standard labeled sample.
    *
    * Scale shape: one (cluster, gold) counting aggregation + two
    * keyed size aggregations + keyed joins; everything is contingency-
    * table-sized after the first pass. NULL cluster or gold rows drop.
    *
    * @return one row: (n, p_q, r_q, b3_p, b3_r, b3_f1) — p_q/r_q the
    *         summed integer micro-terms */
  def bCubed(df: DataFrame, clusterCol: String, goldCol: String):
      DataFrame = {
    val base = df
      .filter(col(clusterCol).isNotNull && col(goldCol).isNotNull)
      .select(col(clusterCol).as("__c"), col(goldCol).as("__g"))
    val cells = base.groupBy(col("__c"), col("__g"))
      .agg(count(lit(1)).as("__ncg"))
    val cs = cells.groupBy(col("__c")).agg(sum(col("__ncg")).as("__nc"))
    val gs = cells.groupBy(col("__g")).agg(sum(col("__ncg")).as("__ng"))
    cells.join(cs, "__c").join(gs, "__g")
      .select(
        col("__ncg"),
        expr("__ncg * __ncg * 1000000 div __nc").as("__pq"),
        expr("__ncg * __ncg * 1000000 div __ng").as("__rq"))
      .agg(sum(col("__ncg")).as("n"), sum(col("__pq")).as("p_q"),
        sum(col("__rq")).as("r_q"))
      .withColumn("b3_p",
        col("p_q").cast("double") / col("n") / lit(1000000.0))
      .withColumn("b3_r",
        col("r_q").cast("double") / col("n") / lit(1000000.0))
      .withColumn("b3_f1",
        when(col("b3_p") + col("b3_r") > 0,
          lit(2.0) * col("b3_p") * col("b3_r") /
            (col("b3_p") + col("b3_r"))))
  }

  /** DuckDB oracle for [[bCubed]]: `innerSql` yields (c, g). */
  def bCubedOracleSql(innerSql: String): String =
    s"""WITH cells AS (
       |  SELECT c, g, CAST(count(*) AS BIGINT) AS ncg
       |  FROM ($innerSql) WHERE c IS NOT NULL AND g IS NOT NULL
       |  GROUP BY 1, 2
       |), cs AS (
       |  SELECT c, CAST(sum(ncg) AS BIGINT) AS nc FROM cells GROUP BY 1
       |), gs AS (
       |  SELECT g, CAST(sum(ncg) AS BIGINT) AS ng FROM cells GROUP BY 1
       |), agg AS (
       |  SELECT CAST(sum(ncg) AS BIGINT) AS n,
       |         CAST(sum(ncg * ncg * 1000000 // nc) AS BIGINT) AS p_q,
       |         CAST(sum(ncg * ncg * 1000000 // ng) AS BIGINT) AS r_q
       |  FROM cells JOIN cs USING (c) JOIN gs USING (g)
       |)
       |SELECT n, p_q, r_q,
       |       CAST(p_q AS DOUBLE) / n / 1000000.0 AS b3_p,
       |       CAST(r_q AS DOUBLE) / n / 1000000.0 AS b3_r,
       |       CASE WHEN CAST(p_q AS DOUBLE) / n / 1000000.0
       |               + CAST(r_q AS DOUBLE) / n / 1000000.0 > 0
       |            THEN 2.0 * (CAST(p_q AS DOUBLE) / n / 1000000.0)
       |                     * (CAST(r_q AS DOUBLE) / n / 1000000.0)
       |                 / (CAST(p_q AS DOUBLE) / n / 1000000.0
       |                    + CAST(r_q AS DOUBLE) / n / 1000000.0)
       |            END AS b3_f1
       |FROM agg""".stripMargin

  /** Isotonic calibration of a score against a binary outcome — the
    * CORRECTION the reliability diagram ([[calibrationCurve]]) only
    * diagnoses: the monotone map score-bin → calibrated probability
    * minimizing squared error (the PAV solution, Zadrozny & Elkan
    * 2002), the standard post-hoc calibrator when Platt's sigmoid shape
    * assumption fails.
    *
    * Computed by the minimax identity instead of the sequential
    * pool-adjacent-violators sweep: over the ordered occupied bins,
    * `fitted(i) = max_{j≤i} min_{k≥i} rate(j..k)` with `rate(j,k)` the
    * pooled positive rate of bins j..k — a closed form a declarative
    * plan can state (two windows over the bin-pair frame), where PAVA's
    * data-dependent merge loop cannot.
    *
    * Scale shape: ONE map-side-combinable aggregation touches the
    * corpus (the binning groupBy); everything after operates on the
    * ≤ `bins`-row histogram and its ≤ bins² interval frame — corpus-
    * size-independent, the q84 histogram argument taken to its limit.
    * Rates are one IEEE division of exact long prefix-sum differences,
    * identical on both engines.
    *
    * @param scoreMicro integer micros in [0, 1e6] (the
    *                   [[calibrationCurve]] convention)
    * @return per occupied bin, in bin order: (bin, n, n_pos, rate,
    *         fitted) — `fitted` non-decreasing in `bin`, equal to
    *         `rate` wherever the raw rates are already monotone */
  def isotonicCalibration(df: DataFrame, scoreMicro: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2)
    val g = df
      .select(scoreMicro.as("__p"), label.cast("long").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .withColumn("bin",
        least(expr(s"(__p * $bins) div 1000000"), lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    // Occupied-bin index + inclusive prefix sums (bin-frame-sized).
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val idx = g
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("cn", sum(col("n")).over(wOrd))
      .withColumn("cp", sum(col("n_pos")).over(wOrd))
    // Interval frame: one row per (j ≤ k) with the pooled rate — the
    // ≤ bins² cross join the scale contract prices at a constant.
    val right = idx.select(col("i").as("k"), col("cn").as("cnk"),
      col("cp").as("cpk"))
    val left = idx.select(col("i").as("j"),
      (col("cn") - col("n")).as("cnj0"), (col("cp") - col("n_pos")).as("cpj0"))
    val pairs = left.join(right, col("j") <= col("k"))
      .withColumn("rate_jk",
        (col("cpk") - col("cpj0")).cast("double") /
          (col("cnk") - col("cnj0")).cast("double"))
    // m(j, i) = min over k ≥ i of rate(j..k): right-to-left running min
    // inside each j partition; the row at k = i carries the answer.
    val wMin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("j")).orderBy(col("k").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val m = pairs.withColumn("m_ji", min(col("rate_jk")).over(wMin))
      .select(col("j"), col("k").as("i"), col("m_ji"))
    // fitted(i) = max over j ≤ i — a keyed aggregation, no window.
    val fit = m.groupBy(col("i")).agg(max(col("m_ji")).as("fitted"))
    idx.join(fit, Seq("i"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n")).as("rate"), col("fitted"))
  }

  /** DuckDB oracle for [[isotonicCalibration]]: `innerSql` yields
    * (p, y) in the [[calibrationOracleSql]] convention. */
  def isotonicOracleSql(innerSql: String, bins: Int = 10): String =
    s"""WITH g AS (
       |  SELECT least((p * $bins) // 1000000, ${bins - 1}) AS bin,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(y) AS BIGINT) AS n_pos
       |  FROM ($innerSql) WHERE p IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), idx AS (
       |  SELECT bin, n, n_pos,
       |         CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS i,
       |         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
       |         CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp
       |  FROM g
       |), pairs AS (
       |  SELECT l.i AS j, r.i AS k,
       |         CAST(r.cp - (l.cp - l.n_pos) AS DOUBLE)
       |           / CAST(r.cn - (l.cn - l.n) AS DOUBLE) AS rate_jk
       |  FROM idx l JOIN idx r ON l.i <= r.i
       |), m AS (
       |  SELECT j, k AS i,
       |         min(rate_jk) OVER (PARTITION BY j ORDER BY k DESC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_ji
       |  FROM pairs
       |), fit AS (
       |  SELECT i, max(m_ji) AS fitted FROM m GROUP BY 1
       |)
       |SELECT idx.bin, idx.n, idx.n_pos,
       |       CAST(idx.n_pos AS DOUBLE) / idx.n AS rate, fit.fitted
       |FROM idx JOIN fit ON idx.i = fit.i""".stripMargin
}
