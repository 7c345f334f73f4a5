package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style RULE gates (Rae et al. 2021 §A1.1 adapted to the
  * harness corpus) — the hard-threshold curation companion to q20's
  * continuous quality score: five named pass/fail rules per document,
  * each decided by INTEGER CROSS-MULTIPLICATION (never a float ratio
  * compare — `5·n_digit ≤ n_tokens` instead of `n_digit/n ≤ 0.2`), so
  * every verdict hash-matches the oracle bit for bit.
  *
  *  - r_len:    minTokens ≤ n_tokens ≤ maxTokens
  *  - r_mean:   3 ≤ mean token length ≤ 10   (3n ≤ Σlen ∧ Σlen ≤ 10n)
  *  - r_digit:  all-digit tokens ≤ 20% of tokens
  *  - r_stop:   ≥ 2 DISTINCT English stopwords present (the Gopher
  *              "contains required words" rule)
  *  - r_punct:  non-alnum-non-space chars ≤ 10% of chars (raw text)
  *
  * The repetition-family Gopher rules (duplicate line/paragraph
  * fractions) are the q54/q136/q81 operators — composed downstream,
  * not duplicated here. One scan-side projection; zero shuffles.
  */
object Gopher {

  /** @return (idCol, n_tokens, sum_len, n_digit, n_stop, n_punct,
    *         n_chars, r_len, r_mean, r_digit, r_stop, r_punct, pass) */
  def ruleGates(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 50L, maxTokens: Long = 100000L): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val base = docs.select(col(idCol), col(textCol).as("__t"),
      toks.as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        aggregate(col("__toks"), lit(0L),
          (a, t) => a + length(t)).as("sum_len"),
        size(filter(col("__toks"), t => t.rlike("^[0-9]+$")))
          .cast("long").as("n_digit"),
        size(array_intersect(array_distinct(col("__toks")),
          array(TextAnalysis.stopEn.map(lit): _*))).cast("long")
          .as("n_stop"),
        (length(col("__t")) -
          length(regexp_replace(col("__t"), "[^a-zA-Z0-9 ]", "")))
          .cast("long").as("n_punct"),
        length(col("__t")).cast("long").as("n_chars"))
    base
      .withColumn("r_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("r_mean",
        lit(3L) * col("n_tokens") <= col("sum_len") &&
          col("sum_len") <= lit(10L) * col("n_tokens"))
      .withColumn("r_digit", lit(5L) * col("n_digit") <= col("n_tokens"))
      .withColumn("r_stop", col("n_stop") >= 2L)
      .withColumn("r_punct", lit(10L) * col("n_punct") <= col("n_chars"))
      .withColumn("pass",
        col("r_len") && col("r_mean") && col("r_digit") &&
          col("r_stop") && col("r_punct"))
  }

  /** DuckDB oracle for [[ruleGates]] — identical counts and
    * cross-multiplied verdicts. `toksSql` mirrors
    * [[TextAnalysis.tokens]]. */
  def ruleGatesOracleSql(table: String, idName: String, toksSql: String,
      minTokens: Long = 50L, maxTokens: Long = 100000L): String = {
    val stop = TextAnalysis.stopEn.map(w => s"'$w'").mkString(", ")
    s"""WITH b AS (
       |  SELECT $idName,
       |         CAST(len(toks) AS BIGINT) AS n_tokens,
       |         CAST(coalesce(list_sum(list_transform(toks,
       |           t -> length(t))), 0) AS BIGINT) AS sum_len,
       |         CAST(len(list_filter(toks,
       |           t -> regexp_full_match(t, '[0-9]+'))) AS BIGINT)
       |           AS n_digit,
       |         CAST(len(list_intersect(list_distinct(toks),
       |           [$stop])) AS BIGINT) AS n_stop,
       |         CAST(length(text) - length(regexp_replace(text,
       |           '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
       |         CAST(length(text) AS BIGINT) AS n_chars
       |  FROM (SELECT $idName, text, $toksSql AS toks FROM $table)
       |)
       |SELECT *,
       |       n_tokens >= $minTokens AND n_tokens <= $maxTokens AS r_len,
       |       3 * n_tokens <= sum_len AND sum_len <= 10 * n_tokens
       |         AS r_mean,
       |       5 * n_digit <= n_tokens AS r_digit,
       |       n_stop >= 2 AS r_stop,
       |       10 * n_punct <= n_chars AS r_punct,
       |       (n_tokens >= $minTokens AND n_tokens <= $maxTokens)
       |         AND (3 * n_tokens <= sum_len AND sum_len <= 10 * n_tokens)
       |         AND (5 * n_digit <= n_tokens)
       |         AND (n_stop >= 2)
       |         AND (10 * n_punct <= n_chars) AS pass
       |FROM b""".stripMargin
  }
}
