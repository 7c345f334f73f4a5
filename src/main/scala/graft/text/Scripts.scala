package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode SCRIPT-MIX profiling — the multilingual data-quality signal
  * next to [[Scrub]]'s mojibake counters: per document, how much of the
  * letter mass sits in each major script (ASCII Latin, Cyrillic, Greek,
  * Han, Kana), which script dominates, and whether the document is
  * script-MIXED (≥ 2 scripts each holding ≥ 5% of the letters — the
  * homoglyph-spoofing / encoding-accident / code-switching signal
  * curation pipelines route to per-script handling).
  *
  * Counting device: `length(text) − length(regexp_replace(text, cls,
  * ''))` per script class — one projection on the scan, zero shuffles,
  * zero UDFs. BMP-only contract (the q354 fixture convention): Spark
  * `length` counts UTF-16 code units, DuckDB codepoints — equal on the
  * BMP, and astral script profiling is out of contract (documented, not
  * silently wrong: supplementary-plane chars land in `other`).
  * Dominance ties break by the FIXED script order below (a CASE chain,
  * not an argmax over unordered aggregation). The ≥5% presence test is
  * integer cross-multiplication (`20·cnt ≥ letters`).
  */
object Scripts {

  /** (name, Java regex class, RE2/DuckDB regex class) per script. */
  private[text] val classes: Seq[(String, String, String)] = Seq(
    ("latin", "[A-Za-z]", "[A-Za-z]"),
    ("cyrillic", "\\p{IsCyrillic}", "\\p{Cyrillic}"),
    ("greek", "\\p{IsGreek}", "\\p{Greek}"),
    ("han", "\\p{IsHan}", "\\p{Han}"),
    ("kana", "[\\p{IsHiragana}\\p{IsKatakana}]",
      "[\\p{Hiragana}\\p{Katakana}]"))

  /** @return (idCol, n_chars, latin, cyrillic, greek, han, kana,
    *         digits, letters, dominant, n_scripts, mixed) — dominant is
    *         NULL for letterless docs */
  def scriptMix(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    def cnt(cls: String): Column =
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), cls, ""))).cast("long")
    val counted = docs.select(
      col(idCol) +:
        length(col(textCol)).cast("long").as("n_chars") +:
        classes.map { case (n, jcls, _) => cnt(jcls).as(n) } :+
        cnt("[0-9]").as("digits"): _*)
      .withColumn("letters",
        classes.map(c => col(c._1)).reduce(_ + _))
    val g = greatest(classes.map(c => col(c._1)): _*)
    counted
      .withColumn("dominant",
        when(col("letters") > 0L,
          // CASE chain in FIXED order: first script reaching the max
          classes.foldRight(lit(null).cast("string")) {
            case ((n, _, _), rest) =>
              when(col(n) === g, lit(n)).otherwise(rest)
          }))
      .withColumn("n_scripts",
        classes.map(c =>
          when(col(c._1) * 20L >= col("letters") &&
            col(c._1) > 0L, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("mixed", col("n_scripts") >= 2L)
  }

  /** Script-RUN profile — the CODE-SWITCHING intensity signal on top
    * of [[scriptMix]]'s mass counts: compact the text to its letter
    * characters only (so word boundaries don't fake alternation), then
    * count maximal same-script runs per script with the
    * collapse-minus-delete identity (`|replace(t, cls+, "x")| −
    * |replace(t, cls+, "")|` — each run survives as one char, the
    * q178 device). `switches = total_runs − 1` is the number of script
    * alternations a reader crosses; density divides by letters in
    * integer micros. Same per-row regex projection shape as scriptMix:
    * zero shuffles, BMP contract (astral chars drop from the compact).
    *
    * @return (idCol, letters, runs_latin..runs_kana, total_runs,
    *         switches, switch_density_micro) */
  def scriptRuns(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val keepJava = "[^A-Za-z\\p{IsCyrillic}\\p{IsGreek}\\p{IsHan}" +
      "\\p{IsHiragana}\\p{IsKatakana}]"
    val compact = regexp_replace(col(textCol), keepJava, "")
    def runs(cls: String): Column =
      (length(regexp_replace(compact, cls + "+", "x")) -
        length(regexp_replace(compact, cls + "+", ""))).cast("long")
    docs.select(
        col(idCol) +:
          length(compact).cast("long").as("letters") +:
          classes.map { case (n, jcls, _) => runs(jcls).as(s"runs_$n") }: _*)
      .withColumn("total_runs",
        classes.map(c => col(s"runs_${c._1}")).reduce(_ + _))
      .withColumn("switches",
        greatest(col("total_runs") - 1L, lit(0L)))
      .withColumn("switch_density_micro",
        expr("switches * 1000000 div greatest(letters, 1)"))
  }

  /** DuckDB oracle for [[scriptRuns]] — RE2 spellings, same identity. */
  def scriptRunsOracleSql(table: String, idName: String): String = {
    val keepRe2 = "[^A-Za-z\\p{Cyrillic}\\p{Greek}\\p{Han}" +
      "\\p{Hiragana}\\p{Katakana}]"
    val compact = s"regexp_replace(text, '$keepRe2', '', 'g')"
    def runs(cls: String): String =
      s"""CAST(length(regexp_replace($compact, '$cls+', 'x', 'g'))
         | - length(regexp_replace($compact, '$cls+', '', 'g')) AS BIGINT)"""
        .stripMargin.replace("\n", "")
    val runCols = classes.map { case (n, _, rcls) =>
      s"${runs(rcls)} AS runs_$n"
    }.mkString(",\n       |       ")
    val total = classes.map(c => s"runs_${c._1}").mkString(" + ")
    s"""WITH c AS (
       |  SELECT $idName,
       |       CAST(length($compact) AS BIGINT) AS letters,
       |       $runCols
       |  FROM $table
       |), t AS (
       |  SELECT *, CAST($total AS BIGINT) AS total_runs FROM c
       |)
       |SELECT *, greatest(total_runs - 1, 0) AS switches,
       |       greatest(total_runs - 1, 0) * 1000000
       |         // greatest(letters, 1) AS switch_density_micro
       |FROM t""".stripMargin
  }

  /** DuckDB oracle for [[scriptMix]] — identical counts via the RE2
    * class spellings, same fixed-order dominance and 5% test. */
  def scriptMixOracleSql(table: String, idName: String): String = {
    def cnt(cls: String): String =
      s"CAST(length(text) - length(regexp_replace(text, '$cls', '', 'g')) AS BIGINT)"
    val counts = classes.map { case (n, _, rcls) =>
      s"${cnt(rcls)} AS $n"
    }.mkString(",\n       |       ")
    val letters = classes.map(_._1).mkString(" + ")
    val g = s"greatest(${classes.map(_._1).mkString(", ")})"
    val domChain = classes.reverse.foldLeft("NULL") { case (rest, (n, _, _)) =>
      s"CASE WHEN $n = $g THEN '$n' ELSE $rest END"
    }
    val nScripts = classes.map(c =>
      s"(CASE WHEN ${c._1} * 20 >= $letters AND ${c._1} > 0 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT $idName, CAST(length(text) AS BIGINT) AS n_chars,
       |       $counts,
       |       ${cnt("[0-9]")} AS digits
       |  FROM $table
       |), l AS (
       |  SELECT *, CAST($letters AS BIGINT) AS letters FROM c
       |)
       |SELECT $idName, n_chars, ${classes.map(_._1).mkString(", ")},
       |       digits, letters,
       |       CASE WHEN letters > 0 THEN $domChain END AS dominant,
       |       CAST($nScripts AS BIGINT) AS n_scripts,
       |       $nScripts >= 2 AS mixed
       |FROM l""".stripMargin
  }
}
