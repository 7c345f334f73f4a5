package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-token PHRASE blocklist matching — the curation gate behind
  * "drop documents hitting a banned-phrase list" (profanity, boilerplate
  * legalese, licence headers). Single-token blocklists are a trivial
  * `array_intersect`; the operator here matches MULTI-token phrases with
  * exact token-boundary semantics (never a substring `contains`, which
  * false-positives across word boundaries and survives no tokenizer
  * change), in the normalized [[TextAnalysis.tokens]] space so the
  * verdict is case/punctuation-stable.
  *
  * Plan shape: ONE token posexplode; per DISTINCT phrase length L in
  * the list (bounded by the blocklist, not the corpus), doc L-grams
  * come from a bounded L-row window frame and meet the phrase table in
  * a BROADCAST join (the blocklist is kilobytes; the corpus never
  * shuffles on gram content). Per-doc rollup + left join back keeps
  * zero-hit documents in the report — the common case a curation
  * pipeline must pass through untouched.
  *
  * Phrases are tokenized by the SAME tokenizer at plan-build time;
  * phrases that normalize to nothing are dropped. Overlapping and
  * repeated occurrences each count once per starting position.
  */
object Blocklist {

  /** Normalized token form of each phrase, deduplicated. */
  private[text] def phraseTokens(phrases: Seq[String]): Seq[Seq[String]] =
    phrases
      .map(p => p.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .distinct

  /** @return one row per input doc: (idCol, n_hits, n_phrases, blocked)
    *         — n_hits counts every occurrence (all phrases, all start
    *         positions), n_phrases the distinct phrases present */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val plist = phraseTokens(phrases)
    require(plist.nonEmpty, "empty blocklist")
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("i", "tok")))
    val hits = plist.map(_.length).distinct.sorted.map { l =>
      val wf = W.partitionBy(col(idCol)).orderBy(col("i"))
        .rowsBetween(0, l - 1)
      val phraseDf = plist.filter(_.length == l)
        .map(_.mkString(" ")).toDF("phrase")
      tok
        .select(col(idCol),
          concat_ws(" ", collect_list(col("tok")).over(wf)).as("gram"),
          count(lit(1)).over(wf).as("__k"))
        .where(col("__k") === l)
        .join(broadcast(phraseDf), col("gram") === col("phrase"))
        .select(col(idCol), col("phrase"))
    }.reduce(_ unionAll _)
    val perDoc = hits.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("phrase")).as("n_phrases"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"))
      .withColumn("blocked", col("n_hits") > 0L)
  }

  /** DuckDB oracle for [[phraseHits]] — identical token grams per
    * length and the same phrase list. `toksSql` mirrors
    * [[TextAnalysis.tokens]]. */
  def phraseHitsOracleSql(table: String, idName: String, toksSql: String,
      phrases: Seq[String]): String = {
    val plist = phraseTokens(phrases)
    val blocks = plist.map(_.length).distinct.sorted.map { l =>
      val inList = plist.filter(_.length == l)
        .map(p => s"'${p.mkString(" ")}'").mkString(", ")
      s"""SELECT $idName, gram AS phrase FROM (
         |  SELECT $idName,
         |         string_agg(tok, ' ') OVER (PARTITION BY $idName
         |           ORDER BY i ROWS BETWEEN CURRENT ROW AND ${l - 1}
         |           FOLLOWING) AS gram,
         |         count(*) OVER (PARTITION BY $idName ORDER BY i
         |           ROWS BETWEEN CURRENT ROW AND ${l - 1} FOLLOWING) AS k
         |  FROM tok)
         |WHERE k = $l AND gram IN ($inList)""".stripMargin
    }
    s"""WITH src AS (SELECT $idName, $toksSql AS toks FROM $table),
       |tok AS (
       |  SELECT $idName, CAST(pr[2] AS BIGINT) AS i,
       |         CAST(pr[1] AS VARCHAR) AS tok
       |  FROM (SELECT $idName,
       |          unnest(list_zip(toks, range(0, len(toks)))) AS pr
       |        FROM src)
       |  WHERE pr[1] IS NOT NULL
       |), hits AS (
       |${blocks.mkString("\nUNION ALL\n")}
       |), per_doc AS (
       |  SELECT $idName, CAST(count(*) AS BIGINT) AS n_hits,
       |         CAST(count(DISTINCT phrase) AS BIGINT) AS n_phrases
       |  FROM hits GROUP BY 1
       |)
       |SELECT s.$idName, coalesce(n_hits, 0) AS n_hits,
       |       coalesce(n_phrases, 0) AS n_phrases,
       |       coalesce(n_hits, 0) > 0 AS blocked
       |FROM (SELECT $idName FROM $table) s
       |LEFT JOIN per_doc p ON s.$idName = p.$idName""".stripMargin
  }
}
