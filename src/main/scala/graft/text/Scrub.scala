package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — a non-negotiable stage of any
  * training-data pipeline: emails, phone numbers and IPv4 addresses are
  * replaced with typed placeholders, and per-document hit counts are kept
  * for audit/routing (e.g. quarantine documents above a PII density
  * threshold).
  *
  * Everything is `regexp_replace`/`regexp_extract_all` — codegen'd, no
  * UDFs, scan-bound at 100 TB. Patterns deliberately use the portable
  * regex subset (character classes, bounded repetition; no lookarounds or
  * backreferences) that Java's engine (Spark) and RE2 (DuckDB) interpret
  * identically, so the whole stage is oracle-checkable (q53). Real-world
  * recall needs richer patterns + ML NER on top; the PLUMBING — order of
  * redaction, counting before replacing, placeholder vocabulary — is what
  * this operator fixes.
  */
object Scrub {

  /** Portable-subset patterns (see class doc). Email before phone: a
    * digit-heavy local-part could otherwise partially match as a phone. */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,6}"
  val ipRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val phoneRe = "[+][0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}"

  def countEmails(c: Column): Column = size(regexp_extract_all(c, lit(emailRe), lit(0)))
  def countIps(c: Column): Column = size(regexp_extract_all(c, lit(ipRe), lit(0)))
  def countPhones(c: Column): Column = size(regexp_extract_all(c, lit(phoneRe), lit(0)))

  /** Redact all three classes (email → ip → phone; counting happens on
    * the ORIGINAL text, so callers must count first — replacing can
    * create or destroy adjacent matches). */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")

  /** Markup strip — the C4-style web-boilerplate stage: drop tags, decode
    * the five XML entities, collapse the whitespace the removals leave.
    * Order is load-bearing: tags first (an entity inside an attribute
    * dies with its tag), `&amp;` LAST among entities (`&amp;lt;` means a
    * literal "&lt;" — decoding `&amp;` first would re-decode it to "<").
    * Same portable regex subset / codegen'd chain as [[scrub]]; identity
    * on markup-free text, so it composes in front of any text operator
    * unconditionally. */
  def stripMarkup(c: Column): Column = {
    val detagged = regexp_replace(c, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(detagged) { case (col0, (ent, ch)) =>
        regexp_replace(col0, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Encoding-corruption signals — the cheap pre-filter for web text
    * whose bytes survived a transcoding accident: UTF-8 read as Latin-1
    * leaves marker characters (Ã, Â, â lead every double-encoded
    * sequence), decoders leave U+FFFD, and binary spill leaves C0
    * control characters. Patterns are spelled with `\x`/`\x{}` ESCAPES,
    * never literal bytes, so the identical pattern string is valid in
    * Java regex and RE2 and survives JSON/SQL transport (a literal NUL
    * in a DuckDB string would be rejected). */
  val mojibakeRe = "[\\xC3\\xC2\\xE2\\x{FFFD}]"
  val controlRe = "[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  private val nonAsciiRe = "[^\\x00-\\x7F]"

  def countMojibake(c: Column): Column =
    size(regexp_extract_all(c, lit(mojibakeRe), lit(0))).cast("long")
  def countControl(c: Column): Column =
    size(regexp_extract_all(c, lit(controlRe), lit(0))).cast("long")

  /** Fraction of ASCII characters, 1.0 for empty text; ONE double
    * division of two exact integers (the cross-engine float recipe). */
  def asciiFraction(c: Column): Column =
    when(length(c) > 0,
      lit(1.0) -
        size(regexp_extract_all(c, lit(nonAsciiRe), lit(0))).cast("double") /
        length(c).cast("double"))
      .otherwise(lit(1.0))

  /** The cleaning sibling: drop C0 control characters (tab/newline/CR
    * survive — they are structure, not corruption). */
  def stripControl(c: Column): Column = regexp_replace(c, controlRe, "")

  /** DuckDB fragments computing the corruption signals identically. */
  def countMojibakeSql(inner: String): String =
    s"CAST(len(regexp_extract_all($inner, '$mojibakeRe')) AS BIGINT)"
  def countControlSql(inner: String): String =
    s"CAST(len(regexp_extract_all($inner, '$controlRe')) AS BIGINT)"
  def asciiFractionSql(inner: String): String =
    s"""CASE WHEN length($inner) > 0
       |  THEN 1.0 - CAST(len(regexp_extract_all($inner, '$nonAsciiRe')) AS DOUBLE)
       |             / CAST(length($inner) AS DOUBLE)
       |  ELSE 1.0 END""".stripMargin

  /** DuckDB fragment computing [[stripMarkup]] identically (regexp_replace
    * needs the 'g' flag — DuckDB replaces first-match by default). */
  def stripMarkupSql(inner: String): String = {
    val detagged = s"regexp_replace($inner, '<[^>]*>', ' ', 'g')"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "''", "&amp;" -> "&")
      .foldLeft(detagged) { case (sql, (ent, ch)) =>
        s"regexp_replace($sql, '$ent', '$ch', 'g')" }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}
