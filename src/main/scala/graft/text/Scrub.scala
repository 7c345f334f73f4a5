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
