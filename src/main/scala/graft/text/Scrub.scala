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
}
