package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline extensions:
  * tokenization, quality scoring, language ID, document fingerprinting.
  *
  * All built from built-in `functions._` expressions — no UDFs, so plans
  * remain declarative and Catalyst-optimizable. Caveat: the higher-order
  * functions used here (`transform`, `filter`, `aggregate`) are
  * *interpreted* expressions in Spark — they evaluate once per document
  * (fine), but must stay out of per-row hot loops; the dedup/similarity
  * operators therefore hash over exploded rows or literal-expanded chains
  * instead of folding arrays per candidate pair (see NearDup/Similarity).
  */
object TextAnalysis {

  /** Lowercase alnum tokens; empty strings (leading separators) dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Token count WITHOUT materializing the token array — the native
    * [[graft.functions.TokenCount]] byte-scan (value-identical to
    * `size(tokens(text))`, which remains the oracle formulation). Use
    * when only the count is needed; when the tokens are already
    * materialized for other columns, `size(toks)` is free. */
  def tokenCount(text: Column): Column =
    graft.functions.TokenCount.tokenCount(text)

  /** GPT-2-style pre-tokenizer pattern, restricted to the Java/RE2-
    * identical subset: contraction suffixes, space-prefixed letter runs,
    * space-prefixed digit runs, space-prefixed punctuation runs,
    * whitespace runs. Two deliberate deviations from the published GPT-2
    * pattern, both for portability: the trailing-space lookahead
    * (`\\s+(?!\\S)`) is dropped (RE2 has no lookarounds), and `\\s` is
    * spelled as the explicit class `[ \\t\\n\\r]` (Java's `\\s` includes
    * `\\x0B`, RE2's does not — the explicit class is the intersection
    * both engines read identically). Alternation order is load-bearing
    * and identical on both engines (leftmost-first). */
  val preTokenRe: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\p{L}\\p{N}]+|[ \\t\\n\\r]+"

  /** Pre-tokenizer unit count — the token-accounting unit that tracks a
    * real BPE vocabulary's pre-tokenization far closer than whitespace
    * or [a-z0-9] word counts (contractions split, punctuation runs and
    * casing count, digits separate). */
  def preTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(preTokenRe), lit(0))).cast("long")

  /** DuckDB mirror of [[preTokenCount]] (single-quote doubling for SQL
    * transport of the contraction apostrophe). */
  def preTokenCountSql(inner: String): String =
    s"CAST(len(regexp_extract_all($inner, '${preTokenRe.replace("'", "''")}')) AS BIGINT)"

  /** Exact average token length: integer sum of lengths / count, derived
    * in doubles (cross-engine exact — see graft.ops.Exact). */
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1))

  /** Ratio of non-alnum, non-space chars (punctuation density). The DuckDB
    * oracle needs the 'g' flag — Spark's regexp_replace is global by default. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1))

  /** Per-language stopword hit count over a token array. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))

  val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val stopEs = Seq("el", "la", "de", "y", "que", "los", "en", "un")
  val stopDe = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit")
  val stopFr = Seq("le", "les", "des", "et", "est", "une", "dans", "pour")

  /** N-gram-free heuristic language ID: stopword-hit argmax with a fixed
    * priority tie-break (en > es > de > fr), `und` (unknown) when no set
    * hits. Deterministic, expressible identically in the DuckDB oracle. */
  def langId(toks: Column): Column = {
    val en = stopwordHits(toks, stopEn)
    val es = stopwordHits(toks, stopEs)
    val de = stopwordHits(toks, stopDe)
    val fr = stopwordHits(toks, stopFr)
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Whitespace-normalized md5 fingerprint (rolling-hash stand-in with a
    * portable oracle; the streaming rolling hash lives in NearDup). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
