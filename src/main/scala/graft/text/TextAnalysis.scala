package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Lowercase alnum tokens; empty strings (leading separators) dropped.
    *
    * ASCII-alphabet contract (deliberate, mirrored verbatim by every
    * DuckDB oracle's `[^a-z0-9]+` split): non-ASCII letters act as
    * token SEPARATORS, so `café` tokenizes to `caf` and word-token
    * operators see non-Latin scripts as boundary soup. This is the
    * harness corpus's contract, not a universal tokenizer claim — on
    * real multilingual corpora route through the byte/char-level paths
    * instead (char-shingle minhash q134/q312, char BPE q308/q309,
    * [[graft.functions.NormalizeText]]-composed fingerprints q307),
    * which never split on letter class. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  private val asciiUpper = ('A' to 'Z').mkString
  private val asciiLower = ('a' to 'z').mkString

  /** Unicode LETTER-CLASS word tokenizer — extends the word-level
    * curation family ([[graft.text.Gopher]] rules, token rarity,
    * TF-IDF, bigram coherence) to accented-Latin / Cyrillic / Greek
    * text that [[tokens]]' deliberate ASCII contract reduces to
    * boundary soup. Tokens are maximal runs of `\p{L}\p{M}\p{N}`
    * (letters, combining marks so NFD accents don't split, digits);
    * everything else separates.
    *
    * Portability contract (each choice exists to keep Spark's Java
    * regex and DuckDB's RE2 bit-identical):
    *  - case folding is ASCII-ONLY, via `translate` (a pure codepoint
    *    map on both engines). Full Unicode `lower()` is context- and
    *    library-dependent — Java applies the Greek final-sigma special
    *    case, DuckDB simple-maps — so non-ASCII capitals keep their
    *    case and `Это`/`это` are distinct tokens (documented; callers
    *    wanting aggressive folding normalize upstream);
    *  - `\p{L}/\p{M}/\p{N}` are Unicode general categories in BOTH
    *    Java and RE2 (the [[preTokenRe]] precedent); BMP contract as
    *    everywhere (astral input is byte-identical on both engines but
    *    length-counts differ — the q354 note);
    *  - UNSEGMENTED scripts (CJK) come out as whole letter-runs, not
    *    words — dictionary segmentation is out of scope by design; the
    *    char-level routes (char-shingle minhash q134, char BPE q308,
    *    byte-fallback q356) are the CJK path. A run token is still a
    *    non-empty, honest unit for df/rarity-style statistics. */
  def unicodeTokens(text: Column): Column =
    filter(split(translate(text, asciiUpper, asciiLower),
      "[^\\p{L}\\p{M}\\p{N}]+"), t => t =!= "")

  /** DuckDB fragment mirroring [[unicodeTokens]] over `textExpr` —
    * RE2 reads the identical class spelling. */
  def unicodeToksSql(textExpr: String): String =
    s"list_filter(string_split_regex(translate($textExpr, " +
      s"'$asciiUpper', '$asciiLower'), " +
      "'[^\\p{L}\\p{M}\\p{N}]+'), x -> x <> '')"

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
    * portable oracle; the streaming rolling hash lives in NearDup).
    * On non-ASCII corpora use [[normalizedFingerprint]] — this raw form
    * treats NFC/NFD/fullwidth renderings of the same text as distinct
    * documents. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** [[fingerprint]] composed over Unicode canonicalization
    * ([[graft.functions.NormalizeText]]: NFC + width fold + simple
    * lower) — the C4/CCNet-style first stage that makes byte-distinct
    * renderings of one document dedup together (q307; the raw form is
    * kept as q22's semantics). Same one-pass codegen'd scan shape:
    * normalize_text has an ASCII fast path, so the mostly-ASCII bulk of
    * a web corpus pays one extra byte scan, not a Normalizer call. */
  def normalizedFingerprint(text: Column): Column =
    fingerprint(graft.functions.NormalizeText.normalizeText(text))

  /** Per-document character-distribution entropy — the gibberish /
    * binary-spill / base64-blob detector: natural prose sits in a narrow
    * entropy band, key mashes and encoded blobs sit far above it,
    * aaaa-runs far below.
    *
    * Exact integer formulation (the [[graft.text.LangModel]] bit-length
    * quantization): with per-char counts k and doc total n, the
    * quantized entropy mass is `h_q = Σ_c k_c · (blog(n) − blog(k_c))`
    * where blog(x) = |bin(x)| = ⌊log2 x⌋+1 — order-preserving in the
    * true Σ k·log2(n/k), integer-exact on both engines. Since blog(n)
    * is constant per doc, the identity `h_q = n·blog(n) − Σ k·blog(k)`
    * computes it in ONE aggregation (no per-doc total window);
    * `h_per_char` divides by n in one fixed IEEE step.
    *
    * Plan shape: ONE scan-side projection — the native
    * [[graft.functions.CharEntropyStats]] expression (#10) computes
    * all three integers per row in a single pass (ASCII fast path),
    * so no per-char explode, no (doc, char) shuffle, no rollup exist
    * in the plan at all. [[charEntropyRelational]] keeps the exploded
    * formulation as the oracle mirror and parity reference (measured:
    * 2.07 → ~0.3 s full-materialization at sf0.1).
    *
    * @return (idCol, n_chars_counted, n_distinct_chars, h_q, h_per_char)
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs
      .select(col(idCol), col(textCol).as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col(idCol),
        graft.functions.CharEntropyStats.charEntropyStats(col("__t"))
          .as("__s"))
      .select(col(idCol),
        element_at(col("__s"), 1).as("n_chars_counted"),
        element_at(col("__s"), 2).as("n_distinct_chars"),
        element_at(col("__s"), 3).as("h_q"))
      .withColumn("h_per_char",
        col("h_q").cast("double") / col("n_chars_counted"))

  /** The explode + two-aggregation formulation of [[charEntropy]] —
    * kept as the DuckDB-oracle mirror and the in-plan parity reference
    * for the native expression (#10); value-identical, spec-asserted. */
  def charEntropyRelational(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val blog = (x: Column) => length(bin(x)).cast("long")
    val counts = docs
      .select(col(idCol), col(textCol).as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(1), length(col("__t")))).as("__pos"))
      .select(col(idCol), col("__t").substr(col("__pos"), lit(1)).as("__c"))
      .groupBy(col(idCol), col("__c")).agg(count(lit(1)).as("k"))
    counts
      .groupBy(col(idCol))
      .agg(sum("k").as("n_chars_counted"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("k") * blog(col("k"))).as("__s"))
      .withColumn("h_q",
        col("n_chars_counted") * blog(col("n_chars_counted")) - col("__s"))
      .withColumn("h_per_char",
        col("h_q").cast("double") / col("n_chars_counted"))
      .drop("__s")
  }

  /** DuckDB oracle for [[charEntropy]] over `table(idCol, textCol)`. */
  def charEntropyOracleSql(table: String, idCol: String, textCol: String)
      : String =
    s"""WITH pos AS (
       |  SELECT $idCol, $textCol AS t,
       |         unnest(generate_series(1, length($textCol))) AS p
       |  FROM $table WHERE length($textCol) >= 1
       |), k AS (
       |  SELECT $idCol, substr(t, p, 1) AS c, CAST(count(*) AS BIGINT) AS k
       |  FROM pos GROUP BY 1, 2
       |), g AS (
       |  SELECT $idCol, CAST(sum(k) AS BIGINT) AS n_chars_counted,
       |         CAST(count(*) AS BIGINT) AS n_distinct_chars,
       |         CAST(sum(k * length(bin(k))) AS BIGINT) AS s
       |  FROM k GROUP BY 1
       |)
       |SELECT $idCol, n_chars_counted, n_distinct_chars,
       |       CAST(n_chars_counted * length(bin(n_chars_counted)) - s
       |         AS BIGINT) AS h_q,
       |       CAST(n_chars_counted * length(bin(n_chars_counted)) - s
       |         AS DOUBLE) / n_chars_counted AS h_per_char
       |FROM g""".stripMargin

  /** Flesch-Kincaid grade level from three integer counts — words
    * ([[tokens]] runs), sentences (runs of `[.!?]`, floored at 1), and
    * syllables (vowel-group runs per the standard heuristic: a run of
    * `[aeiouy]` is one syllable nucleus). The classic readability gate a
    * curation pipeline uses to window out both word-salad and
    * legalese-density extremes.
    *
    * Run counting is the collapse-minus-delete identity
    * `|replace(t, pat, "x")| − |replace(t, pat, "")|` — each run
    * contributes exactly one surviving char — which both engines'
    * global regexp_replace compute identically. The grade derives from
    * the three integers in one fixed IEEE sequence
    * (`0.39·w/s + 11.8·y/w − 15.59`); NULL when there are no words.
    *
    * @return (idCol, n_words, n_sentences, n_syllables, fk_grade)
    */
  def readability(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = lower(col(textCol))
    val runs = (pat: String) =>
      (length(regexp_replace(t, pat, "x")) -
        length(regexp_replace(t, pat, ""))).cast("long")
    docs.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_words"),
        greatest(runs("[.!?]+"), lit(1L)).as("n_sentences"),
        runs("[aeiouy]+").as("n_syllables"))
      .withColumn("fk_grade",
        when(col("n_words") > 0,
          lit(0.39) * (col("n_words").cast("double") / col("n_sentences"))
            + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
            - lit(15.59)))
  }

  /** DuckDB oracle for [[readability]]. */
  def readabilityOracleSql(table: String, idCol: String, textCol: String)
      : String = {
    def runs(pat: String) =
      s"""(length(regexp_replace(lower($textCol), '$pat', 'x', 'g'))
         | - length(regexp_replace(lower($textCol), '$pat', '', 'g')))""".stripMargin
    s"""SELECT $idCol,
       |  CAST(len(list_filter(string_split_regex(lower($textCol),
       |    '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_words,
       |  CAST(greatest(${runs("[.!?]+")}, 1) AS BIGINT) AS n_sentences,
       |  CAST(${runs("[aeiouy]+")} AS BIGINT) AS n_syllables,
       |  CASE WHEN len(list_filter(string_split_regex(lower($textCol),
       |    '[^a-z0-9]+'), x -> x <> '')) > 0 THEN
       |    0.39 * (CAST(len(list_filter(string_split_regex(lower($textCol),
       |      '[^a-z0-9]+'), x -> x <> '')) AS DOUBLE)
       |      / greatest(${runs("[.!?]+")}, 1))
       |    + 11.8 * (CAST(${runs("[aeiouy]+")} AS DOUBLE)
       |      / len(list_filter(string_split_regex(lower($textCol),
       |        '[^a-z0-9]+'), x -> x <> '')))
       |    - 15.59
       |  END AS fk_grade
       |FROM $table""".stripMargin
  }
}
