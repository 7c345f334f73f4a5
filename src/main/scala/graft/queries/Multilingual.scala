package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Gopher, Retrieval, Spans, TextAnalysis}

/** Unicode word segmentation for the word-level curation family
  * (round-9 item 2): the four operators that previously saw the
  * non-Latin fixture docs as empty token lists — Gopher rule gates,
  * token rarity, TF-IDF keywords, bigram coherence — re-run with
  * [[TextAnalysis.unicodeTokens]] (letter-class `\p{L}\p{M}\p{N}`,
  * ASCII-only case fold; portability contract on its scaladoc) over
  * corpus ∪ the multilingual fixture slice. Every query here is GATED
  * on the fixture docs producing non-empty profiles (the oracle
  * compares the fixture rows like any other row; MultilingualSpec
  * additionally pins the exact fixture token lists). The ASCII-contract
  * originals (q364/q74/q102/q96) are unchanged — this module is the
  * multilingual face, not a replacement.
  */
object Multilingual extends QueryModule {

  /** Corpus + the planted multilingual slice (the q356 union shape). */
  private def allDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).documents.select(col("doc_id"), col("text"))
      .unionByName(TextDedup.multilingualPlanted.toDF("doc_id", "text"))
  }

  /** The same union as a DuckDB table expression. */
  private val allDocsSql =
    s"""(SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT * FROM (VALUES ${TextDedup.multilingualPlantedValuesSql})
       |   v(doc_id, text))""".stripMargin

  private val utoks = TextAnalysis.unicodeToksSql("text")

  /** minTokens for the unicode Gopher gate: the fixture docs are one
    * sentence (~6–9 letter-class tokens), so 5 makes r_len a real
    * verdict on them instead of a vacuous fail. */
  private val gopherMinTokens = 5L

  /** q406's mixed-script term list: two Cyrillic terms from the
    * fixture twins + one ASCII corpus term. */
  private val bm25UniTerms = Seq("пример", "текста", "data")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher hard gates with the letter-class tokenizer and the
    // matching Unicode punctuation class: the Cyrillic/Greek/CJK
    // fixture docs now profile n_tokens > 0 and their letters no
    // longer count as "punctuation" (r_stop stays English-stopword by
    // definition — the rule's published form).
    "q388_gopher_unicode" -> ((s, dir) =>
      Gopher.ruleGates(allDocs(s, dir), "doc_id", "text",
        minTokens = gopherMinTokens,
        tokenizer = TextAnalysis.unicodeTokens,
        punctRe = Gopher.unicodePunctRe)),

    // Corpus-relative token rarity over letter-class units: fixture
    // docs get real (n_tokens, df_sum) profiles — their tokens are
    // corpus-hapax, so rarity ≈ 1, the honest verdict for docs the
    // ASCII route scored as token-free.
    "q389_rarity_unicode" -> ((s, dir) =>
      Spans.tokenRarity(allDocs(s, dir), "doc_id", "text",
        TextAnalysis.unicodeTokens)),

    // Per-doc TF-IDF keywords over letter-class units (top-5; the
    // q102 contract otherwise): multilingual docs surface their own
    // script's keywords instead of dropping out.
    "q390_tfidf_unicode" -> ((s, dir) =>
      Retrieval.tfidfKeywords(allDocs(s, dir), "doc_id", "text", 5,
        TextAnalysis.unicodeTokens)),

    // Bigram coherence over letter-class units: word-order signal now
    // defined for accented-Latin/Cyrillic/Greek prose (CJK contributes
    // run-bigrams per the unicodeTokens contract).
    "q391_bigram_unicode" -> ((s, dir) =>
      Spans.bigramCoherence(allDocs(s, dir), "doc_id", "text",
        TextAnalysis.unicodeTokens)),

    // Multilingual decontamination: the q55 n-gram containment check
    // with letter-class units, benchmark = the %11 slice PLUS the
    // Cyrillic fixture doc 9100003. Its near-identical twin 9100004
    // (differs only in final punctuation) sits in the corpus side and
    // MUST flag — the ASCII route tokenizes both to [] and misses the
    // leak by construction (q355's documented contract); this gate
    // proves the unicode route closes it. w = 7 so the 7-token fixture
    // doc contributes a real shingle.
    "q394_decontam_unicode" -> ((s, dir) => {
      import s.implicits._
      val fixture = TextDedup.multilingualPlanted.toDF("doc_id", "text")
      val corpus = Tables(s, dir).documents
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 11 =!= 0)
        .unionByName(fixture.filter(col("doc_id") =!= 9100003L))
      val bench = Tables(s, dir).documents
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 11 === 0)
        .unionByName(fixture.filter(col("doc_id") === 9100003L))
      graft.text.Decontaminate.overlap(corpus, bench, "doc_id", "text",
        w = 7, tokenizer = TextAnalysis.unicodeTokens)
    }),

    // BM25 with the letter-class tokenizer and a MIXED-SCRIPT term
    // list: the Cyrillic terms match the fixture twins (the ASCII
    // route can never match them by construction — its tokenizer
    // reduces Cyrillic to boundary soup), the ASCII term keeps the
    // corpus side scored; both scripts rank in ONE score domain.
    "q406_bm25_unicode" -> ((s, dir) =>
      Retrieval.bm25(allDocs(s, dir), "doc_id", "text", bm25UniTerms,
        tokenizer = TextAnalysis.unicodeTokens)),

    // Exact vocabulary over letter-class units, topN above the corpus
    // type count (~31 ASCII types + the fixture's ~50 unicode types)
    // so every fixture token SURFACES with its exact freq/df — the
    // frequency table a multilingual tokenizer build reads.
    "q407_vocab_unicode" -> ((s, dir) =>
      Spans.vocabulary(allDocs(s, dir), "doc_id", "text", 120,
        TextAnalysis.unicodeTokens)),

    // Tokenizer application over the same 120-entry unicode
    // vocabulary: fixture docs encode to real (pos, id) streams
    // instead of dropping out; OOV stays id 0.
    "q408_token_ids_unicode" -> ((s, dir) =>
      Spans.encodeTokens(allDocs(s, dir), "doc_id", "text", 120,
        TextAnalysis.unicodeTokens)),

    // Corpus bigrams over letter-class units, topN above the corpus
    // bigram type count (~916 ASCII + the fixture's ~40) so the
    // fixture's bigrams surface with exact counts — the multilingual
    // BPE-training inner-loop table.
    "q410_bigrams_unicode" -> ((s, dir) =>
      Spans.topBigrams(allDocs(s, dir), "doc_id", "text", topN = 1200,
        tokenizer = TextAnalysis.unicodeTokens)),

    // Collocations over letter-class units: the Russian twin docs give
    // their within-window pairs c_ab = 2 with hapax-rare unigrams, so
    // the fixture's pairs dominate the log-free PMI ranking — the
    // multilingual word-association signal the ASCII route never sees.
    "q409_collocations_unicode" -> ((s, dir) =>
      Spans.collocations(allDocs(s, dir), "doc_id", "text", window = 3,
        minCount = 2L, topN = 20,
        tokenizer = TextAnalysis.unicodeTokens)),

    // Native #11 `unicode_token_stats` as the oracle-gated route: the
    // letter-class token count + char sum in one scan-side pass (no
    // token-array materialization — the TokenCount relationship,
    // multilingual); DuckDB re-derives both from the array form, so
    // the native expression is value-gated per doc at both SFs.
    "q396_unicode_token_stats" -> ((s, dir) =>
      allDocs(s, dir).select(col("doc_id"),
        graft.functions.UnicodeTokenStats
          .unicodeTokenStats(col("text")).as("__st"))
        .select(col("doc_id"),
          element_at(col("__st"), 1).as("n_tokens"),
          element_at(col("__st"), 2).as("sum_len"))))

  def oracleSql: Map[String, String] = Map(
    "q388_gopher_unicode" -> Gopher.ruleGatesOracleSql(
      allDocsSql, "doc_id", utoks, minTokens = gopherMinTokens,
      punctRe = Gopher.unicodePunctRe),

    // q74's oracle shape over the union with the unicode fragment.
    "q389_rarity_unicode" ->
      s"""WITH t AS (
        |  SELECT doc_id, unnest(toks) AS h
        |  FROM (SELECT doc_id, $utoks AS toks FROM $allDocsSql)
        |), pg AS (
        |  SELECT h, doc_id, count(*) AS k FROM t GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, k, count(*) OVER (PARTITION BY h) AS df FROM pg
        |), nd AS (SELECT count(*) AS n_docs FROM $allDocsSql)
        |SELECT doc_id,
        |       CAST(sum(k) AS BIGINT) AS n_tokens,
        |       CAST(sum(k * df) AS BIGINT) AS df_sum,
        |       1.0 - CAST(sum(k * df) AS DOUBLE)
        |         / CAST(sum(k) * n_docs AS DOUBLE) AS rarity
        |FROM wd, nd GROUP BY doc_id, n_docs""".stripMargin,

    // q102's oracle shape over the union with the unicode fragment.
    "q390_tfidf_unicode" ->
      s"""WITH tf AS (
        |  SELECT token, doc_id, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($utoks) AS token FROM $allDocsSql)
        |  GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, token, tf,
        |         count(*) OVER (PARTITION BY token) AS df
        |  FROM tf
        |), nd AS (SELECT count(*) AS n FROM $allDocsSql),
        |scored AS (
        |  SELECT doc_id, token, tf, df,
        |         CAST(tf AS DOUBLE) * CAST(n AS DOUBLE) / CAST(df AS DOUBLE)
        |           AS score
        |  FROM wd, nd
        |)
        |SELECT doc_id, rn, token, tf, df, score FROM (
        |  SELECT doc_id, token, tf, df, score,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, token) AS BIGINT) AS rn
        |  FROM scored
        |) WHERE rn <= 5""".stripMargin,

    // q96's oracle shape over the union with the unicode fragment.
    "q391_bigram_unicode" ->
      s"""WITH t AS (SELECT doc_id, $utoks AS toks FROM $allDocsSql),
        |p AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i + 1])) AS h
        |  FROM t WHERE len(toks) >= 2
        |), pg AS (
        |  SELECT h, doc_id, count(*) AS k FROM p GROUP BY 1, 2
        |), wd AS (
        |  SELECT doc_id, k, sum(k) OVER (PARTITION BY h) AS cf FROM pg
        |), tot AS (
        |  SELECT CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_total
        |  FROM t
        |)
        |SELECT doc_id,
        |       CAST(sum(k) AS BIGINT) AS n_bigrams,
        |       CAST(sum(k * cf) AS BIGINT) AS cf_sum,
        |       CAST(CAST(sum(k * cf) AS BIGINT) AS DOUBLE)
        |         / (CAST(CAST(sum(k) AS BIGINT) AS DOUBLE)
        |            * CAST(n_total AS DOUBLE)) AS coherence
        |FROM wd, tot GROUP BY doc_id, n_total""".stripMargin,

    // q55's oracle shape with unicode units and the fixture split.
    "q394_decontam_unicode" ->
      s"""WITH fix AS (
        |  SELECT * FROM (VALUES ${TextDedup.multilingualPlantedValuesSql})
        |    v(doc_id, text)
        |), corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL SELECT doc_id, text FROM fix WHERE doc_id <> 9100003
        |), bench_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 11 = 0
        |  UNION ALL SELECT doc_id, text FROM fix WHERE doc_id = 9100003
        |), sh AS (
        |  SELECT doc_id, g FROM (
        |    SELECT doc_id, unnest(list_distinct(
        |      ${graft.dedup.NearDup.duckShinglesSql(7)})) AS g
        |    FROM (SELECT doc_id, $utoks AS toks FROM corpus)
        |  ) WHERE g <> ''
        |), bg AS (
        |  SELECT DISTINCT g FROM (
        |    SELECT unnest(list_distinct(
        |      ${graft.dedup.NearDup.duckShinglesSql(7)})) AS g
        |    FROM (SELECT doc_id, $utoks AS toks FROM bench_docs)
        |  ) WHERE g <> ''
        |)
        |SELECT s.doc_id, count(*) AS n_shared
        |FROM sh s JOIN bg b USING (g)
        |GROUP BY 1""".stripMargin,

    // q56's generated oracle with the unicode fragment over the union.
    "q406_bm25_unicode" -> Retrieval.bm25OracleSql(utoks, bm25UniTerms,
      table = allDocsSql),

    // q78's oracle shape over the union with the unicode fragment.
    "q407_vocab_unicode" ->
      s"""WITH pd AS (
        |  SELECT token, doc_id, count(*) AS k
        |  FROM (SELECT doc_id, unnest($utoks) AS token FROM $allDocsSql)
        |  GROUP BY 1, 2
        |), v AS (
        |  SELECT token, CAST(sum(k) AS BIGINT) AS freq, count(*) AS df
        |  FROM pd GROUP BY 1
        |), top AS (SELECT * FROM v ORDER BY freq DESC, token LIMIT 120)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank,
        |       token, freq, df
        |FROM top""".stripMargin,

    // q100's oracle shape over the union with the unicode fragment.
    "q408_token_ids_unicode" ->
      s"""WITH pd AS (
        |  SELECT token, doc_id, count(*) AS k
        |  FROM (SELECT doc_id, unnest($utoks) AS token FROM $allDocsSql)
        |  GROUP BY 1, 2
        |), v0 AS (
        |  SELECT token, CAST(sum(k) AS BIGINT) AS freq FROM pd GROUP BY 1
        |), top AS (SELECT * FROM v0 ORDER BY freq DESC, token LIMIT 120),
        |v AS (
        |  SELECT token,
        |         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank
        |  FROM top
        |), tok AS (
        |  SELECT doc_id, pr[1] AS token, CAST(pr[2] AS BIGINT) AS pos
        |  FROM (SELECT doc_id, unnest(list_zip(toks, range(0, len(toks)))) AS pr
        |        FROM (SELECT doc_id, $utoks AS toks FROM $allDocsSql))
        |)
        |SELECT t.doc_id, t.pos,
        |       CAST(coalesce(v.rank, 0) AS BIGINT) AS token_id
        |FROM tok t LEFT JOIN v USING (token)""".stripMargin,

    // q92's oracle shape over the union with the unicode fragment.
    "q410_bigrams_unicode" ->
      s"""WITH t AS (SELECT $utoks AS toks FROM $allDocsSql),
        |p AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i + 1])) AS pair
        |  FROM t WHERE len(toks) >= 2),
        |v AS (SELECT pair, count(*) AS freq FROM p GROUP BY 1),
        |top AS (SELECT * FROM v ORDER BY freq DESC, pair LIMIT 1200)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rank,
        |       pair, freq
        |FROM top""".stripMargin,

    // q106's oracle shape over the union with the unicode fragment.
    "q409_collocations_unicode" -> {
      val unions = (1 until 3).map { j =>
        s"""SELECT pr[1] AS a, pr[2] AS b FROM (
           |    SELECT unnest(list_zip(
           |      toks[1:greatest(len(toks) - $j, 0)],
           |      toks[${j + 1}:len(toks)])) AS pr
           |    FROM t WHERE len(toks) >= 2)""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH t AS (SELECT $utoks AS toks FROM $allDocsSql),
        |p AS (
        |  $unions
        |), pc AS (
        |  SELECT a, b, count(*) AS c_ab FROM p GROUP BY 1, 2
        |  HAVING count(*) >= 2
        |), uni AS (
        |  SELECT t2 AS tok, count(*) AS c
        |  FROM (SELECT unnest(toks) AS t2 FROM t) GROUP BY 1
        |), scored AS (
        |  SELECT pc.a, pc.b, pc.c_ab, ua.c AS c_a, ub.c AS c_b,
        |         CAST(pc.c_ab AS DOUBLE)
        |           / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS score
        |  FROM pc JOIN uni ua ON pc.a = ua.tok JOIN uni ub ON pc.b = ub.tok
        |), top AS (
        |  SELECT * FROM scored ORDER BY score DESC, a, b LIMIT 20
        |)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, a, b) AS BIGINT)
        |         AS rank,
        |       a, b, c_ab, c_a, c_b, score
        |FROM top""".stripMargin
    },

    "q396_unicode_token_stats" ->
      s"""SELECT doc_id,
        |       CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(list_sum(list_transform(toks,
        |         t -> length(t))), 0) AS BIGINT) AS sum_len
        |FROM (SELECT doc_id, $utoks AS toks FROM $allDocsSql)""".stripMargin)
}
