package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Sub-document segmentation operators: the unit between the token
  * ([[Spans]], [[TextAnalysis]]) and the whole document ([[NearDup]]).
  * Public pipeline recipes (C4, CCNet, Dolma) clean and deduplicate at
  * LINE/PARAGRAPH granularity — a page with one boilerplate nav bar and
  * one good paragraph should lose the nav bar, not the page — and train
  * at CHUNK granularity (fixed token windows with overlap).
  *
  * Segmentation here is token-span based (`per` consecutive tokens = one
  * line): the harness corpus is single-line text, and a span segmenter
  * exercises the identical downstream plumbing (filter, dedup,
  * reassembly) with a DuckDB-expressible unit boundary. Real newline
  * corpora swap [[newlineSegments]] in — the downstream operators
  * consume the segment arrays, not the segmentation rule.
  *
  * Plan shapes (the 100 TB contract):
  *  - [[lineFilterDocs]] and [[chunkWithStride]] are pure per-row
  *    projections — ZERO shuffles, fully codegen'd, scan-bound.
  *  - [[lineDedupDocs]] is explode → one window over the line-hash key →
  *    per-doc re-aggregation: two keyed shuffles, no join-back, and the
  *    window partition for a line is bounded by its duplicate
  *    multiplicity, never by corpus size.
  *
  * No integer division anywhere: `sequence(0, n−1, step)` already stops
  * at the largest multiple ≤ n−1 (as does DuckDB `generate_series`), so
  * start offsets never pass through a quotient that could diverge
  * cross-engine.
  */
object Segments {

  /** Lines as arrays-of-tokens: element i = tokens [i·per, i·per+per).
    * `toks` MUST be a materialized column reference (project first) —
    * lambda bodies referencing an expression subtree re-evaluate it per
    * element (the round-4 shingle blowup); an attribute deref is free. */
  def lineArrays(toks: Column, per: Int): Column = {
    require(per >= 1, s"per must be >= 1, got $per")
    when(size(toks) > lit(0),
      transform(
        sequence(lit(0L), (size(toks) - lit(1)).cast("long"), lit(per.toLong)),
        i => slice(toks, (i + lit(1L)).cast("int"), lit(per))))
      .otherwise(array().cast("array<array<string>>"))
  }

  /** Newline segmenter for real multi-line corpora: whitespace-trimmed
    * (regex — Spark's `trim` strips only 0x20 spaces, not tabs), blank
    * lines dropped. Same downstream contract as [[lineArrays]] but each
    * element is the raw line string. */
  def newlineSegments(text: Column): Column =
    filter(
      transform(split(text, "\n"),
        l => regexp_replace(l, "^\\s+|\\s+$", "")),
      l => l =!= "")

  /** C4-style line-level quality filter, reassembled per document: a line
    * survives when it has ≥ `minTokens` tokens AND contains at least one
    * word from `mustContain` (the span-segmentation analogue of C4's
    * "≥ 5 words and ends in terminal punctuation" — the harness tokenizer
    * strips punctuation, so the natural-language signal here is a
    * stopword hit). Kept lines rejoin in original order; fully-filtered
    * documents survive with empty text (drop on `n_kept = 0` downstream —
    * the caller owns the document-level verdict).
    *
    * Zero shuffles: every column derives per-row from the token array.
    *
    * @return (idCol, n_lines, n_kept, kept_text) */
  def lineFilterDocs(docs: DataFrame, idCol: String, textCol: String,
      per: Int, minTokens: Int,
      mustContain: Seq[String] = TextAnalysis.stopEn): DataFrame = {
    val kept = filter(col("__lines"), a =>
      size(a) >= minTokens &&
        arrays_overlap(a, lit(mustContain.toArray)))
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), lineArrays(col("__toks"), per).as("__lines"))
      .select(col(idCol), col("__lines"), kept.as("__kept"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(flatten(col("__kept")), " ").as("kept_text"))
  }

  /** Corpus-wide line-level dedup (the CCNet/Dolma paragraph-dedup
    * semantics): every duplicate line keeps ONLY its first occurrence in
    * (idCol, line-index) order; documents reassemble from their surviving
    * lines in original order. Catches shared boilerplate that
    * whole-document near-dup never fires on.
    *
    * Lines travel hashed ([[Hash64.hash60]] — 8 bytes on the shuffle wire
    * instead of a ~per·7-char string; portable, so the oracle computes
    * identical keys; a 2⁻⁶⁰ collision drops one unique line). First-wins
    * is a `row_number` window over the hash — partition size = duplicate
    * multiplicity of that line, so the plan scales with dup density, not
    * corpus size.
    *
    * @return (idCol, n_lines, n_kept, kept_text) */
  def lineDedupDocs(docs: DataFrame, idCol: String, textCol: String,
      per: Int): DataFrame = {
    // posexplode_OUTER: a zero-token document must survive with
    // (n_lines = 0, kept_text = "") like lineFilterDocs's contract, not
    // vanish — the null-line rows it emits are excluded from every
    // aggregate below (and share one harmless null hash partition).
    val exploded = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode_outer(lineArrays(col("__toks"), per)).as(Seq("idx", "toks")))
      .select(col(idCol), col("idx"),
        array_join(col("toks"), " ").as("line"))
    val firstWins = exploded.withColumn("__rn",
      row_number().over(Window.partitionBy(Hash64.hash60(col("line")))
        .orderBy(col(idCol), col("idx"))))
    val keep = col("line").isNotNull && col("__rn") === 1
    firstWins.groupBy(col(idCol))
      .agg(count(col("line")).as("n_lines"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(keep, struct(col("idx"), col("line"))))),
            x => x.getField("line")),
          " ").as("kept_text"))
  }

  /** WITHIN-document line dedup (self-repetition removal): a duplicate
    * line keeps only its first occurrence INSIDE its own document —
    * the repeated-paragraph pathology (scraper loops, templated
    * listings, chat transcripts quoting themselves) that corpus-wide
    * [[lineDedupDocs]] also catches but only by paying a corpus-keyed
    * shuffle. Self-repetition needs no cross-document state, so this
    * form is ZERO-shuffle: the first-occurrence test is a pure array
    * expression (`array_position` over the line prefix), scan-bound at
    * any corpus size. Quadratic only in lines-per-document (tens), not
    * corpus size.
    *
    * @return (idCol, n_lines, n_kept, kept_text) — [[lineDedupDocs]]'s
    *         contract, so the two compose/swap freely */
  def lineDedupWithinDoc(docs: DataFrame, idCol: String, textCol: String,
      per: Int): DataFrame = {
    val lines = transform(
      lineArrays(TextAnalysis.tokens(col(textCol)), per),
      a => array_join(a, " "))
    docs
      .select(col(idCol), lines.as("__lines"))
      .select(col(idCol), col("__lines"),
        filter(col("__lines"), (x, i) =>
          array_position(slice(col("__lines"), lit(1), i), x) === 0)
          .as("__kept"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("kept_text"))
  }

  /** Per-source boilerplate-line report: lines present in at least
    * `minFrac` of a source's documents (and ≥ 2 of them) — navigation
    * headers, footers, cookie banners: the template text that repeats
    * WITHIN a site but is unique enough corpus-wide that whole-document
    * near-dup never fires. [[lineDedupDocs]] keeps a duplicate line's
    * first occurrence; this op instead NAMES the offenders per source so
    * a pipeline can strip them everywhere (C4's heuristic cousin).
    *
    * Plan: one (source, line) distinct-doc count + the source-sized doc
    * count joined in (source cardinality ≪ corpus — broadcast). Lines
    * travel as text because the report emits them; the dedup transform
    * is where the hashed-wire optimization lives.
    *
    * @return (srcCol, line, line_df, n_docs, doc_frac) */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, per: Int, minFrac: Double): DataFrame = {
    val lines = docs
      .select(col(idCol), col(srcCol),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col(srcCol),
        explode(lineArrays(col("__toks"), per)).as("__ltoks"))
      .select(col(idCol), col(srcCol),
        array_join(col("__ltoks"), " ").as("line"))
    val nDocs = docs.groupBy(col(srcCol))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    lines.groupBy(col(srcCol), col("line"))
      .agg(countDistinct(col(idCol)).as("line_df"))
      .join(broadcast(nDocs), srcCol)
      .filter(col("line_df") >= lit(2L) &&
        col("line_df").cast("double") >=
          lit(minFrac) * col("n_docs").cast("double"))
      .select(col(srcCol), col("line"), col("line_df"), col("n_docs"),
        (col("line_df").cast("double") / col("n_docs").cast("double"))
          .as("doc_frac"))
  }

  /** SHARED-LINE pair report: document pairs sharing at least
    * `minShared` distinct `per`-token lines — line-level plagiarism/
    * syndication detection, stricter than token-set Jaccard (q24
    * matches vocabulary; this matches verbatim passages) and
    * pair-attributing where corpus-wide line dedup (q81) only drops.
    *
    * Scale shape: per-doc DISTINCT line hashes, a line-keyed self-join
    * whose fan-out is the line's duplicate multiplicity (the q81
    * bound — cap ubiquitous lines upstream with [[boilerplateLines]]),
    * one pair aggregation.
    *
    * @return (d1, d2, n_shared) — d1 < d2, n_shared ≥ minShared
    */
  def sharedLinePairs(docs: DataFrame, idCol: String, textCol: String,
      per: Int, minShared: Long = 2L): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("__id"),
        explode(lineArrays(col("__toks"), per)).as("__ltoks"))
      .select(col("__id"),
        Hash64.hash60(array_join(col("__ltoks"), " ")).as("__lh"))
      .distinct()
    lines.as("a").join(lines.as("b"),
        col("a.__lh") === col("b.__lh") &&
          col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("d1"), col("b.__id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB oracle for [[sharedLinePairs]]: `docsTokSql` yields
    * (`idName`, toks). */
  def sharedLinePairsOracleSql(docsTokSql: String, idName: String,
      per: Int, minShared: Long = 2L): String =
    s"""WITH t AS ($docsTokSql),
       |s AS (
       |  SELECT $idName,
       |         unnest(generate_series(0, len(toks) - 1, $per)) AS st,
       |         toks
       |  FROM t WHERE len(toks) > 0),
       |d AS (
       |  SELECT DISTINCT $idName,
       |         ${Hash64.duckSql(
            s"array_to_string(list_slice(toks, st + 1, st + $per), ' ')")}
       |           AS lh
       |  FROM s)
       |SELECT a.$idName AS d1, b.$idName AS d2,
       |       CAST(count(*) AS BIGINT) AS n_shared
       |FROM d a JOIN d b ON a.lh = b.lh AND a.$idName < b.$idName
       |GROUP BY 1, 2
       |HAVING count(*) >= $minShared""".stripMargin

  /** Boilerplate REMOVAL — the transform [[boilerplateLines]] only
    * reports: rewrite each document dropping lines whose per-source
    * document frequency crosses `minFrac` (nav bars, footers, cookie
    * banners — the CCNet/Dolma pre-dedup cleanup). Unlike
    * [[lineDedupDocs]] (first occurrence SURVIVES), template lines are
    * dropped from EVERY document including the first — a nav bar is
    * noise everywhere.
    *
    * Scale shape: the detection aggregation (line-keyed, map-side
    * combinable), then the small high-df line set broadcast against the
    * exploded corpus, one per-doc reassembly aggregation. Zero-token
    * documents survive with empty text (the [[lineFilterDocs]]
    * contract).
    *
    * @return (idCol, n_lines, n_kept, kept_text)
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, per: Int, minFrac: Double): DataFrame = {
    val bp = boilerplateLines(docs, idCol, textCol, srcCol, per, minFrac)
      .select(col(srcCol).as("__bsrc"), col("line").as("__bline"))
    val exploded = docs
      .select(col(idCol), col(srcCol),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col(srcCol),
        posexplode_outer(lineArrays(col("__toks"), per))
          .as(Seq("idx", "toks")))
      .select(col(idCol), col(srcCol), col("idx"),
        array_join(col("toks"), " ").as("line"))
    val flagged = exploded.join(broadcast(bp),
      col(srcCol) === col("__bsrc") && col("line") === col("__bline"),
      "left")
    val keep = col("line").isNotNull && col("__bline").isNull
    flagged.groupBy(col(idCol))
      .agg(count(col("line")).as("n_lines"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(keep, struct(col("idx"), col("line"))))),
            x => x.getField("line")),
          " ").as("kept_text"))
  }

  /** DuckDB oracle for [[removeBoilerplate]]: `docsTokSql` yields
    * (`idName`, `srcName`, toks). */
  def removeBoilerplateOracleSql(docsTokSql: String, idName: String,
      srcName: String, per: Int, minFrac: Double): String =
    s"""WITH t AS ($docsTokSql),
       |s AS (
       |  SELECT $idName, $srcName,
       |         unnest(generate_series(0, len(toks) - 1, $per)) AS st,
       |         toks
       |  FROM t WHERE len(toks) > 0),
       |d AS (
       |  SELECT $idName, $srcName, st,
       |         array_to_string(list_slice(toks, st + 1, st + $per), ' ')
       |           AS line
       |  FROM s),
       |nd AS (
       |  SELECT $srcName, CAST(count(DISTINCT $idName) AS BIGINT)
       |           AS n_docs
       |  FROM t GROUP BY 1),
       |bp AS (
       |  SELECT d.$srcName, line
       |  FROM (SELECT $srcName, line,
       |          CAST(count(DISTINCT $idName) AS BIGINT) AS line_df
       |        FROM d GROUP BY 1, 2) d
       |  JOIN nd ON d.$srcName = nd.$srcName
       |  WHERE line_df >= 2
       |    AND CAST(line_df AS DOUBLE) >= $minFrac * CAST(n_docs AS DOUBLE)),
       |r AS (
       |  SELECT d.$idName, d.st, d.line,
       |         bp.line IS NOT NULL AS isbp
       |  FROM d LEFT JOIN bp
       |    ON d.$srcName = bp.$srcName AND d.line = bp.line),
       |g AS (
       |  SELECT $idName,
       |         count(*) AS n_lines,
       |         CAST(sum(CASE WHEN NOT isbp THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_kept,
       |         coalesce(string_agg(CASE WHEN NOT isbp THEN line END,
       |           ' ' ORDER BY st), '') AS kept_text
       |  FROM r GROUP BY 1)
       |SELECT t.$idName,
       |       CAST(coalesce(g.n_lines, 0) AS BIGINT) AS n_lines,
       |       CAST(coalesce(g.n_kept, 0) AS BIGINT) AS n_kept,
       |       coalesce(g.kept_text, '') AS kept_text
       |FROM t LEFT JOIN g USING ($idName)""".stripMargin

  /** Sliding-window token chunking for training-sequence prep: windows of
    * `chunkSize` tokens starting every `stride` tokens (overlap =
    * chunkSize − stride). Start offsets are the multiples of `stride`
    * kept while the PREVIOUS window hadn't already reached the document
    * end — full coverage, exactly one possibly-short tail window, no
    * nested suffixes (padding is the packer's job, q67). With
    * `stride > chunkSize` this degrades gracefully to gap-sampling:
    * every stride offset emits a window.
    *
    * Pure projection + generator: zero shuffles, scan-bound.
    *
    * @return (idCol, chunk_idx, start_off, n_tokens, chunk_text) */
  def chunkWithStride(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame =
    chunkedTokens(docs, idCol, textCol, chunkSize, stride)
      .select(col(idCol), col("chunk_idx"), col("start_off"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))

  /** [[chunkWithStride]] stopped before the text re-join: one row per
    * chunk with the token ARRAY (`__chunk`) — for consumers that work
    * on tokens ([[languageMix]]), skipping a join-then-re-split
    * round-trip over the corpus. Same zero-shuffle plan. */
  private[text] def chunkedTokens(docs: DataFrame, idCol: String,
      textCol: String, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1,
      s"chunkSize/stride must be >= 1, got $chunkSize/$stride")
    val n = size(col("__toks"))
    val starts = filter(
      when(n > lit(0),
        sequence(lit(0L), (n - lit(1)).cast("long"), lit(stride.toLong)))
        .otherwise(array().cast("array<long>")),
      st => st === lit(0L) ||
        st + lit((chunkSize - stride).toLong) < n.cast("long"))
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(starts).as(Seq("chunk_idx", "start_off")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_off"),
        slice(col("__toks"), (col("start_off") + lit(1L)).cast("int"),
          lit(chunkSize)).as("__chunk"))
  }

  /** Segment-level language mixing (code-switching detector): documents
    * that LOOK like one language at whole-doc granularity (q21) can be
    * half-and-half at segment granularity — public pipelines run
    * language ID per paragraph for exactly this reason (a mixed doc
    * pollutes whichever monolingual bucket it lands in). Chunk into
    * non-overlapping `segTokens`-token segments ([[chunkWithStride]] —
    * zero shuffles), language-ID each segment
    * ([[TextAnalysis.langId]] on the already-normalized chunk tokens),
    * then fold to a per-doc profile. Two keyed aggregations; the mode
    * window partitions by doc over ≤ |langs| rows.
    *
    * `n_langs` counts distinct segment verdicts INCLUDING 'und' —
    * an unidentifiable segment inside an English doc is itself a
    * mixing signal (code blocks, tables, boilerplate).
    *
    * @return (idCol, n_segments, n_langs, main_lang, main_frac);
    *         main_lang = most frequent segment verdict, count ties
    *         broken lexicographically on the code — deterministic
    *         cross-engine. Token-free docs have no segments, drop out */
  def languageMix(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segs = chunkedTokens(docs, idCol, textCol, segTokens, segTokens)
      .withColumn("lang", TextAnalysis.langId(col("__chunk")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("k").desc, col("lang"))
    segs.groupBy(col(idCol), col("lang")).agg(count(lit(1)).as("k"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_segments"),
        count(lit(1)).as("n_langs"),
        max(when(col("rn") === 1, col("lang"))).as("main_lang"),
        max(when(col("rn") === 1, col("k"))).as("__mk"))
      .withColumn("main_frac",
        col("__mk").cast("double") / col("n_segments").cast("double"))
      .drop("__mk")
  }

  /** Segment-level language FILTER — the removal form of [[languageMix]]
    * (the report→removal pattern of q109/q250): keep only the segments
    * whose language verdict matches `targetLang`, re-serialize the
    * survivors in document order, and account for what was dropped.
    * This is the monolingual-corpus extraction stage public pipelines
    * run after per-paragraph language ID: a mixed doc contributes its
    * matching paragraphs instead of polluting the bucket whole or being
    * dropped whole.
    *
    * Plan shape: zero-shuffle chunking + per-segment verdict, ONE keyed
    * aggregation folding kept segments back into text (order restored
    * by sorting the collected (chunk_idx, text) structs — bounded by
    * segments-per-doc), then the q81-style left join so token-free
    * documents survive as (0, 0, '').
    *
    * @return (idCol, n_segments, n_kept, kept_text) */
  def languageFilterSegments(docs: DataFrame, idCol: String,
      textCol: String, segTokens: Int,
      targetLang: String = "en"): DataFrame = {
    val segs = chunkedTokens(docs, idCol, textCol, segTokens, segTokens)
      .withColumn("__lang", TextAnalysis.langId(col("__chunk")))
    // collect_list skips the nulls the non-matching segments become, so
    // only kept segments are collected; sort restores document order.
    val agg = segs.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_segments"),
      sum(when(col("__lang") === targetLang, 1L).otherwise(0L))
        .as("n_kept"),
      array_join(transform(array_sort(collect_list(
          when(col("__lang") === targetLang,
            struct(col("chunk_idx"),
              array_join(col("__chunk"), " ").as("t"))))),
        x => x.getField("t")), " ").as("kept_text"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Middle-out truncation to a token budget: documents over `maxTokens`
    * keep their first `headTokens` and last `tailTokens` tokens with an
    * ellipsis marker between — the context-window-fitting transform
    * serving pipelines apply (head + tail carry the instruction and the
    * answer; the middle is the cheapest cut). Documents within budget
    * pass through with their tokens joined unchanged.
    *
    * Pure per-row array expression — zero shuffles, zero joins; the
    * output is the serialized token text (never a LIST column), plus the
    * kept/dropped accounting the token-budget planner (q129) consumes.
    *
    * @return (idCol, n_tokens, kept_tokens, dropped_tokens, truncated,
    *         out_text)
    */
  def truncateMiddleOut(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, headTokens: Int, tailTokens: Int,
      marker: String = "..."): DataFrame = {
    require(headTokens + tailTokens <= maxTokens,
      s"head $headTokens + tail $tailTokens exceed budget $maxTokens")
    require(headTokens >= 1 && tailTokens >= 1)
    val toks = TextAnalysis.tokens(col(textCol))
    val kept = when(col("n_tokens") <= maxTokens, col("n_tokens"))
      .otherwise(lit(headTokens.toLong + tailTokens))
    docs.select(col(idCol), toks.as("__toks"),
        size(toks).cast("long").as("n_tokens"))
      .select(col(idCol), col("n_tokens"), kept.as("kept_tokens"),
        (col("n_tokens") - kept).as("dropped_tokens"),
        (col("n_tokens") > maxTokens).as("truncated"),
        when(col("n_tokens") <= maxTokens,
            array_join(col("__toks"), " "))
          .otherwise(concat(
            array_join(slice(col("__toks"), 1, headTokens), " "),
            lit(" " + marker + " "),
            array_join(slice(col("__toks"), -tailTokens, tailTokens), " ")))
          .as("out_text"))
  }

  /** DuckDB oracle for [[truncateMiddleOut]]; `toksSql` mirrors
    * [[TextAnalysis.tokens]]. DuckDB lists are 1-based like Spark slice;
    * `arr[a:b]` is inclusive-end sublist. */
  def truncateMiddleOutOracleSql(table: String, idCol: String,
      toksSql: String, maxTokens: Int, headTokens: Int, tailTokens: Int,
      marker: String = "..."): String =
    s"""WITH t AS (
       |  SELECT $idCol, $toksSql AS toks,
       |         CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM $table
       |)
       |SELECT $idCol, n_tokens,
       |       CASE WHEN n_tokens <= $maxTokens THEN n_tokens
       |            ELSE ${headTokens + tailTokens} END AS kept_tokens,
       |       n_tokens - (CASE WHEN n_tokens <= $maxTokens THEN n_tokens
       |            ELSE ${headTokens + tailTokens} END) AS dropped_tokens,
       |       n_tokens > $maxTokens AS truncated,
       |       CASE WHEN n_tokens <= $maxTokens
       |         THEN array_to_string(toks, ' ')
       |         ELSE array_to_string(toks[1:$headTokens], ' ')
       |              || ' $marker '
       |              || array_to_string(toks[-$tailTokens:], ' ')
       |       END AS out_text
       |FROM t""".stripMargin
}
