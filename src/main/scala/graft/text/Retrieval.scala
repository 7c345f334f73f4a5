package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over the document corpus: BM25-family scoring for a
  * fixed term list.
  *
  * The score is the classic BM25 shape
  * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with one
  * deliberate deviation: `idf(t) = (N − df + 0.5)/(df + 0.5)` — the
  * Robertson–Spärck-Jones ratio WITHOUT the log. The log is omitted for
  * cross-engine bit parity (JVM `Math.log` and libm are each correctly
  * rounded to ≤1 ulp but not to the SAME ulp); every remaining operation
  * is IEEE-754 +,−,×,÷ evaluated in an identical, explicitly
  * left-associated order on both engines, so scores are bit-identical.
  * Single-term rankings are unchanged by the monotone log; multi-term
  * rankings weight rare terms more steeply than textbook BM25.
  *
  * Scale shape: per-document term frequencies are a narrow projection
  * (no explode — the term list is a plan literal), the corpus-wide stats
  * (N, Σdl, df per term) are ONE map-side-combinable aggregation whose
  * single row is broadcast back, and scoring is a codegen'd projection.
  * Nothing shuffles the corpus.
  */
object Retrieval {

  /** BM25-family scores for documents matching ≥1 term.
    *
    * @param tokenizer pluggable unit extractor ([[TextAnalysis.tokens]]
    *        default — ASCII outputs byte-identical;
    *        [[TextAnalysis.unicodeTokens]] lets non-Latin query terms
    *        match the scripts the ASCII contract reduces to boundary
    *        soup — a Cyrillic term can never match under the default
    *        route by construction)
    * @return (idCol, dl, n_matched, score)
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(terms.nonEmpty, "term list must be non-empty")
    require(terms.distinct == terms,
      "duplicate query terms would double-count their tf contribution")
    // tokens materialize in their own projection first: dl + one filter
    // per term would otherwise re-run the regex split terms+1 times per
    // row (interpreted HOFs get no subexpression elimination).
    val toks = col("__toks")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"tf$i")
    }
    val base = docs
      .select(col(idCol), tokenizer(col(textCol)).as("__toks"))
      .select(col(idCol) +: size(toks).cast("long").as("dl") +: tfCols: _*)
    val dfAggs = terms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L))).as(s"df$i"))
    val globals = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("dl_sum") +: dfAggs: _*)
    val g = base.crossJoin(broadcast(globals))
    val avgdl = col("dl_sum").cast("double") / col("n_docs")
    val termScore: Int => Column = i => {
      val tf = col(s"tf$i").cast("double")
      // Explicit double casts on BOTH engines: DuckDB would otherwise run
      // integer−integer+DECIMAL and divide in decimal domain, whose
      // rounding differs from IEEE double division.
      val idf = ((col("n_docs") - col(s"df$i")).cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    }
    val score = terms.indices.map(termScore).reduce(_ + _)
    val matched = terms.indices
      .map(i => when(col(s"tf$i") > 0, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    g.filter(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select(col(idCol), col("dl"), matched.as("n_matched"),
        score.as("score"))
  }

  /** Per-document TF-IDF keyword extraction: the top `k` tokens of each
    * document by `tf · N/df` — [[bm25]] turned inward (rank a document's
    * own terms instead of documents against a query). The idf is the
    * LINEAR ratio N/df, log-free for the same cross-engine bit-parity
    * reason as bm25's RSJ ratio; the hyperbolic df discount is what the
    * ranking needs, the log only compresses it.
    *
    * Plan: one (token, doc) tf aggregation, df as a count window over
    * the token key (partition = the token's df, the BM25/q73 bound), the
    * one-row N broadcast back, then a per-doc rank window (partition =
    * the document's distinct tokens — bounded by doc length, never
    * corpus size). Three keyed shuffles, no joins of corpus-sized
    * frames.
    *
    * @return (idCol, rn, token, tf, df, score) — rn 1..k by
    *         (score desc, token asc), deterministic cross-engine */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int,
      tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.select(count(lit(1)).as("__n")) // 1 row
    val tf = docs
      .select(col(idCol),
        explode(tokenizer(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("tf"))
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") * col("__n").cast("double") /
          col("df").cast("double"))
      .withColumn("rn", row_number().over(
          Window.partitionBy(col(idCol))
            .orderBy(col("score").desc, col("token"))).cast("long"))
      .filter(col("rn") <= k)
      .select(col(idCol), col("rn"), col("token"), col("tf"), col("df"),
        col("score"))
  }

  /** The DuckDB oracle for [[bm25]], generated from the SAME constants and
    * term list so the arithmetic shape cannot drift between engines. */
  /** Reciprocal-rank fusion — the standard hybrid-retrieval combiner
    * (keyword BM25 + embedding ANN feeding one ranked list, the shape
    * every RAG stack runs): fused(d) = Σ_lists 1/(rrfK + rank_list(d)),
    * robust to the lists' incomparable score scales because only RANKS
    * enter. Computed in scaled INTEGER arithmetic — each contribution is
    * `scale div (rrfK + rank)` — so the fused score is a sum of exact
    * integers: order-independent, engine-portable, hash-matchable
    * (double 1/(k+r) sums would differ by addition order across
    * partitionings).
    *
    * Inputs are (idCol, rank) frames — top-m lists from
    * [[graft.similarity.TopK.perGroup]] or any ranker; m bounds every
    * frame, so the full-outer fuse joins are top-m-sized, never
    * corpus-sized. A document absent from a list contributes 0.
    *
    * @param rankings (name, frame) pairs; each frame's rank column is
    *                 named `rank`, emitted as `rank_<name>` (nullable)
    * @return (idCol, rank_<name>..., rrf_score) */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
      rrfK: Int = 60, scale: Long = 1000000000L): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    val renamed = rankings.map { case (n, df) =>
      df.select(col(idCol), col("rank").as(s"rank_$n")) }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings
      .map { case (n, _) =>
        coalesce(expr(s"$scale div ($rrfK + rank_$n)"), lit(0L)) }
      .reduce(_ + _)
    joined.withColumn("rrf_score", score)
  }

  /** The (1−p)·p^{d−1} weight table both [[rboCurve]] and its oracle
    * inline as LITERALS — computed once here, so neither engine ever
    * calls pow() (whose last-ulp could differ) at query time. */
  def rboWeights(depth: Int, p: Double): Seq[Double] = {
    require(depth >= 1 && p > 0 && p < 1)
    Seq.iterate(1.0 - p, depth)(_ * p)
  }

  /** Truncated rank-biased overlap curve (Webber et al. 2010) between
    * two top-`depth` rankings: RBO@d = Σ_{i≤d} w_i · X_i / i with
    * X_i = |A[1..i] ∩ B[1..i]| and w_i = (1−p)p^{i−1} — the ranking-
    * agreement measure Kendall/Spearman get wrong for retrieval, where
    * the TOP of the list is what matters and the lists only partially
    * overlap. Use: quantify how much a cheap ranking (BM25) agrees with
    * an expensive one (embeddings) before routing traffic to the cheap
    * one; compare index versions; regression-test rankers.
    *
    * Exactness: X_i is integer (overlap counts via one join + a
    * cumulative count over the depth spine); weights are shared
    * literals ([[rboWeights]]); each term `(w · X) / d` is computed
    * bit-identically per row, then QUANTIZED to integer femto-units
    * (`floor(term · 10¹⁵)`) so the running sum is an integer window
    * aggregate — exact under ANY association. Neither engine's running
    * double sum is sequential (Spark incremental, DuckDB segment-tree;
    * even DuckDB's `list_reduce` reassociates — measured one-ulp
    * drift), so a float accumulation can never hash-match; the 10⁻¹⁵
    * quantization is far below any decision threshold RBO feeds.
    *
    * The depth spine is `depth` rows by construction, so the global
    * window is bounded — this is an eval-sized op, not a corpus op.
    *
    * @param a/@param b (idCol, rankCol) frames, ranks 1..depth
    * @return (d, x_d, rbo) for d = 1..depth; rbo at `depth` is the
    *         headline RBO@depth */
  def rboCurve(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String, depth: Int, p: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = typedlit(rboWeights(depth, p))
    val joined = a.select(col(idCol), col(rankCol).as("__ra"))
      .join(b.select(col(idCol), col(rankCol).as("__rb")), idCol)
      .select(greatest(col("__ra"), col("__rb")).as("__mr"))
      .groupBy(col("__mr")).agg(count(lit(1)).as("__c"))
    val spine = a.sparkSession.range(1, depth + 1)
      .select(col("id").as("d"))
    val cum = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(joined.withColumnRenamed("__mr", "d"), Seq("d"), "left")
      .withColumn("x_d", sum(coalesce(col("__c"), lit(0L))).over(cum))
      .withColumn("__term",
        element_at(w, col("d").cast("int")) * col("x_d").cast("double") /
          col("d").cast("double"))
      .withColumn("__tq", floor(col("__term") * lit(1e15)).cast("long"))
      .withColumn("rbo_q", sum(col("__tq")).over(cum))
      .withColumn("rbo", col("rbo_q").cast("double") / lit(1e15))
      .select(col("d"), col("x_d"), col("rbo_q"), col("rbo"))
  }

  /** DuckDB oracle for [[rboCurve]]; `aSql`/`bSql` must yield
    * (doc_id, rank). */
  def rboOracleSql(aSql: String, bSql: String, depth: Int,
      p: Double = 0.9): String = {
    val ws = rboWeights(depth, p).mkString("[", ", ", "]")
    s"""WITH ja AS ($aSql), jb AS ($bSql),
      |mr AS (
      |  SELECT greatest(ja.rank, jb.rank) AS mr
      |  FROM ja JOIN jb USING (doc_id)
      |), c AS (SELECT mr AS d, CAST(count(*) AS BIGINT) AS c FROM mr GROUP BY 1),
      |spine AS (
      |  SELECT unnest(generate_series(1, $depth)) AS d
      |), x AS (
      |  SELECT spine.d,
      |         CAST(sum(coalesce(c.c, 0)) OVER w AS BIGINT) AS x_d
      |  FROM spine LEFT JOIN c USING (d)
      |  WINDOW w AS (ORDER BY spine.d
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), t AS (
      |  SELECT d, x_d,
      |         CAST(floor(($ws)[CAST(d AS INT)] * CAST(x_d AS DOUBLE)
      |           / CAST(d AS DOUBLE) * 1000000000000000.0) AS BIGINT) AS tq
      |  FROM x
      |)
      |SELECT d, x_d,
      |       CAST(sum(tq) OVER w2 AS BIGINT) AS rbo_q,
      |       CAST(sum(tq) OVER w2 AS DOUBLE) / 1000000000000000.0 AS rbo
      |FROM t
      |WINDOW w2 AS (ORDER BY d
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
  }

  def bm25OracleSql(toksSql: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      table: String = "documents"): String = {
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfs = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val termScores = terms.indices.map { i =>
      s"(CAST(n_docs - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5) * " +
        s"(CAST(tf$i AS DOUBLE) * ${k1 + 1.0}) / " +
        s"(CAST(tf$i AS DOUBLE) + $k1 * (1.0 - $b + $b * dl / avgdl))"
    }.mkString(" + ")
    val matched = terms.indices
      .map(i => s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    val anyMatch = terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
    s"""WITH base AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, $tfs
      |  FROM (SELECT doc_id, $toksSql AS toks FROM $table)
      |), globals AS (
      |  SELECT count(*) AS n_docs, sum(dl) AS dl_sum, $dfs FROM base
      |), g AS (
      |  SELECT base.*, n_docs, CAST(dl_sum AS DOUBLE) / n_docs AS avgdl,
      |         ${terms.indices.map(i => s"df$i").mkString(", ")}
      |  FROM base, globals
      |)
      |SELECT doc_id, dl, CAST($matched AS BIGINT) AS n_matched,
      |       $termScores AS score
      |FROM g WHERE $anyMatch""".stripMargin
  }

  /** KWIC (keyword-in-context) snippets: for documents containing
    * `term`, the ±`window`-token context around its FIRST occurrence —
    * the result-page snippet a retrieval stack renders next to the
    * BM25 score, and the audit view for "why did this doc match".
    * Pure per-row array expressions (array_position + clamped slice,
    * serialized to text — never a LIST output); non-matching docs drop.
    *
    * @return (idCol, pos, snippet) — pos the 1-based token position
    */
  def kwicSnippets(docs: DataFrame, idCol: String, textCol: String,
      term: String, window: Int = 3): DataFrame = {
    require(window >= 1)
    val toks = TextAnalysis.tokens(col(textCol))
    val framed = docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("pos", array_position(col("__toks"), term))
      .filter(col("pos") > 0)
    val start = greatest(col("pos") - window, lit(1L))
    val stop = least(col("pos") + window, size(col("__toks")).cast("long"))
    framed.select(col(idCol), col("pos"),
      array_join(
        slice(col("__toks"), start.cast("int"),
          (stop - start + 1).cast("int")), " ").as("snippet"))
  }

  /** DuckDB oracle for [[kwicSnippets]]; `toksSql` mirrors
    * [[TextAnalysis.tokens]]. */
  def kwicOracleSql(table: String, idCol: String, toksSql: String,
      term: String, window: Int = 3): String =
    s"""WITH f AS (
       |  SELECT $idCol, toks,
       |         CAST(list_position(toks, '$term') AS BIGINT) AS pos
       |  FROM (SELECT $idCol, $toksSql AS toks FROM $table)
       |  WHERE list_position(toks, '$term') > 0
       |)
       |SELECT $idCol, pos,
       |       array_to_string(toks[
       |         CAST(greatest(pos - $window, 1) AS INTEGER) :
       |         CAST(least(pos + $window, len(toks)) AS INTEGER)], ' ')
       |         AS snippet
       |FROM f""".stripMargin

  /** Rocchio pseudo-relevance-feedback expansion: run [[bm25]], take
    * the top `nFeedback` documents as presumed-relevant, and rank their
    * tokens (query terms excluded) by `tf_fb · N/df` — the linear-idf
    * weighting of [[tfidfKeywords]] applied to the feedback set. The
    * classic no-training query expansion: the top terms are what the
    * query "meant but didn't say".
    *
    * Scale shape: the bm25 pass, one fused global top-nFeedback, one
    * token aggregation over nFeedback documents (tiny), a token-keyed
    * df join, one fused top-k.
    *
    * @return top `topK`: (token, tf_fb, df, score) by (score desc,
    *         token)
    */
  def rocchioExpansion(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], nFeedback: Int = 3, topK: Int = 5)
      : DataFrame = {
    require(nFeedback >= 1 && topK >= 1)
    val fb = bm25(docs, idCol, textCol, terms)
      .orderBy(col("score").desc, col(idCol)).limit(nFeedback)
      .select(col(idCol))
    val fbTf = docs.join(fb, idCol)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(!col("token").isin(terms.map(x => x: Any): _*))
      .groupBy(col("token")).agg(count(lit(1)).as("tf_fb"))
    val dfAll = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("token"))
      .distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nRow = docs.agg(count(lit(1)).as("__N"))
    fbTf.join(dfAll, "token")
      .crossJoin(broadcast(nRow))
      .withColumn("score",
        (col("tf_fb") * col("__N")).cast("double") / col("df"))
      .orderBy(col("score").desc, col("token")).limit(topK)
      .select(col("token"), col("tf_fb"), col("df"), col("score"))
  }

  /** DuckDB oracle for [[rocchioExpansion]]: `toksExpr` is the token
    * expression over the `documents` table (the [[bm25OracleSql]]
    * contract). */
  def rocchioOracleSql(toksExpr: String, terms: Seq[String],
      nFeedback: Int = 3, topK: Int = 5): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, $toksExpr AS toks FROM documents),
       |ranked AS (${bm25OracleSql(toksExpr, terms)}),
       |fb AS (
       |  SELECT doc_id FROM ranked ORDER BY score DESC, doc_id
       |  LIMIT $nFeedback
       |), fbtf AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS tf_fb
       |  FROM (SELECT unnest(toks) AS token
       |        FROM t JOIN fb USING (doc_id))
       |  WHERE token NOT IN ($termList)
       |  GROUP BY 1
       |), dfa AS (
       |  SELECT token, CAST(count(*) AS BIGINT) AS df
       |  FROM (SELECT DISTINCT doc_id, unnest(toks) AS token FROM t)
       |  GROUP BY 1
       |)
       |SELECT token, tf_fb, df,
       |       CAST(tf_fb * (SELECT count(*) FROM t) AS DOUBLE) / df
       |         AS score
       |FROM fbtf JOIN dfa USING (token)
       |ORDER BY score DESC, token LIMIT $topK""".stripMargin
  }

  /** Best-passage extraction: per document, the `window`-token span
    * containing the most query-term hits — the passage-retrieval step
    * between document ranking (BM25/q56) and showing a human something
    * readable; q209's KWIC shows every hit, this picks THE span.
    *
    * The optimal window can always be anchored at a hit (sliding left
    * to the next hit never loses a hit), so candidate starts are hit
    * positions only and the count is one VALUE-ranged frame over each
    * document's hit-position list — bounded by hits-per-doc, not
    * document length. Ties → earliest start. Documents with no hit are
    * absent.
    *
    * @return (idCol, start_pos, n_hits, passage) — start_pos 1-based
    */
  def bestPassage(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], window: Int = 10): DataFrame = {
    require(terms.nonEmpty && window >= 1)
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val hits = toks
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(terms.map(x => x: Any): _*))
      .withColumn("pos", col("pos").cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rangeBetween(0, window - 1)
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("__n").desc, col("pos"))
    val best = hits
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .select(col(idCol), (col("pos") + 1).as("start_pos"),
        col("__n").as("n_hits"))
    best.join(toks, idCol)
      .withColumn("passage", array_join(
        slice(col("__toks"), col("start_pos").cast("int"), lit(window)),
        " "))
      .select(col(idCol), col("start_pos"), col("n_hits"), col("passage"))
  }

  /** DuckDB oracle for [[bestPassage]]: `tokSql` yields
    * (`idName`, toks). */
  def bestPassageOracleSql(tokSql: String, idName: String,
      terms: Seq[String], window: Int = 10): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH t AS ($tokSql),
       |h AS (
       |  SELECT $idName, CAST(i - 1 AS BIGINT) AS pos
       |  FROM (SELECT $idName, toks,
       |          unnest(range(1, len(toks) + 1)) AS i FROM t)
       |  WHERE toks[i] IN ($termList)
       |), c AS (
       |  SELECT $idName, pos,
       |         CAST(count(*) OVER (PARTITION BY $idName ORDER BY pos
       |           RANGE BETWEEN CURRENT ROW AND ${window - 1} FOLLOWING)
       |           AS BIGINT) AS n
       |  FROM h
       |), best AS (
       |  SELECT $idName, pos + 1 AS start_pos, n FROM (
       |    SELECT *, row_number() OVER (PARTITION BY $idName
       |      ORDER BY n DESC, pos) AS rn
       |    FROM c
       |  ) WHERE rn = 1
       |)
       |SELECT best.$idName, start_pos, n AS n_hits,
       |       array_to_string(list_slice(toks,
       |         CAST(start_pos AS INTEGER),
       |         CAST(start_pos + ${window - 1} AS INTEGER)), ' ')
       |         AS passage
       |FROM best JOIN t ON best.$idName = t.$idName""".stripMargin
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal stopword-free token runs (≤ `maxLen` words); each
    * WORD scores `deg/freq` over the candidate set (deg = summed length
    * of phrases containing it — favors words that live in long
    * phrases); a PHRASE scores the sum of its words. The multi-word
    * keyphrases TF-IDF unigrams (q102) structurally cannot produce.
    *
    * Integer exact: word scores are `deg·1e6 div freq` micros, phrase
    * scores exact sums of those. Phrase text rebuilds by position sort
    * inside the phrase group (deterministic, mirrors `string_agg ...
    * ORDER BY`). Corpus top-k via the fused sort-limit
    * (TakeOrderedAndProject — the sanctioned global top-k).
    *
    * Scale shape: one posexplode, two fused per-doc windows (boundary
    * running-sum + phrase length), one token-keyed stats aggregation
    * joined back on the token, one phrase aggregation. Everything
    * keyed; the only global op is the top-k.
    *
    * @return (phrase, n, score) — top `topK` by (score desc, phrase)
    */
  def rakeKeyphrases(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], maxLen: Int = 3, topK: Int = 20)
      : DataFrame = {
    require(maxLen >= 1 && topK >= 1 && stopwords.nonEmpty)
    val toks = docs.select(col(idCol).as("__id"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "tok")))
      .withColumn("__stop",
        col("tok").isin(stopwords.map(x => x: Any): _*))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wPhrase = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id"), col("pidx"))
    val members = toks
      .withColumn("pidx", sum(col("__stop").cast("long")).over(wDoc))
      .filter(!col("__stop"))
      .withColumn("plen", count(lit(1)).over(wPhrase))
      .filter(col("plen") <= maxLen)
    val wordScores = members.groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("wscore", expr("(deg * 1000000) div freq"))
    val phrases = members
      .join(wordScores.select(col("tok"), col("wscore")), "tok")
      .groupBy(col("__id"), col("pidx"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("phrase"),
        sum(col("wscore")).as("score"))
    phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n"), max(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topK)
  }

  /** DuckDB oracle for [[rakeKeyphrases]]: `tokSql` yields
    * (`idName`, toks). */
  def rakeOracleSql(tokSql: String, idName: String,
      stopwords: Seq[String], maxLen: Int = 3, topK: Int = 20): String = {
    val stops = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH tok AS (
       |  SELECT $idName, i AS pos, toks[i] AS tok,
       |         toks[i] IN ($stops) AS stop
       |  FROM (SELECT $idName, toks, unnest(range(1, len(toks) + 1)) AS i
       |        FROM ($tokSql))
       |), px AS (
       |  SELECT *, CAST(sum(CASE WHEN stop THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY $idName ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS pidx
       |  FROM tok
       |), mem AS (
       |  SELECT * FROM (
       |    SELECT $idName, pos, tok, pidx,
       |           CAST(count(*) OVER (PARTITION BY $idName, pidx)
       |             AS BIGINT) AS plen
       |    FROM px WHERE NOT stop
       |  ) WHERE plen <= $maxLen
       |), ws AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS freq,
       |         CAST(sum(plen) AS BIGINT) AS deg
       |  FROM mem GROUP BY 1
       |), scored AS (
       |  SELECT mem.$idName, mem.pidx,
       |         string_agg(mem.tok, ' ' ORDER BY mem.pos) AS phrase,
       |         CAST(sum((ws.deg * 1000000) // ws.freq) AS BIGINT)
       |           AS score
       |  FROM mem JOIN ws ON mem.tok = ws.tok
       |  GROUP BY 1, 2
       |)
       |SELECT phrase, CAST(count(*) AS BIGINT) AS n,
       |       max(score) AS score
       |FROM scored GROUP BY 1
       |ORDER BY score DESC, phrase LIMIT $topK""".stripMargin
  }
}
