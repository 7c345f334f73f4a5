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
    * @return (idCol, dl, n_matched, score)
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
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
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
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
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.select(count(lit(1)).as("__n")) // 1 row
    val tf = docs
      .select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
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

  def bm25OracleSql(toksSql: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): String = {
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
      |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)
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
}
