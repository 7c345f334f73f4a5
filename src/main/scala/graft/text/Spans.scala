package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.functions.Hash64

/** Substring-level duplication profiling — the signal behind
  * "remove duplicated spans from the training set" (the w-gram
  * containment idea of q55's decontamination turned inward on the corpus
  * itself): a document whose w-gram shingles mostly also appear in other
  * documents is boilerplate/template/copy even when no WHOLE-document
  * near-dup pair fires. Complements [[NearDup]]: document-level dedup
  * (minhash clusters) drops copies; the span profile finds the
  * partially-copied tail those pipelines keep.
  *
  * Plan shape (shared by both operators here): explode units → ONE
  * map-side-combined aggregation to distinct (unit, doc) with an
  * occurrence count → per-unit document frequency as an unbounded-frame
  * `count(*)` window over the unit key (no join back to the corpus, no
  * second scan, nothing persisted) → per-doc aggregation. Three keyed
  * shuffles, single linear lineage. The window partition for a unit is
  * one row per document containing it — bounded by corpus document
  * count in theory, but w-gram shingles (w ≥ ~7) are long enough that
  * real partitions are tiny; token-level rarity (w = 1) caps at
  * vocabulary promiscuity, the same bound the BM25 df aggregation
  * already lives with.
  */
object Spans {

  /** (idCol, h, k, df) for each distinct (unit, doc): k = occurrences of
    * the unit in the doc, df = number of documents containing the unit. */
  private def unitDf(docs: DataFrame, idCol: String,
      units: DataFrame => DataFrame): DataFrame = {
    val perDocUnit = units(docs)
      .groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("k"))
    perDocUnit.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("h"))))
  }

  /** Per-document duplicated-span profile: the fraction of a document's
    * w-gram positions whose shingle occurs in ≥ `minDf` documents.
    * Shingles are hashed ([[Hash64.hash60]] — portable, so the DuckDB
    * oracle computes identical buckets) to keep the shuffled key 8 bytes
    * instead of a ~7·w-char string; a 2⁻⁶⁰ collision marks one gram
    * duplicated, identically in both engines.
    *
    * Documents shorter than w tokens profile their whole text as one
    * shingle ([[NearDup.shingles]] semantics) — exact short-doc copies
    * still count; empty-text documents collapse to the empty shingle and
    * flag each other, which is the right verdict for a dedup signal.
    *
    * @return (idCol, n_grams, n_dup_grams, dup_frac) */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 13, minDf: Int = 2,
      hash: Column => Column = Hash64.hash60): DataFrame =
    unitDf(docs, idCol, d => d
        .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
        .select(col(idCol), explode(NearDup.shingles(col("__toks"), w)).as("g"))
        .select(col(idCol), hash(col("g")).as("h")))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_grams"),
        sum(when(col("df") >= minDf, col("k")).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac",
        col("n_dup_grams").cast("double") / col("n_grams").cast("double"))

  /** Exact corpus vocabulary: the top `topN` tokens by total occurrence
    * count (deterministic tie-break: token ascending), with document
    * frequency — the exact companion to the CMS heavy-hitter sketch
    * ([[graft.ops.Sketches]]): sketch when the vocabulary doesn't fit,
    * this when you need the exact counts (tokenizer/vocab construction,
    * stopword induction, frequency-table exports).
    *
    * Plan: explode → map-side-combined (token, doc) pre-aggregation →
    * per-token aggregation → `orderBy(...).limit(topN)`, which Spark
    * plans as TakeOrderedAndProject — per-partition top-N then a driver
    * merge of N·partitions rows, NOT a single-partition global sort (the
    * round-2 top-k lesson; vocabulary cardinality at 100 TB is easily
    * 10⁸). The rank column is a row_number over the already-limited N
    * rows — a one-partition window over topN rows by construction.
    *
    * @return (rank, token, freq, df) */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val perDoc = docs
      .select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("k"))
    val vocab = perDoc.groupBy(col("token"))
      .agg(sum(col("k")).as("freq"), count(lit(1)).as("df"))
    vocab.orderBy(col("freq").desc, col("token")).limit(topN)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("token"))).cast("long"))
      .select(col("rank"), col("token"), col("freq"), col("df"))
  }

  /** Corpus bigram counts, top-N by frequency — the inner loop of BPE
    * tokenizer training (count adjacent pairs, merge the argmax, repeat)
    * and the raw material of bigram language models. Pair construction
    * is a per-row `zip_with` over two shifted slices of the
    * ALREADY-MATERIALIZED token array (the round-4 shingle lesson:
    * lambdas must touch attributes, not expression subtrees), so the
    * corpus-sized stage is zero-shuffle; then one map-side-combined
    * count and a TakeOrdered top-N — [[vocabulary]]'s plan over pairs.
    * Rank ties break on the pair string, so "the merge to apply next"
    * (rank 1) is deterministic cross-engine.
    *
    * @return (rank, pair, freq) */
  def topBigrams(docs: DataFrame, idCol: String, textCol: String,
      topN: Int): DataFrame = {
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    val pairs = zip_with(
      slice(col("__toks"), lit(1), n - 1),
      slice(col("__toks"), lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    docs
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(org.apache.spark.sql.functions.size(col("__toks")) >= 2)
      .select(explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("pair")).limit(topN)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("pair"))).cast("long"))
      .select(col("rank"), col("pair"), col("freq"))
  }

  /** Corpus-relative token rarity — a log-free unigram-LM quality proxy
    * (the role KenLM perplexity plays in public pipeline recipes, minus
    * the external model): commonness = Σ_occurrences df(token) /
    * (n_tokens · n_docs) ∈ (0, 1], rarity = 1 − commonness. Every-doc
    * tokens pull commonness toward 1 (rarity 0); hapax-heavy gibberish
    * scores rarity ≈ 1 — filter BOTH tails. Integer-exact until the one
    * final division (sums of bigints are order-independent, so the score
    * is bit-reproducible and oracle-able; a Σlog formulation would be
    * neither — the BM25 idf lesson).
    *
    * @return (idCol, n_tokens, df_sum, rarity); token-free docs drop out */
  def tokenRarity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nDocs = docs.select(count(lit(1)).as("__n_docs")) // 1 row
    unitDf(docs, idCol, d => d
        .select(col(idCol),
          explode(TextAnalysis.tokens(col(textCol))).as("h")))
      .groupBy(col(idCol))
      .agg(sum(col("k")).as("n_tokens"),
        sum(col("k") * col("df")).as("df_sum"))
      .crossJoin(broadcast(nDocs))
      .withColumn("rarity",
        lit(1.0) - col("df_sum").cast("double") /
          (col("n_tokens") * col("__n_docs")).cast("double"))
      .drop("__n_docs")
  }
}
