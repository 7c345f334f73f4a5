package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Benchmark decontamination: flag training documents that share any
  * w-token shingle with an evaluation/benchmark set — the standard
  * n-gram-containment check run before training so eval answers don't
  * leak into the corpus (w = 13 is the common published choice).
  *
  * Scale shape: both sides shingle independently (narrow, linear), the
  * containment test is ONE equi-join keyed by the shingle string, and the
  * per-document hit count is a map-side-combinable count. Nothing is
  * broadcast by hand — the benchmark side is usually tiny, so AQE turns
  * the join into a broadcast join on its own, but the plan stays correct
  * if the benchmark itself is corpus-sized. Shingles are deduped per
  * document (array_distinct) and across the benchmark (distinct), so the
  * join output is exactly one row per (doc, shared shingle).
  */
object Decontaminate {

  /** Documents of `corpus` sharing at least one w-shingle with
    * `benchmark`, with the count of distinct shared shingles.
    *
    * @param hashGrams join on `xxhash64` of the shingle instead of the
    *        string itself — an n-token shingle averages ~7n bytes where
    *        the hash is a fixed 8, so the shuffle/broadcast volume drops
    *        ~10x at w = 13. A false positive needs a 64-bit collision
    *        between a corpus and a benchmark shingle (~2⁻⁶⁴ per pair) —
    *        the right trade in production, but Spark-only, so the oracle
    *        query (q55) keeps the string join.
    * @param tokenizer pluggable unit extractor ([[TextAnalysis.tokens]]
    *        default; [[TextAnalysis.unicodeTokens]] extends the check to
    *        non-Latin benchmarks the ASCII contract tokenizes to empty —
    *        a Cyrillic eval set leaking into a multilingual corpus is
    *        invisible to the default route by construction)
    * @return (idCol, n_shared) — one row per contaminated document
    */
  def overlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, w: Int = 13, hashGrams: Boolean = false,
      tokenizer: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextAnalysis.tokens): DataFrame = {
    // Empty/whitespace-only texts shingle to [""] via the short-doc path;
    // dropping the empty gram keeps "both docs are blank" from counting
    // as contamination.
    def sh(df: DataFrame): DataFrame = {
      // tokens materialize first — shingles() references them w+2 times
      val grams = df
        .select(col(idCol), tokenizer(col(textCol)).as("__toks"))
        .select(col(idCol),
          explode(array_distinct(NearDup.shingles(col("__toks"), w))).as("g"))
        .filter(col("g") =!= "")
      if (hashGrams) grams.select(col(idCol), xxhash64(col("g")).as("g"))
      else grams
    }
    val benchGrams = sh(benchmark).select(col("g")).distinct()
    sh(corpus).join(benchGrams, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The enforcing TRANSFORM for [[overlap]]'s report (the q109-vs-q95
    * relationship): the corpus with every contaminated document REMOVED
    * — what a pipeline actually ships to training. One anti-join keyed
    * by id on top of [[overlap]]'s plan; all corpus columns survive.
    *
    * Document-level removal is the published convention (drop the doc,
    * don't surgically cut the shingle — a doc quoting benchmark text
    * is suspect wholesale); span-level surgery is [[Spans
    * .removeDuplicatedSpans]]'s job if wanted.
    *
    * @return corpus rows whose document shares NO w-shingle with the
    *         benchmark */
  def removeContaminated(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, w: Int = 13,
      hashGrams: Boolean = false): DataFrame = {
    val hit = overlap(corpus, benchmark, idCol, textCol, w, hashGrams)
      .select(col(idCol))
    corpus.join(hit, Seq(idCol), "left_anti")
  }
}
