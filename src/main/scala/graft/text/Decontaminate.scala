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
    * @return (idCol, n_shared) — one row per contaminated document
    */
  def overlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, w: Int = 13): DataFrame = {
    // Empty/whitespace-only texts shingle to [""] via the short-doc path;
    // dropping the empty gram keeps "both docs are blank" from counting
    // as contamination.
    def sh(df: DataFrame): DataFrame = df.select(col(idCol),
      explode(array_distinct(
        NearDup.shingles(TextAnalysis.tokens(col(textCol)), w))).as("g"))
      .filter(col("g") =!= "")
    val benchGrams = sh(benchmark).select(col("g")).distinct()
    sh(corpus).join(benchGrams, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
