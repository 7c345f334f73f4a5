package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** End-to-end training-corpus builder — the composition a data pipeline
  * actually ships, as ONE declarative plan:
  *
  *   stratified sample → exact dedup (keep lowest id per normalized
  *   fingerprint) → quality floor → train/val/test split
  *
  * Plan shape: the sample predicate is a pure hash expression (sits on the
  * scan, survives pushdown), dedup is a single keyed `min_by` aggregation
  * (one shuffle — the only one in the whole pipeline), quality is scalar,
  * and the split is another pure expression. Every step is deterministic
  * and engine-portable, so the entire pipeline output is one
  * rows+schema+hash oracle row (q50) — rerunning it on 100 TB tomorrow
  * selects the same documents into the same splits.
  */
object Corpus {

  /** @return (id, strata, n_tokens, quality, split) for the surviving rows */
  def build(docs: DataFrame, idCol: String, textCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double, minQuality: Double,
      salt: String,
      splits: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    val sampled = Sampling.stratifiedSample(docs, col(idCol), col(strataCol),
      rates, defaultRate, s"$salt-smp")
    val deduped = sampled
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("__fp"))
      .agg(min_by(
        struct(col(idCol), col(textCol), col(strataCol)), col(idCol)).as("r"))
      .select(col("r.*"))
    val toks = TextAnalysis.tokens(col(textCol))
    val stopRatio = TextAnalysis.stopwordHits(toks, TextAnalysis.stopEn)
      .cast("double") / greatest(size(toks), lit(1))
    val lenScore = least(size(toks).cast("double") / lit(100.0), lit(1.0))
    val punct = TextAnalysis.punctRatio(col(textCol))
    val scored = deduped
      .withColumn("n_tokens", size(toks))
      .withColumn("quality",
        lenScore * lit(0.6) + (lit(1.0) - stopRatio) * lit(0.3) +
          (lit(1.0) - punct) * lit(0.1))
      .filter(col("quality") >= minQuality)
    Sampling.assignSplit(scored, col(idCol), s"$salt-spl", splits)
      .select(col(idCol), col(strataCol), col("n_tokens"),
        col("quality"), col("split"))
  }

  /** Incremental ingestion: drop new documents whose normalized
    * fingerprint already exists in the corpus — the daily-batch path
    * (dedup new data against history WITHOUT re-reading history's text:
    * `existingFps` is the persisted fingerprint column, one slim row per
    * historical doc). A keyed left_anti shuffle on the fingerprint; also
    * drops intra-batch dups, keeping the lowest id. */
  def incremental(newDocs: DataFrame, idCol: String, textCol: String,
      existingFps: DataFrame): DataFrame = {
    val fps = existingFps.toDF("__fp")
    newDocs
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(fps, Seq("__fp"), "left_anti")
      .groupBy(col("__fp"))
      .agg(min_by(struct(newDocs.columns.map(col): _*), col(idCol)).as("r"))
      .select(col("r.*"))
  }

  /** Train/eval split-leakage audit — the contamination check a split
    * assignment needs AFTER the fact: normalized-fingerprint groups that
    * span the train split and any eval split. A dedup pass before
    * splitting prevents exact leakage, but pipelines that split first
    * (or merge corpora post-split) re-introduce it; q55's
    * decontamination catches n-gram overlap with EXTERNAL benchmarks,
    * this catches the corpus leaking into its OWN eval splits.
    *
    * One fingerprint projection (scan-side md5) + one keyed aggregation
    * with conditional counts — the same single-shuffle shape as exact
    * dedup, so it runs at corpus scale as a routine audit.
    *
    * @param splits as [[graft.ops.Sampling.assignSplit]]; every
    *               non-"train" label counts as eval
    * @return (fp, n_train, n_eval, train_id, eval_id) — one row per
    *         LEAKED fingerprint (present on both sides); the id pair is
    *         the lowest-id example from each side for triage */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
      salt: String, splits: Seq[(String, Double)]): DataFrame = {
    val assigned = Sampling.assignSplit(
      docs.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      col(idCol), salt, splits)
    val isTrain = col("split") === "train"
    assigned.groupBy(col("__fp").as("fp"))
      .agg(sum(when(isTrain, 1L).otherwise(0L)).as("n_train"),
        sum(when(isTrain, 0L).otherwise(1L)).as("n_eval"),
        min(when(isTrain, col(idCol))).as("train_id"),
        min(when(!isTrain, col(idCol))).as("eval_id"))
      .filter(col("n_train") > 0 && col("n_eval") > 0)
  }

  /** Token accounting — the mixture dashboard every corpus pipeline
    * keeps: documents, token mass, and corpus share per group (source /
    * language / split). This is the input to choosing q66's mixing rates
    * and the evidence that applied rates landed where intended.
    *
    * Token counts come from a scan-side `size(tokens)` — the corpus is
    * NEVER exploded (10¹¹ token rows for a 10⁸-doc corpus would dwarf
    * the corpus itself); one map-side-combined aggregation is the only
    * shuffle, and the share denominators come from an unpartitioned
    * window over the ALREADY-AGGREGATED frame (one row per group — the
    * dense-rollup trick, group cardinality not corpus size).
    *
    * @return (byCol, n_docs, n_tokens, doc_share, token_share),
    *         shares exact to one final division */
  def tokenAccounting(docs: DataFrame, byCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy() // group-cardinality rows by then
    docs
      .select(col(byCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nt"))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
      .withColumn("doc_share",
        col("n_docs").cast("double") /
          sum(col("n_docs")).over(all).cast("double"))
      .withColumn("token_share",
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(all).cast("double"))
  }
}
