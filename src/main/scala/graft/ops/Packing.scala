package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Sequence packing: lay documents out into fixed-capacity token windows
  * (the concatenate-and-chunk layout of GPT-style pretraining — each
  * document gets a start offset in its shard's token stream, and the
  * window id is `start div capacity`).
  *
  * Determinism: documents are sharded by the portable hash and laid out
  * in key order within each shard, so every document's (shard, offset,
  * window) is a pure function of the corpus content — reproducible
  * across runs, partitionings and engines (q67's oracle recomputes it).
  *
  * Scale shape: ONE window (running sum keyed by shard, ordered by key).
  * Shards bound the sort: each task sorts corpus/shards documents, and
  * `shards` scales freely with the cluster because shard assignment is a
  * per-row hash — the knob that keeps the biggest sort partition at a
  * size one executor can hold.
  */
object Packing {

  /** @return (idCol, shard, n_tokens, start_off, window)
    *
    * `idCol` must be unique per row — the layout is defined by the total
    * order (shard, id). The frame is ROWS, not the RANGE default: under
    * RANGE, duplicate ids would be frame PEERS sharing one cumulative
    * sum, silently overlapping their windows. */
  def packIntoWindows(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, shards: Int, salt: String): DataFrame = {
    require(capacity > 0 && shards > 0)
    val key: Column = col(idCol)
    val w = Window.partitionBy(col("shard")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(key,
        Sampling.hashBucket(key, salt, shards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("start_off",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("window", expr(s"start_off div $capacity"))
  }
}
