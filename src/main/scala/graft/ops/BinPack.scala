package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Bin-packing sequence layout: first-fit-decreasing (FFD) per shard —
  * the padding-minimizing alternative to [[Packing.packIntoWindows]]'s
  * concat-and-chunk. Chunk layout wastes nothing but SPLITS documents
  * across window boundaries; training recipes that need whole documents
  * per sequence (instruction tuning, long-context curricula) pack
  * instead: each document lands in ONE bin, bins never exceed
  * `capacity`, and FFD (largest first, first bin that fits) is the
  * classic 11/9·OPT+1 heuristic — strictly fewer bins than the greedy
  * sequential packing (pad-and-open-next) most pipelines start with.
  *
  * Deterministic: shard = portable hash of the id, order within a shard
  * = (n_tokens desc, id asc), so every document's bin is a pure function
  * of corpus content — reproducible across runs/partitionings/engines
  * (the oracle replays the identical fold as a recursive CTE).
  *
  * Scale shape: one keyed shuffle collects each shard's (id, n) pairs —
  * 16 bytes per document on the wire, NOT the text — and the FFD fold
  * runs once per shard row. Per-task memory is bounded by corpus/shards
  * documents ([[Packing]]'s identical contract; `shards` is the knob
  * that matches the biggest shard to one executor). FFD is inherently
  * sequential within a shard — the parallelism unit is the shard, by
  * construction.
  *
  * Contract: docs with n_tokens = 0 (nothing to pack) or > capacity
  * (cannot pack whole — chunk first, q77) are EXCLUDED; callers route
  * oversize docs through [[graft.text.Segments.chunkWithStride]].
  */
object BinPack {

  /** @return (idCol, shard, n_tokens, bin) — bin is 0-based per shard. */
  def packBinsFFD(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, shards: Int, salt: String): DataFrame = {
    require(capacity > 0 && shards > 0)
    val base = docs.select(col(idCol).cast("long").as("id"),
        Sampling.hashBucket(col(idCol), salt, shards).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n"))
      .filter(col("n") >= 1 && col("n") <= capacity)
    // (-n, id) sorts FFD order ascending; n rides along for the fold
    val grouped = base.groupBy(col("shard"))
      .agg(array_sort(collect_list(struct(
        (-col("n")).as("negn"), col("id"), col("n")))).as("ds"))
    // The fold accumulates BARE bin ids aligned with ds by position
    // (zipped back after) — per-element array copies are 8-byte longs,
    // not 24-byte structs, which is most of the fold's cost.
    val zero = struct(
      array().cast("array<bigint>").as("loads"),
      array().cast("array<bigint>").as("bins"))
    val fold = aggregate(col("ds"), zero, (acc, d) => {
      val loads = acc.getField("loads")
      val n = d.getField("n")
      // first bin that still fits: 1-based index or NULL (get, not
      // element_at — ANSI makes element_at throw on bad indices; and
      // sequence(1, 0) DESCENDS, so the empty-loads case needs a guard)
      val idxs = when(size(loads) > 0, sequence(lit(1), size(loads)))
        .otherwise(array().cast("array<int>"))
      val fit = get(
        filter(idxs, j => element_at(loads, j) + n <= capacity), lit(0))
      val bin = (coalesce(fit, size(loads) + 1) - 1).cast("long")
      val newLoads = when(fit.isNull, concat(loads, array(n)))
        .otherwise(transform(loads,
          (l, k) => when(k === fit - 1, l + n).otherwise(l)))
      struct(newLoads.as("loads"),
        concat(acc.getField("bins"), array(bin)).as("bins"))
    })
    grouped
      .select(col("shard"), col("ds"), fold.getField("bins").as("binids"))
      .select(col("shard"), explode(arrays_zip(col("ds"), col("binids"))).as("e"))
      .select(col("e.ds.id").as(idCol), col("shard"),
        col("e.ds.n").as("n_tokens"), col("e.binids").as("bin"))
  }

  /** DuckDB oracle: the identical FFD fold as a recursive CTE stepping
    * one document per shard per round, carrying the bin-load list.
    * `baseSql` must yield (doc_id, shard, n) already filtered to
    * 1 ≤ n ≤ capacity. */
  def ffdOracleSql(baseSql: String, capacity: Int): String = {
    def fit(loads: String, n: String) =
      s"list_filter(generate_series(1, len($loads)), j -> $loads[j] + $n <= $capacity)[1]"
    s"""WITH RECURSIVE d AS (
      |  SELECT doc_id, shard, n,
      |         row_number() OVER (PARTITION BY shard
      |                            ORDER BY n DESC, doc_id) AS rn
      |  FROM ($baseSql)
      |), steps AS (
      |  SELECT shard, 0 AS i, CAST([] AS BIGINT[]) AS loads,
      |         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n,
      |         CAST(NULL AS BIGINT) AS bin
      |  FROM (SELECT DISTINCT shard FROM d)
      |  UNION ALL
      |  SELECT s.shard, s.i + 1,
      |         CASE WHEN ${fit("s.loads", "d.n")} IS NULL
      |              THEN list_append(s.loads, d.n)
      |              ELSE list_transform(generate_series(1, len(s.loads)),
      |                k -> CASE WHEN k = ${fit("s.loads", "d.n")}
      |                          THEN s.loads[k] + d.n ELSE s.loads[k] END)
      |         END,
      |         d.doc_id, d.n,
      |         coalesce(${fit("s.loads", "d.n")}, len(s.loads) + 1) - 1
      |  FROM steps s JOIN d ON d.shard = s.shard AND d.rn = s.i + 1
      |)
      |SELECT doc_id, shard, CAST(n AS BIGINT) AS n_tokens,
      |       CAST(bin AS BIGINT) AS bin
      |FROM steps WHERE i >= 1""".stripMargin
  }
}
