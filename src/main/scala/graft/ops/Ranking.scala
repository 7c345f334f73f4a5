package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Player-ranking operator family.
  *
  * Re-expresses the reference's per-player career-stats → weighted-score →
  * global-rank pipeline (`/root/reference/spark_apps/advanced_analytics.py:105-135`:
  * A1 groupBy+count/avg/sum, A5 weighted polynomial, W1 `row_number` over global
  * order, F2 `rank <= k` gate) as composable `DataFrame => DataFrame` stages.
  *
  * Scale notes (100 TB):
  *  - The groupBy is a hash aggregation; Catalyst plans partial (map-side)
  *    + final aggregation, so the shuffle carries one row per key per mapper,
  *    not the raw facts.
  *  - The reference's bare `Window.orderBy(desc)` (W1) funnels every row into a
  *    single partition. That is only safe because we apply it AFTER the
  *    aggregation (cardinality = #keys) and only when the rank value itself is
  *    needed; for pure top-k use [[topK]] which is `TakeOrderedAndProject` —
  *    per-partition heaps + a k-row merge at the driver, no global sort.
  */
object Ranking {

  /** A1: per-key career stats. `count(*)`, avg of metric cols, sum of flag cols.
    * Mirrors `advanced_analytics.py:105-118` (player career aggregation).
    */
  def careerStats(
      df: DataFrame,
      keys: Seq[String],
      avgCols: Seq[String],
      sumCols: Seq[String],
      countName: String = "total_matches"): DataFrame = {
    val aggs =
      (count(lit(1)).as(countName) +:
        (avgCols.map(c => avg(col(c)).as(s"avg_$c")) ++
          sumCols.map(c => sum(col(c)).as(s"sum_$c"))))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A5: weighted ranking polynomial over aggregated stats — constant-folded by
    * Catalyst. Mirrors `advanced_analytics.py:121-129`. `weights` maps an input
    * column to its coefficient.
    */
  def weightedScore(df: DataFrame, weights: Map[String, Double], as: String = "ranking_score"): DataFrame = {
    // foldLeft, not reduce: an empty weight map scores 0.0 instead of
    // crashing plan construction with an empty-reduce
    val score = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0): org.apache.spark.sql.Column) {
        case (acc, (c, w)) => acc + col(c) * lit(w)
      }
    df.withColumn(as, score)
  }

  /** W1+F2: global rank with deterministic tie-break, gated at `rank <= k`.
    * Keeps the rank column (the reference surfaces it in the alert payload);
    * the global `Window.orderBy` is applied post-aggregation so the single
    * partition holds #keys rows, not #facts. Use [[topK]] when the rank value
    * is not needed.
    */
  def rankTopK(df: DataFrame, scoreCol: String, tieBreak: String, k: Int): DataFrame = {
    val w = Window.orderBy(col(scoreCol).desc, col(tieBreak).asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** O2: pure top-k — `orderBy().limit(k)` compiles to TakeOrderedAndProject
    * (no global shuffle; per-partition top-k then driver merge). Preferred at
    * scale when rank values beyond ordering are unused (SURVEY §7.4).
    */
  def topK(df: DataFrame, scoreCol: String, tieBreak: String, k: Int): DataFrame =
    df.orderBy(col(scoreCol).desc, col(tieBreak).asc).limit(k)

  /** Global contiguous 1-based ordinals in (shardCol, orderCols) order
    * WITHOUT a global sort: per-shard counts roll into prefix offsets
    * (a window over |shards| rows — shard-cardinality-bounded, like the
    * q84 cut derivation), offsets broadcast back, and each row's ordinal
    * is its within-shard rank plus its shard's offset. The stable-id
    * assignment a training-order writer needs (resume-safe, identical
    * on every run) where `row_number() OVER (ORDER BY ...)` would funnel
    * the corpus through ONE sorted partition.
    *
    * Requires `orderCols` to totally order rows within a shard (pass an
    * id as the last column).
    *
    * @return df plus `ordinal` — identical to the global row_number in
    *         (shardCol, orderCols...) order
    */
  def globalOrdinals(df: DataFrame, shardCol: String,
      orderCols: Seq[String]): DataFrame = {
    val offsets = df.groupBy(col(shardCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(Window.orderBy(col(shardCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val within = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
    df.join(broadcast(offsets), Seq(shardCol))
      .withColumn("ordinal",
        (col("__off") + row_number().over(within)).cast("long"))
      .drop("__off")
  }

  /** Top-k per group WITH an `__other__` rollup: the dashboard cut that
    * keeps totals honest — a bare top-k silently drops the tail, so
    * per-group sums stop reconciling with the table; here the tail
    * collapses into one labeled bucket and Σn per group equals the
    * group's true total. Ranking ties break (n desc, dim asc).
    *
    * One counting aggregation + one group-keyed window over the
    * (group, dim) frame (dim-cardinality-bounded) + one re-aggregation.
    *
    * @return (grpCol, label, n, n_dims) — n_dims = how many distinct
    *         dims the bucket covers (1 for kept dims)
    */
  def topKWithOther(df: DataFrame, grpCol: String, dimCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val counts = df.groupBy(col(grpCol), col(dimCol))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(grpCol))
      .orderBy(col("__n").desc, col(dimCol))
    counts
      .withColumn("label",
        when(row_number().over(w) <= k, col(dimCol).cast("string"))
          .otherwise(lit("__other__")))
      .groupBy(col(grpCol), col("label"))
      .agg(sum(col("__n")).as("n"), count(lit(1)).as("n_dims"))
  }

  /** DuckDB oracle for [[topKWithOther]]. */
  def topKWithOtherOracleSql(table: String, grpCol: String,
      dimCol: String, k: Int): String =
    s"""WITH c AS (
       |  SELECT $grpCol, $dimCol, CAST(count(*) AS BIGINT) AS n0
       |  FROM $table GROUP BY 1, 2
       |), l AS (
       |  SELECT $grpCol,
       |    CASE WHEN row_number() OVER (PARTITION BY $grpCol
       |      ORDER BY n0 DESC, $dimCol) <= $k
       |      THEN CAST($dimCol AS VARCHAR) ELSE '__other__' END AS label,
       |    n0
       |  FROM c
       |)
       |SELECT $grpCol, label, CAST(sum(n0) AS BIGINT) AS n,
       |       CAST(count(*) AS BIGINT) AS n_dims
       |FROM l GROUP BY 1, 2""".stripMargin
}
