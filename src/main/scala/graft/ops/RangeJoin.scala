package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark plans a raw
  * `t >= start AND t < end` condition as BroadcastNestedLoopJoin — every
  * point checked against every interval, O(points × intervals): the
  * classic silent scale-killer for telemetry-vs-incident-window joins.
  *
  * Bucketed encoding instead: explode each interval into the coarse time
  * buckets it overlaps (`sequence` over the truncated endpoints — an
  * interval spanning h hours yields h+1 rows at hour grain), truncate each
  * point to its bucket, equi-join on the bucket (a keyed shuffle), then
  * post-filter exact containment `[start, end)`. Choose `grain` near the
  * median interval length: coarser grain = fewer interval replicas but
  * larger per-bucket cograms; finer = the reverse.
  *
  * Interval replication is by OVERLAP, so long intervals fan out — for
  * heavily mixed interval lengths, split the interval set by length and
  * run two grains. Deterministic, and the oracle is the plain predicate
  * join (q39). */
object RangeJoin {

  /** Interval COALESCING: merge overlapping/touching validity intervals
    * per key into maximal islands — downtime consolidation, on-call
    * shift merging, SCD validity clean-up. The gaps-and-islands
    * recurrence over intervals: a new island starts where `start`
    * exceeds the running max of all previous `end`s; two fused per-key
    * windows + one keyed aggregation, nothing global. Touching
    * intervals (start = prev end) MERGE (closed-interval convention —
    * adjacent downtime is one outage).
    *
    * @return (keyCols..., island, merged_start, merged_end, n_intervals)
    */
  def intervalMerge(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    val wPrev = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df
      .withColumn("__maxEnd", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__maxEnd").isNull || col(startCol) > col("__maxEnd"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__new")).over(wRun))
      .groupBy(keyCols.map(col) :+ col("island"): _*)
      .agg(min(col(startCol)).as("merged_start"),
        max(col(endCol)).as("merged_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** DuckDB oracle for [[intervalMerge]]: `innerSql` yields
    * (keyCols..., s, e) as integers. */
  def intervalMergeOracleSql(innerSql: String, keyCols: Seq[String])
      : String = {
    val keys = keyCols.mkString(", ")
    s"""WITH b AS ($innerSql), f AS (
       |  SELECT *, CASE WHEN max(e) OVER (PARTITION BY $keys
       |      ORDER BY s, e
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |    OR s > max(e) OVER (PARTITION BY $keys ORDER BY s, e
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS nw
       |  FROM b
       |), isl AS (
       |  SELECT *, CAST(sum(nw) OVER (PARTITION BY $keys ORDER BY s, e
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS island
       |  FROM f
       |)
       |SELECT $keys, island, CAST(min(s) AS BIGINT) AS merged_start,
       |       CAST(max(e) AS BIGINT) AS merged_end,
       |       CAST(count(*) AS BIGINT) AS n_intervals
       |FROM isl GROUP BY $keys, island""".stripMargin
  }

  /** Interval GAPS — the complement of [[intervalMerge]]: per key, the
    * uncovered stretches between consecutive merged islands (coverage
    * holes, downtime-free windows, sensor blackouts). Composes the
    * island merge with one `lead` over the per-key island sequence;
    * islands are maximal and disjoint, so every consecutive pair bounds
    * exactly one gap of positive length.
    *
    * Scale shape: [[intervalMerge]]'s two fused per-key windows + keyed
    * aggregation, then one more per-key window over the (already
    * island-sized) merged frame. Nothing global.
    *
    * @return (keyCols..., gap_start, gap_end, gap_len) — gap_start is
    *         the end of one island, gap_end the start of the next
    */
  def intervalGaps(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val merged = intervalMerge(df, keyCols, startCol, endCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("merged_start"))
    merged
      .withColumn("gap_end", lead(col("merged_start"), 1).over(w))
      .filter(col("gap_end").isNotNull)
      .select(keyCols.map(col) :+
        col("merged_end").as("gap_start") :+
        col("gap_end") :+
        (col("gap_end") - col("merged_end")).as("gap_len"): _*)
  }

  /** DuckDB oracle for [[intervalGaps]]: same contract as
    * [[intervalMergeOracleSql]] — `innerSql` yields (keyCols..., s, e)
    * as integers. */
  def intervalGapsOracleSql(innerSql: String, keyCols: Seq[String])
      : String = {
    val keys = keyCols.mkString(", ")
    s"""WITH m AS (${intervalMergeOracleSql(innerSql, keyCols)}),
       |g AS (
       |  SELECT $keys, merged_end AS gap_start,
       |         lead(merged_start) OVER (PARTITION BY $keys
       |           ORDER BY merged_start) AS gap_end
       |  FROM m
       |)
       |SELECT $keys, gap_start, gap_end, gap_end - gap_start AS gap_len
       |FROM g WHERE gap_end IS NOT NULL""".stripMargin
  }

  /** AVAILABILITY / coverage ratio per key: covered time (the
    * [[intervalMerge]] islands summed — overlaps never double-count)
    * over the observed span — the SLA uptime number, the one-line
    * summary of what [[intervalGaps]] itemizes. Exact integer
    * covered/span, ratio in integer micros plus a double readout.
    *
    * @return (keyCols..., n_islands, covered, span, avail_micro,
    *         availability) — span-zero keys (single instant) report
    *         NULL ratios
    */
  def availability(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    val merged = intervalMerge(df, keyCols, startCol, endCol)
    merged.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_islands"),
        sum(col("merged_end") - col("merged_start")).as("covered"),
        (max(col("merged_end")) - min(col("merged_start"))).as("span"))
      .withColumn("avail_micro",
        when(col("span") > 0, expr("(covered * 1000000) div span")))
      .withColumn("availability",
        when(col("span") > 0,
          col("covered").cast("double") / col("span")))
  }

  /** DuckDB oracle for [[availability]]: same contract as
    * [[intervalMergeOracleSql]]. */
  def availabilityOracleSql(innerSql: String, keyCols: Seq[String])
      : String = {
    val keys = keyCols.mkString(", ")
    s"""WITH m AS (${intervalMergeOracleSql(innerSql, keyCols)})
       |SELECT $keys, CAST(count(*) AS BIGINT) AS n_islands,
       |       CAST(sum(merged_end - merged_start) AS BIGINT) AS covered,
       |       CAST(max(merged_end) - min(merged_start) AS BIGINT)
       |         AS span,
       |       CAST(CASE WHEN max(merged_end) - min(merged_start) > 0
       |         THEN (sum(merged_end - merged_start) * 1000000)
       |           // (max(merged_end) - min(merged_start)) END AS BIGINT)
       |         AS avail_micro,
       |       CASE WHEN max(merged_end) - min(merged_start) > 0 THEN
       |         CAST(sum(merged_end - merged_start) AS DOUBLE)
       |           / (max(merged_end) - min(merged_start)) END
       |         AS availability
       |FROM m GROUP BY $keys""".stripMargin
  }

  /** @param grain a `date_trunc` unit that is also a valid 1-unit
    *              interval: "hour", "day", "minute". */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTime: String, startCol: String, endCol: String,
      grain: String = "hour"): DataFrame = {
    val bucketed = intervals.withColumn("__bucket",
      explode(sequence(
        date_trunc(grain, col(startCol)),
        date_trunc(grain, col(endCol)),
        expr(s"INTERVAL 1 $grain"))))
    points.withColumn("__bucket", date_trunc(grain, col(pointTime)))
      .join(bucketed, "__bucket")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bucket")
  }
}
