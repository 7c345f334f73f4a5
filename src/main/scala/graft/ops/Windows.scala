package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Moving-average / sequence window operators.
  *
  * Re-expresses the reference's per-player trend analysis
  * (`/root/reference/spark_apps/advanced_analytics.py:141-161`): W2 a
  * 5-row moving average `Window.partitionBy(player).orderBy(time)
  * .rowsBetween(-4, 0)`, W3 a per-player `row_number` sequence, F3 the
  * `game_number >= 5` warm-up gate, F4 the disjunctive trend threshold.
  *
  * Divergence from the reference (SURVEY §7.4): it orders by
  * `processed_at = current_timestamp()`, which ties within a micro-batch
  * and makes the frame nondeterministic. We order by event time with a
  * unique-key tie-break.
  *
  * Scale: one shuffle on the partition key. The bounded frame (5 rows)
  * bounds only the AGGREGATION buffer — WindowExec still sorts each
  * key's full partition, so per-key cost is O(rows·log rows), not
  * O(frame). Skewed keys would dominate a partition — at 100 TB, salting
  * the key and re-merging would apply, but per-player cardinality here is
  * naturally bounded by the frame semantics.
  */
object Windows {

  /** W2+W3: appends `seq` (1-based per-key sequence) and, for each metric
    * cents column, an exact moving sum + frame count from which callers
    * derive the moving average with [[Exact.avgFromCents]].
    */
  def movingFrame(
      df: DataFrame,
      key: Column,
      order: Seq[Column],
      centsCols: Seq[String],
      lookback: Int = 4): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val frame = w.rowsBetween(-lookback, 0)
    val withSeq = df.withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("frame_n", count(lit(1)).over(frame))
    centsCols.foldLeft(withSeq) { (d, c) =>
      d.withColumn(s"mov_sum_$c", sum(col(c)).over(frame))
    }
  }

  /** Rolling LOWER MEDIAN over the trailing `lookback+1`-row frame —
    * the robust smoother [[movingFrame]]'s mean is not: one spike
    * shifts a 5-row mean by spike/5 for 5 rows; the median ignores it
    * entirely (the q103 median/MAD argument, applied pointwise along a
    * series). The frame's value list materializes per row (bounded by
    * the frame, not the partition), sorts, and indexes the lower middle
    * — `sorted[(n+1) div 2]` — so the result is an EXACT input value:
    * no float averaging of middle pairs, bit-portable by construction.
    *
    * Scale: [[movingFrame]]'s contract — one shuffle + per-key sort;
    * series keys must outnumber cores.
    *
    * @return df + (seq, med) — `med` over min(seq, lookback+1) rows */
  def rollingMedian(df: DataFrame, key: Column, order: Seq[Column],
      centsCol: String, lookback: Int = 4): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val frame = w.rowsBetween(-lookback, 0)
    df.withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("__arr", sort_array(collect_list(col(centsCol)).over(frame)))
      .withColumn("med",
        expr("element_at(__arr, cast((size(__arr) + 1) div 2 as int))"))
      .drop("__arr")
  }

  /** Peak burst rate per key: the MAXIMUM event count inside any
    * `windowSeconds`-wide sliding window of the key's stream — the
    * rate-limit/abuse signal a fixed-bucket rollup (q08) understates by
    * up to 2× (a burst straddling a bucket boundary splits). Every
    * window start coincides with an event (the optimum always does), so
    * one RANGE frame anchored at each event is exhaustive — the frame
    * is VALUE-ranged, not row-ranged: gaps in the stream don't leak
    * events into the window.
    *
    * One keyed window + one keyed aggregation, nothing global.
    *
    * @return (keyCol, n_events, peak_rate, peak_at_sec) — peak_at_sec
    *         = the earliest window start achieving the peak
    */
  def peakWindowRate(events: DataFrame, keyCol: String, tsCol: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1)
    val sec = expr(
      s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 1000000")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__sec"))
      .rangeBetween(0, windowSeconds - 1)
    events.select(col(keyCol), sec.as("__sec"))
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__mx",
        max(col("__cnt")).over(Window.partitionBy(col(keyCol))))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("__cnt")).as("peak_rate"),
        min(when(col("__cnt") === col("__mx"), col("__sec")))
          .as("peak_at_sec"))
  }

  /** PEAK CONCURRENCY per key: the maximum number of SIMULTANEOUSLY
    * open intervals — capacity sizing (max concurrent sessions,
    * connections, jobs), which [[peakWindowRate]]'s event counting
    * under-states whenever intervals outlive the window. The classic
    * sweep: +1 at each start, −1 at each end (half-open [s, e) — an
    * interval ending exactly when another starts does NOT overlap it;
    * the −1 sorts first), running sum, per-key max.
    *
    * One keyed window over the 2n delta rows; nothing global.
    *
    * @return (keyCol, n_intervals, peak, peak_at) — peak_at = earliest
    *         start time achieving the peak
    */
  def peakConcurrency(intervals: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val starts = intervals.select(col(keyCol), col(startCol).as("__t"),
      lit(1L).as("__d"))
    val ends = intervals.select(col(keyCol), col(endCol).as("__t"),
      lit(-1L).as("__d"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wk = Window.partitionBy(col(keyCol))
    starts.unionAll(ends)
      .withColumn("__run", sum(col("__d")).over(w))
      .withColumn("__mx", max(col("__run")).over(wk))
      .groupBy(col(keyCol))
      .agg((count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(col("__run")).as("peak"),
        min(when(col("__run") === col("__mx") && col("__d") === 1L,
          col("__t"))).as("peak_at"))
  }

  /** DuckDB oracle for [[peakConcurrency]]: `innerSql` yields
    * (`keyName`, s, e) as integers. */
  def peakConcurrencyOracleSql(innerSql: String, keyName: String)
      : String =
    s"""WITH iv AS ($innerSql), d AS (
       |  SELECT $keyName, s AS t, 1 AS dd FROM iv
       |  UNION ALL SELECT $keyName, e AS t, -1 AS dd FROM iv
       |), r0 AS (
       |  SELECT *,
       |    CAST(sum(dd) OVER (PARTITION BY $keyName ORDER BY t, dd
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS run
       |  FROM d
       |), r AS (
       |  SELECT *, max(run) OVER (PARTITION BY $keyName) AS mx FROM r0
       |)
       |SELECT $keyName, CAST(count(*) / 2 AS BIGINT) AS n_intervals,
       |       CAST(max(run) AS BIGINT) AS peak,
       |       CAST(min(CASE WHEN run = mx AND dd = 1 THEN t END)
       |         AS BIGINT) AS peak_at
       |FROM r GROUP BY 1""".stripMargin

  /** DuckDB oracle for [[peakWindowRate]]. */
  def peakWindowRateOracleSql(table: String, keyCol: String,
      tsCol: String, windowSeconds: Long): String =
    s"""WITH e AS (
       |  SELECT $keyCol AS k, epoch_us($tsCol) // 1000000 AS sec
       |  FROM $table
       |), c AS (
       |  SELECT k, sec,
       |         CAST(count(*) OVER (PARTITION BY k ORDER BY sec
       |           RANGE BETWEEN CURRENT ROW
       |           AND ${windowSeconds - 1} FOLLOWING) AS BIGINT) AS cnt
       |  FROM e
       |), m AS (
       |  SELECT k, sec, cnt,
       |         max(cnt) OVER (PARTITION BY k) AS mx
       |  FROM c
       |)
       |SELECT k AS $keyCol, CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(max(cnt) AS BIGINT) AS peak_rate,
       |       CAST(min(CASE WHEN cnt = mx THEN sec END) AS BIGINT)
       |         AS peak_at_sec
       |FROM m GROUP BY 1""".stripMargin
}
