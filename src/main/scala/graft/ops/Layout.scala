package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout PRUNING audits — "would a point/range predicate on this
  * key actually skip files under this layout?" File-skipping (parquet
  * row-group / micro-partition min-max pruning) is the single biggest
  * scan lever at 100 TB, and it works exactly when per-file key
  * intervals DON'T overlap. The clustering-depth histogram quantifies
  * the overlap (Snowflake's clustering-information metric): depth d at
  * a key point = how many files a point predicate there must read;
  * a well-clustered layout reads 1–2, an ingestion-ordered layout on
  * an uncorrelated key reads ~all of them.
  *
  * Computation is the endpoint sweep: per-file [lo, hi] intervals →
  * ±1 events at lo / hi+1 → cumulative depth between consecutive
  * distinct endpoints → histogram over depth. Everything after the
  * per-file min/max aggregation runs on FILE-cardinality frames (≤ 2F
  * endpoint rows — the global window is dimension-bounded, the q327
  * histogram-window class, never a row sort).
  */
object Layout {

  /** Depth histogram of the per-`file` [min, max] intervals of an
    * integer `key`: for each observed depth, how many key-axis
    * segments sit at that depth and how much key-span they cover.
    * Uncovered stretches (depth 0) are not emitted.
    *
    * @return (depth, n_segments, span_total) */
  def clusteringDepthHistogram(df: DataFrame, file: Column, key: Column)
      : DataFrame = {
    val files = df.select(file.as("__f"), key.cast("long").as("__k"))
      .filter(col("__k").isNotNull)
      .groupBy(col("__f"))
      .agg(min(col("__k")).as("__lo"), max(col("__k")).as("__hi"))
    val events = files.select(col("__lo").as("pos"), lit(1L).as("delta"))
      .unionAll(files.select((col("__hi") + 1).as("pos"),
        lit(-1L).as("delta")))
      .groupBy(col("pos")).agg(sum(col("delta")).as("delta"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("pos"))
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events
      .withColumn("depth", sum(col("delta")).over(wCum))
      .withColumn("__next", lead(col("pos"), 1).over(w))
      .filter(col("depth") > 0 && col("__next").isNotNull)
      .withColumn("span", col("__next") - col("pos"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_segments"), sum(col("span")).as("span_total"))
  }

  /** DuckDB oracle for [[clusteringDepthHistogram]]. `innerSql` yields
    * (f, k BIGINT). */
  def clusteringDepthOracleSql(innerSql: String): String =
    s"""WITH src AS ($innerSql),
       |files AS (
       |  SELECT f, CAST(min(k) AS BIGINT) AS lo,
       |         CAST(max(k) AS BIGINT) AS hi
       |  FROM src WHERE k IS NOT NULL GROUP BY 1
       |), ev AS (
       |  SELECT pos, CAST(sum(delta) AS BIGINT) AS delta FROM (
       |    SELECT lo AS pos, 1 AS delta FROM files
       |    UNION ALL SELECT hi + 1, -1 FROM files)
       |  GROUP BY 1
       |), sw AS (
       |  SELECT pos,
       |         CAST(sum(delta) OVER (ORDER BY pos) AS BIGINT) AS depth,
       |         lead(pos) OVER (ORDER BY pos) AS nxt
       |  FROM ev
       |)
       |SELECT depth, CAST(count(*) AS BIGINT) AS n_segments,
       |       CAST(sum(nxt - pos) AS BIGINT) AS span_total
       |FROM sw WHERE depth > 0 AND nxt IS NOT NULL
       |GROUP BY 1""".stripMargin
}
