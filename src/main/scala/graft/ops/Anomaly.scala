package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Z-score anomaly detection + the reference's plain-Python scalar logic
  * as Spark expressions.
  *
  * A2/F5 (`/root/reference/spark_apps/advanced_analytics.py:174-196`): the
  * reference computes global mean/stddev, `collect()`s them to the driver
  * and re-injects them as literals — a driver round-trip per micro-batch.
  * Here the single-row stats frame is `crossJoin(broadcast(...))`ed instead
  * (SURVEY §7.3): no driver round-trip, one tiny broadcast, and the whole
  * plan stays lazy/optimizable. At 100 TB the facts side never shuffles —
  * the stats side is one row.
  *
  * X1 KDA (`monitoring/metrics_collector.py:122-126`) and X2 severity
  * (`monitoring/alert_manager.py:366-396`) are plain Python in the
  * reference; here they are codegen'd column expressions.
  */
object Anomaly {

  /** A2: exact global stats of a cents column: `n`, `s` (sum), `ss` (sum of
    * squares as DECIMAL(38,0) — cents² sums can exceed int64; DuckDB side
    * uses HUGEINT). Returns a 1-row frame meant for `broadcast`. */
  def globalStats(df: DataFrame, centsCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n"),
      sum(col(centsCol)).as("s"),
      sum(col(centsCol).cast(DecimalType(38, 0)) * col(centsCol)).as("ss"))

  /** A2+F5: rows whose |z-score| on `centsCol` exceeds `threshold`, with the
    * score surfaced as `zscore`. Stats arrive via broadcast cross-join. */
  def zscoreFilter(df: DataFrame, centsCol: String, threshold: Double): DataFrame = {
    val stats = globalStats(df, centsCol)
    val mean = col("s").cast("double") / col("n")
    val sd = Exact.stddevFromSums(col("s"), col("ss"), col("n"))
    df.crossJoin(broadcast(stats))
      .withColumn("zscore", (col(centsCol).cast("double") - mean) / sd)
      .filter(abs(col("zscore")) > lit(threshold))
      .drop("n", "s", "ss")
  }

  /** X1: deaths flag + KDA ratio with the div-by-zero guard (P7 `greatest`). */
  def kda(kills: Column, assists: Column, deaths: Column): Column =
    (kills + assists) / greatest(deaths, lit(1))

  /** X2: chained CASE severity classification (HIGH/MEDIUM/LOW gates from
    * `monitoring/alert_manager.py:387-394`). */
  def severity(kills: Column, damage: Column, zscores: Seq[Column]): Column = {
    def anyZ(t: Double) = zscores.map(z => abs(z) >= t).reduce(_ || _)
    when(kills >= 20 || damage >= 4000 || anyZ(4.0), "HIGH")
      .when(kills >= 15 || damage >= 2500 || anyZ(3.0), "MEDIUM")
      .otherwise("LOW")
  }
}
