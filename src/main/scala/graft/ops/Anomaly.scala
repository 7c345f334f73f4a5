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
    * score surfaced as `zscore`. Stats arrive via broadcast cross-join
    * under reserved `__`-prefixed names (an input owning a column named
    * `n`/`s`/`ss` would otherwise be ambiguous or silently dropped).
    *
    * Degenerate-stats guard: with a constant column sd = 0 and the
    * z-score is 0/0 = NaN — both engines rank NaN ABOVE every double, so
    * an unguarded `abs(zscore) > t` would flag 100% of rows precisely
    * when nothing deviates; with n = 1 the sample-variance division by
    * n−1 is a hard DIVIDE_BY_ZERO under ANSI mode. The n-gate is a lazy
    * conditional (ANSI only evaluates the taken branch), and such frames
    * yield zero anomalies instead. */
  def zscoreFilter(df: DataFrame, centsCol: String, threshold: Double): DataFrame = {
    val stats = globalStats(df, centsCol)
      .select(col("n").as("__n"), col("s").as("__s"), col("ss").as("__ss"))
    val mean = col("__s").cast("double") / col("__n")
    val sd = Exact.stddevFromSums(col("__s"), col("__ss"), col("__n"))
    df.crossJoin(broadcast(stats))
      .withColumn("__sd", when(col("__n") > 1, sd))
      .withColumn("zscore", (col(centsCol).cast("double") - mean) / col("__sd"))
      .filter(col("__sd") > 0 && abs(col("zscore")) > lit(threshold))
      .drop("__n", "__s", "__ss", "__sd")
  }

  /** X1: deaths flag + KDA ratio with the div-by-zero guard (P7 `greatest`). */
  def kda(kills: Column, assists: Column, deaths: Column): Column =
    (kills + assists) / greatest(deaths, lit(1))

  /** X2: chained CASE severity classification (HIGH/MEDIUM/LOW gates from
    * `monitoring/alert_manager.py:387-394`). */
  def severity(kills: Column, damage: Column, zscores: Seq[Column]): Column = {
    // foldLeft, not reduce: an empty zscores list means "no z gates", not
    // an empty-reduce crash at plan build
    def anyZ(t: Double) =
      zscores.foldLeft(lit(false))((acc, z) => acc || (abs(z) >= t))
    when(kills >= 20 || damage >= 4000 || anyZ(4.0), "HIGH")
      .when(kills >= 15 || damage >= 2500 || anyZ(3.0), "MEDIUM")
      .otherwise("LOW")
  }
}
