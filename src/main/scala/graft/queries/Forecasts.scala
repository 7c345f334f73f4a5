package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The FORECASTING family over the hourly event series: Holt linear,
  * Holt-Winters, robust STL decomposition, and the bake-off
  * model-selection table. Split from [[Analytics]] (round 10) purely
  * mechanically -- query names, semantics, and oracles unchanged; the
  * operators live in [[graft.ops.Forecasting]] (mixed into
  * graft.ops.TimeSeries).
  */
object Forecasts extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Forecast bake-off on q324's hourly series: last-6-hours holdout,
    // exact-integer MAE for naive / seasonal-naive(24) / drift, winner
    // per type — the model-selection table the forecasting family
    // motivates but never tabulated.
    "q368_forecast_bakeoff" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("h"))
        .agg(count(lit(1)).as("c"))
      graft.ops.TimeSeries.forecastBakeoff(hourly, "event_type", "h",
        col("c"))
    }),

    "q324_holt_forecast" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("h"))
        .agg(count(lit(1)).as("c"))
      graft.ops.TimeSeries.holtLinear(hourly, "event_type", "h", "h",
        col("c"))
    }),

    // Holt-Winters additive forecast of the hourly series per type,
    // period 24: the q324 fold plus an in-place 24-slot seasonal state
    // — the deseasonalized next-hour forecast a daily cycle demands
    // (Holt alone chases the cycle as trend). The series densifies to
    // a zero-filled hour grid first so observation index stays aligned
    // with hour-of-day (gaps would shear the seasonal slots).
    // Robust seasonal decomposition of the same dense hourly grid:
    // moving-median trend + per-phase median seasonal — the
    // spike-immune sibling of q325's Holt-Winters fit; every output an
    // exact long (lower medians are sorted-element picks, no floats).
    "q344_robust_stl" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("h"))
        .agg(count(lit(1)).as("c"))
      val dense = hourly.groupBy(col("event_type"))
        .agg(min(col("h")).as("__lo"), max(col("h")).as("__hi"))
        .select(col("event_type"),
          explode(sequence(col("__lo"), col("__hi"))).as("h"))
        .join(hourly, Seq("event_type", "h"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      graft.ops.TimeSeries.robustDecompose(dense, "event_type", "h",
        col("c"), period = 24)
    }),

    "q325_holt_winters" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("h"))
        .agg(count(lit(1)).as("c"))
      val dense = hourly.groupBy(col("event_type"))
        .agg(min(col("h")).as("__lo"), max(col("h")).as("__hi"))
        .select(col("event_type"),
          explode(sequence(col("__lo"), col("__hi"))).as("h"))
        .join(hourly, Seq("event_type", "h"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      graft.ops.TimeSeries.holtWinters(dense, "event_type", "h", "h",
        col("c"), period = 24)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q344_robust_stl" ->
      graft.ops.TimeSeries.robustDecomposeOracleSql(
        """SELECT g.event_type, g.h, coalesce(s.c, 0) AS x
          |FROM (
          |  SELECT event_type, unnest(generate_series(lo, hi)) AS h
          |  FROM (SELECT event_type,
          |          min(epoch_us(ts) // 1000000 // 3600) AS lo,
          |          max(epoch_us(ts) // 1000000 // 3600) AS hi
          |        FROM events GROUP BY 1)
          |) g
          |LEFT JOIN (SELECT event_type,
          |             epoch_us(ts) // 1000000 // 3600 AS h,
          |             CAST(count(*) AS BIGINT) AS c
          |           FROM events GROUP BY 1, 2) s
          |  ON s.event_type = g.event_type AND s.h = g.h""".stripMargin,
        "event_type", "h", period = 24),

    "q325_holt_winters" ->
      graft.ops.TimeSeries.holtWintersOracleSql(
        """SELECT g.event_type, g.h AS t, g.h AS u, coalesce(s.c, 0) AS x
          |FROM (
          |  SELECT event_type, unnest(generate_series(lo, hi)) AS h
          |  FROM (SELECT event_type,
          |          min(epoch_us(ts) // 1000000 // 3600) AS lo,
          |          max(epoch_us(ts) // 1000000 // 3600) AS hi
          |        FROM events GROUP BY 1)
          |) g
          |LEFT JOIN (SELECT event_type,
          |             epoch_us(ts) // 1000000 // 3600 AS h,
          |             CAST(count(*) AS BIGINT) AS c
          |           FROM events GROUP BY 1, 2) s
          |  ON s.event_type = g.event_type AND s.h = g.h""".stripMargin,
        "event_type", period = 24, alphaNum = 1L, alphaDen = 2L,
        betaNum = 1L, betaDen = 4L, gammaNum = 1L, gammaDen = 4L),

    "q368_forecast_bakeoff" ->
      graft.ops.TimeSeries.forecastBakeoffOracleSql(
        """SELECT event_type AS k, h AS t, c AS x FROM (
          |  SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS h,
          |         CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2)""".stripMargin,
        "event_type"),

    "q324_holt_forecast" ->
      graft.ops.TimeSeries.holtLinearOracleSql(
        """SELECT event_type, h AS t, h AS u, c AS x FROM (
          |  SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS h,
          |         CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY 1, 2)""".stripMargin,
        "event_type", alphaNum = 1L, alphaDen = 2L,
        betaNum = 1L, betaDen = 4L, horizon = 1L),
  )
}
