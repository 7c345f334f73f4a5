package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._

/** Time-series diagnostics and statistical-audit family over the
  * events stream: robust trends (Theil–Sen, stationarity, detrended
  * outliers), seasonality/CCF/MASE backtests, quantile and PSI drift
  * series, forecast reconciliation and conformal intervals, KMV/KS/
  * Wasserstein/capture-recapture estimators, bootstrap CIs, peak
  * concurrency and burst rates. Split from [[Analytics]] (round 11)
  * purely mechanically — query names, semantics, and oracles
  * unchanged.
  */
object SeriesStats extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Theil–Sen robust slope per event type over the hourly series —
    // the outlier-proof magnitude between q216's OLS fit and q175's
    // yes/no Mann–Kendall; median pairwise slope by discrete rank.
    "q234_theil_sen" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("h"))
        .agg(count(lit(1)).as("c"))
      TimeSeries.theilSen(hourly, Seq("event_type"), "h", "c")
    }),

    // Peak concurrency per day: max simultaneously-open activity
    // intervals (the q214 intervals) — capacity sizing that event
    // counting understates whenever intervals outlive the window.
    "q304_peak_concurrency" -> ((s, dir) => {
      val iv = Tables(s, dir).events.select(
        expr("CAST(CAST(ts AS DATE) AS STRING)").as("day"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("s"),
        (expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000") +
          expr("CAST(floor(value) AS LONG)")).as("e"))
      Windows.peakConcurrency(iv, "day", "s", "e")
    }),

    // Stationary distribution of the q173 behavioral chain: where
    // users END UP — integer micro power iteration, PageRank's device
    // on the transition matrix; truncation leak reported, not hidden.
    "q302_stationary" -> ((s, dir) =>
      TimeSeries.stationaryDistribution(Tables(s, dir).events,
        col("user_id"), col("event_type"),
        Seq(col("ts"), col("event_id")))),

    // Quantile TREND: p50/p90 value per (type, week) — the latency-
    // dashboard series; per-group discrete quantiles over the weekly
    // histograms, q40's machinery swept through time. Rational (num,
    // den) ranks: 9/10 stays ⌈9n/10⌉ in exact integers where float
    // 0.9·n ceils to the max on every n divisible by 10.
    "q297_quantile_trend" -> ((s, dir) =>
      Quantiles.exactRatio(
        Tables(s, dir).events
          .withColumn("w", expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 86400 div 7")),
        Seq(col("event_type"), col("w")),
        Exact.cents(col("value")), Seq((1, 2), (9, 10)))),

    // PSI time series: every post-boundary day binned in the frozen
    // pre-boundary decile coordinates, one PSI per day — WHEN drift
    // started and whether it is still moving, where q196 only says IF.
    "q293_psi_series" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .withColumn("cents", Exact.cents(col("value")))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      graft.ops.Profiling.psiSeries(
        ev.filter(col("ts") < cut).select(col("cents")),
        ev.filter(col("ts") >= cut)
          .select(expr("CAST(CAST(ts AS DATE) AS STRING)").as("day"),
            col("cents")),
        col("cents"), col("day"), (1 to 9).map(i => (i, 10)))
    }),

    // New-category drift: values the post-boundary slice carries that
    // the reference never saw — the enum/allowlist break distribution
    // tests blur into "some drift".
    "q294_new_categories" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .withColumn("band", expr(
          "CAST(round(value * 100) AS LONG) div 2500"))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      graft.ops.Profiling.newCategories(
        ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
        Seq("event_type", "band"))
    }),

    // Hierarchical forecast reconciliation: per-type final-day naive
    // forecasts scaled to the independent week/7 total so the
    // hierarchy ADDS UP — the property planning consumers assume.
    "q288_forecast_reconcile" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val bottoms = ev
        .filter(col("ts") >= lit("2024-01-30 00:00:00").cast("timestamp"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("f"))
      val top = ev
        .filter(col("ts") >= lit("2024-01-24 00:00:00").cast("timestamp"))
        .agg(expr("count(1) div 7").as("t_total"))
      TimeSeries.reconcileForecasts(bottoms, Seq("event_type"), "f", top)
    }),

    // Split-conformal interval audit: per-type trend intervals sized
    // on the front half (rank-⌈0.9n⌉ |residual|), coverage MEASURED on
    // the back half — are the uncertainty bands honest.
    "q276_conformal" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("t"))
        .agg(count(lit(1)).as("x"))
      TimeSeries.conformalAudit(hourly, Seq("event_type"), "t", "x",
        cutoff = 473712L)
    }),

    // KMV set algebra: Jaccard/union/intersection of the click-user
    // and purchase-user sets from two k-minimum-value sketches —
    // sketch-sized frames, never the union, fully oracle-able.
    "q268_kmv_jaccard" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      Sketches.kmvJaccard(
        ev.filter(col("event_type") === "click").select(col("user_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id")),
        col("user_id"), k = 256)
    }),

    // Top-2 event types per user cohort with an __other__ rollup —
    // per-group sums still reconcile with the table, unlike a bare
    // top-k that silently drops the tail.
    "q269_topk_other" -> ((s, dir) =>
      Ranking.topKWithOther(
        Tables(s, dir).events
          .withColumn("cohort", pmod(col("user_id"), lit(10L))),
        "cohort", "event_type", k = 2)),

    // Wasserstein-1 distance across the same boundary as q259: how
    // much mass moved how far (in cents) — the magnitude KS's max-gap
    // verdict can't give; exact integer ECDF-area fold.
    "q261_wasserstein" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(Exact.cents(col("value")).as("cents"), col("ts"))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      graft.ops.Profiling.wasserstein1(
        ev.filter(col("ts") < cut).select(col("cents")),
        ev.filter(col("ts") >= cut).select(col("cents")),
        col("cents"))
    }),

    // Order-invariant table digest: one XOR fold of portable row
    // hashes — "are these tables identical" as a single number, the
    // migration-verification primitive this repo's own gate embodies.
    "q262_table_digest" -> ((s, dir) =>
      graft.ops.Profiling.tableDigest(
        Tables(s, dir).orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority"),
          Exact.cents(col("o_totalprice")).as("cents")),
        Seq("o_orderkey", "o_custkey", "o_orderpriority", "cents"))),

    // Linear interpolation of 10-minute purchase-count gaps: the
    // straight-line gauge imputation q156's forward-fill can't give;
    // exact integer milli-units with portable floor division.
    "q263_interpolate" -> ((s, dir) => {
      val buckets = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .groupBy(expr(
          "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 600")
          .as("t"))
        .agg(count(lit(1)).as("x"))
        .withColumn("k", lit("purchase"))
      TimeSeries.interpolateLinear(buckets, Seq("k"), "t", "x")
    }),

    // Two-sample KS test on the value distribution across the
    // mid-month boundary — the binning-free drift verdict next to
    // q196's PSI; exact cross-multiplied ECDF gap + literal-critical
    // reject flag.
    "q259_ks_test" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(Exact.cents(col("value")).as("cents"), col("ts"))
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      graft.ops.Profiling.ksTest(
        ev.filter(col("ts") < cut).select(col("cents")),
        ev.filter(col("ts") >= cut).select(col("cents")),
        col("cents"))
    }),

    // Chapman capture–recapture: total-user estimate from two daily
    // activity samples and their overlap — the population count no
    // single day's scan can see; exact integer Chapman form.
    "q260_capture_recapture" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("user_id"), expr("CAST(ts AS DATE)").as("d"))
      graft.ops.Profiling.chapmanEstimate(
        ev.filter(col("d") === lit("2024-01-10").cast("date")),
        ev.filter(col("d") === lit("2024-01-20").cast("date")),
        Seq("user_id"))
    }),

    // Peak burst rate: max events inside ANY sliding 60s window per
    // user (VALUE-ranged frame — gaps don't leak) — the rate-limit
    // signal q08's fixed hourly buckets understate at boundaries.
    "q255_burst_rate" -> ((s, dir) =>
      Windows.peakWindowRate(Tables(s, dir).events, "user_id", "ts",
        windowSeconds = 60L)),

    // Deterministic Poisson bootstrap: 32 hash-weighted replicates of
    // the mean value in one pass — auditable CIs (identical replicates
    // on every engine/run); literal Poisson cutoffs, no RNG.
    "q256_bootstrap" -> ((s, dir) =>
      Sampling.bootstrapMeans(
        Tables(s, dir).events.select(col("event_id"),
          Exact.cents(col("value")).as("cents")),
        "event_id", col("cents"), b = 32)),

    // Detrended outliers: hourly counts z-scored against each type's
    // OLS trend residuals — spikes on ramps stop hiding inside the
    // ramp's variance (q07's global-z false negative).
    "q251_detrended" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("t"))
        .agg(count(lit(1)).as("x"))
      TimeSeries.detrendedOutliers(hourly, Seq("event_type"), "t", "x",
        zThreshold = 2.5)
    }),

    // KMV distinct-count sketch: per event type, distinct users
    // estimated from the 64 smallest portable hashes — the ORACLE-ABLE
    // approximate counter (HLL's sketch bytes never hash-match; KMV's
    // order statistics do), mergeable, ~12% error at k=64.
    "q247_kmv_distinct" -> ((s, dir) =>
      Sketches.kmvDistinct(Tables(s, dir).events, "event_type",
        col("user_id"), k = 64)),

    // Cross-correlation at lags ±3h between the click and purchase
    // hourly series: does clicking LEAD buying — the lead-lag question
    // q174's autocorrelation answers only within one series.
    "q241_ccf" -> ((s, dir) => {
      def hourly(typ: String) = Tables(s, dir).events
        .filter(col("event_type") === typ)
        .groupBy(expr(
          "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
          .as("t"))
        .agg(count(lit(1)).as("x"))
      TimeSeries.crossCorrelation(hourly("click"), hourly("purchase"),
        "t", "x", maxLag = 3)
    }),

    // Seasonality strength: variance share explained by the
    // hour-of-day profile per event type — the gate that decides
    // whether q235's seasonal-naive baseline is even meaningful.
    "q242_seasonality" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("h"))
        .agg(count(lit(1)).as("c"))
      TimeSeries.seasonalityStrength(hourly, Seq("event_type"), "h", "c",
        season = 24L)
    }),

    // MASE backtest: seasonal-naive (24h) forecast on the back half of
    // the month, scaled by the train half's one-step naive MAE — the
    // scale-free "is a model even worth it" number per event type.
    "q235_mase" -> ((s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000 div 3600")
            .as("h"))
        .agg(count(lit(1)).as("c"))
      // 473712 = epoch-hour of 2024-01-16T00:00Z (the q196/q228 boundary)
      TimeSeries.maseBacktest(hourly, Seq("event_type"), "h", "c",
        season = 24L, cutoff = 473712L)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q234_theil_sen" -> TimeSeries.theilSenOracleSql(
      """SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events GROUP BY 1, 2""".stripMargin,
      Seq("event_type")),

    "q304_peak_concurrency" -> Windows.peakConcurrencyOracleSql(
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |       epoch_us(ts) // 1000000 AS s,
        |       epoch_us(ts) // 1000000 + CAST(floor(value) AS BIGINT)
        |         AS e
        |FROM events""".stripMargin,
      "day"),

    "q302_stationary" -> TimeSeries.stationaryOracleSql(
      """SELECT prev_type AS i, next_type AS j, p_micro FROM (
        |  SELECT prev_type, next_type,
        |         CAST(count(*) * 1000000 // sum(count(*))
        |           OVER (PARTITION BY prev_type) AS BIGINT) AS p_micro
        |  FROM (
        |    SELECT event_type AS next_type,
        |           lag(event_type) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS prev_type
        |    FROM events
        |  ) WHERE prev_type IS NOT NULL
        |  GROUP BY 1, 2
        |)""".stripMargin),

    "q297_quantile_trend" ->
      """WITH ranked AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 1000000 // 86400 // 7 AS w,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY event_type,
        |           epoch_us(ts) // 1000000 // 86400 // 7
        |           ORDER BY CAST(round(value * 100) AS BIGINT)) AS rn,
        |         count(*) OVER (PARTITION BY event_type,
        |           epoch_us(ts) // 1000000 // 86400 // 7) AS n
        |  FROM events
        |)
        |SELECT event_type, w,
        |       max(CASE WHEN rn = (1 * n + 1) // 2 THEN cents END) AS p50,
        |       max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS p90
        |FROM ranked GROUP BY 1, 2""".stripMargin,

    "q293_psi_series" -> graft.ops.Profiling.psiSeriesOracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
        |WHERE ts < TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS w,
        |       CAST(round(value * 100) AS BIGINT) AS v
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      (1 to 9).map(i => (i, 10))),

    "q294_new_categories" -> graft.ops.Profiling.newCategoriesOracleSql(
      """SELECT event_type,
        |       CAST(round(value * 100) AS BIGINT) // 2500 AS band
        |FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      """SELECT event_type,
        |       CAST(round(value * 100) AS BIGINT) // 2500 AS band
        |FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      Seq("event_type", "band")),

    "q288_forecast_reconcile" -> TimeSeries.reconcileForecastsOracleSql(
      """SELECT event_type, CAST(count(*) AS BIGINT) AS f FROM events
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        |GROUP BY 1""".stripMargin,
      Seq("event_type"),
      """SELECT CAST(count(*) // 7 AS BIGINT) AS t_total FROM events
        |WHERE ts >= TIMESTAMP '2024-01-24 00:00:00'""".stripMargin),

    "q276_conformal" -> TimeSeries.conformalAuditOracleSql(
      """SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events GROUP BY 1, 2""".stripMargin,
      Seq("event_type"), cutoff = 473712L),

    "q268_kmv_jaccard" -> Sketches.kmvJaccardOracleSql(
      """SELECT CAST(user_id AS VARCHAR) AS v FROM events
        |WHERE event_type = 'click'""".stripMargin,
      """SELECT CAST(user_id AS VARCHAR) AS v FROM events
        |WHERE event_type = 'purchase'""".stripMargin,
      k = 256),

    "q269_topk_other" -> {
      """WITH e AS (
        |  SELECT user_id % 10 AS cohort, event_type FROM events
        |), c AS (
        |  SELECT cohort, event_type, CAST(count(*) AS BIGINT) AS n0
        |  FROM e GROUP BY 1, 2
        |), l AS (
        |  SELECT cohort,
        |    CASE WHEN row_number() OVER (PARTITION BY cohort
        |      ORDER BY n0 DESC, event_type) <= 2
        |      THEN CAST(event_type AS VARCHAR) ELSE '__other__' END
        |      AS label,
        |    n0
        |  FROM c
        |)
        |SELECT cohort, label, CAST(sum(n0) AS BIGINT) AS n,
        |       CAST(count(*) AS BIGINT) AS n_dims
        |FROM l GROUP BY 1, 2""".stripMargin
    },

    "q261_wasserstein" -> graft.ops.Profiling.wasserstein1OracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
        |WHERE ts < TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      """SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
        |WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""".stripMargin),

    "q262_table_digest" -> graft.ops.Profiling.tableDigestOracleSql(
      """SELECT o_orderkey, o_custkey, o_orderpriority,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders""".stripMargin,
      Seq("o_orderkey", "o_custkey", "o_orderpriority", "cents")),

    "q263_interpolate" -> TimeSeries.interpolateOracleSql(
      """SELECT 'purchase' AS k, epoch_us(ts) // 1000000 // 600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events WHERE event_type = 'purchase' GROUP BY 2""".stripMargin,
      Seq("k")),

    "q259_ks_test" -> graft.ops.Profiling.ksTestOracleSql(
      """SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
        |WHERE ts < TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
      """SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
        |WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'""".stripMargin),

    "q260_capture_recapture" -> graft.ops.Profiling.chapmanOracleSql(
      "SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'",
      "SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-20'",
      Seq("user_id")),

    "q255_burst_rate" -> Windows.peakWindowRateOracleSql(
      "events", "user_id", "ts", windowSeconds = 60L),

    "q256_bootstrap" -> Sampling.bootstrapOracleSql(
      """SELECT event_id, CAST(round(value * 100) AS BIGINT) AS y
        |FROM events""".stripMargin,
      "event_id", b = 32),

    "q251_detrended" -> TimeSeries.detrendedOutliersOracleSql(
      """SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events GROUP BY 1, 2""".stripMargin,
      Seq("event_type"), zThreshold = 2.5),

    "q247_kmv_distinct" -> Sketches.kmvOracleSql(
      "SELECT event_type, CAST(user_id AS VARCHAR) AS v FROM events",
      "event_type", k = 64),

    "q241_ccf" -> TimeSeries.crossCorrelationOracleSql(
      """SELECT epoch_us(ts) // 1000000 // 3600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events WHERE event_type = 'click' GROUP BY 1""".stripMargin,
      """SELECT epoch_us(ts) // 1000000 // 3600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
      maxLag = 3),

    "q242_seasonality" -> TimeSeries.seasonalityStrengthOracleSql(
      """SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events GROUP BY 1, 2""".stripMargin,
      Seq("event_type"), season = 24L),

    "q235_mase" -> TimeSeries.maseOracleSql(
      """SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS t,
        |       CAST(count(*) AS BIGINT) AS x
        |FROM events GROUP BY 1, 2""".stripMargin,
      Seq("event_type"), season = 24L, cutoff = 473712L)
  )
}
