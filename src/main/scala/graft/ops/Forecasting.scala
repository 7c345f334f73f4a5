package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The forecasting half of [[TimeSeries]] (mixed into that object, so
  * the public surface is unchanged — `TimeSeries.holtWinters` etc.):
  * offline changepoint scan, forecast reconciliation, conformal
  * interval audit, MASE backtest, the three-baseline forecast
  * bake-off, and the Holt / Holt-Winters exponential-smoothing family.
  * Split out mechanically when the file passed the repo's 1,500-line
  * bar (round-9 item 5); the decomposition/trend half stays in
  * `TimeSeries.scala`. Module invariants (calendar-bounded series,
  * integer-exact folds, per-key single-shuffle shape) are stated on the
  * [[TimeSeries]] object doc and hold unchanged here.
  */
private[ops] trait TimeSeriesForecasting {

  /** Implemented by [[TimeSeries]] (the trend half) — [[conformalAudit]]
    * detrends its calibration residuals with it. */
  def linearTrend(series: DataFrame, keyCols: Seq[String], tCol: String,
      xCol: String): DataFrame

  /** Single changepoint detection per key (binary segmentation, one
    * split): the boundary b that minimizes the two-segment squared
    * error over an integer series — "WHEN did the level shift", where
    * [[graft.ops.Anomaly.cusumAlarms]] answers "that it shifted, as it
    * happened". Offline and exact-input: per-candidate costs derive
    * from running (n, Σ, Σ²) prefix windows over the calendar-bounded
    * series, the argmin breaks ties on the earlier boundary, and the
    * variance-reduction ratio says whether the split is real.
    *
    * Cost algebra: segment SSE = Σy² − (Σy)²/n, summed over both
    * sides — Σ-terms are exact integers; each candidate's cost is one
    * fixed IEEE expression, so the argmin row_number (cost asc, b asc)
    * orders identically cross-engine.
    *
    * @return keyCols ++ (b, n, cost_split, cost_flat, gain_frac) — b
    *         the last index of the left segment (1-based position in
    *         series order)
    */
  def changepoint(series: DataFrame, keyCols: Seq[String], tCol: String,
      xCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val pre = series
      .withColumn("b", row_number().over(w).cast("long"))
      .withColumn("cs", sum(col(xCol)).over(wRun))
      .withColumn("css", sum(col(xCol) * col(xCol)).over(wRun))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("ts", sum(col(xCol)).over(wAll))
      .withColumn("tss", sum(col(xCol) * col(xCol)).over(wAll))
      .filter(col("b") < col("n")) // both segments non-empty
    def sse(ss: Column, s: Column, k: Column) =
      ss.cast("double") - s.cast("double") * s.cast("double") / k
    val costSplit = sse(col("css"), col("cs"), col("b")) +
      sse(col("tss") - col("css"), col("ts") - col("cs"),
        col("n") - col("b"))
    val costFlat = sse(col("tss"), col("ts"), col("n"))
    val scored = pre
      .withColumn("cost_split", costSplit)
      .withColumn("cost_flat", costFlat)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("cost_split"), col("b"))))
      .filter(col("__rn") === 1)
    scored.select(keyCols.map(col) ++ Seq(col("b"), col("n"),
        col("cost_split"), col("cost_flat"),
        when(col("cost_flat") > 0,
          (col("cost_flat") - col("cost_split")) / col("cost_flat"))
          .as("gain_frac")): _*)
  }

  /** DuckDB oracle for [[changepoint]]: `innerSql` yields
    * (keyCols..., t, x). */
  def changepointOracleSql(innerSql: String, keyCols: Seq[String])
      : String = {
    val keys = keyCols.mkString(", ")
    def sse(ss: String, s: String, k: String) =
      s"(CAST($ss AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE) / ($k))"
    val costSplit = sse("css", "cs", "b") +
      " + " + sse("tss - css", "ts - cs", "n - b")
    val costFlat = sse("tss", "ts", "n")
    s"""WITH pre AS (
       |  SELECT $keys,
       |    CAST(row_number() OVER w AS BIGINT) AS b,
       |    CAST(sum(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS cs,
       |    CAST(sum(x * x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
       |      AND CURRENT ROW) AS BIGINT) AS css,
       |    CAST(count(*) OVER (PARTITION BY $keys) AS BIGINT) AS n,
       |    CAST(sum(x) OVER (PARTITION BY $keys) AS BIGINT) AS ts,
       |    CAST(sum(x * x) OVER (PARTITION BY $keys) AS BIGINT) AS tss
       |  FROM ($innerSql)
       |  WINDOW w AS (PARTITION BY $keys ORDER BY t)
       |), cand AS (
       |  SELECT *, $costSplit AS cost_split, $costFlat AS cost_flat,
       |         row_number() OVER (PARTITION BY $keys
       |           ORDER BY $costSplit, b) AS rn
       |  FROM pre WHERE b < n
       |)
       |SELECT $keys, b, n, cost_split, cost_flat,
       |       CASE WHEN cost_flat > 0 THEN
       |         (cost_flat - cost_split) / cost_flat
       |       END AS gain_frac
       |FROM cand WHERE rn = 1""".stripMargin
  }

  /** HIERARCHICAL forecast reconciliation (proportional / top-down
    * blend): per-key bottom-up forecasts rarely sum to the
    * independently-made total forecast — reconcile by scaling each
    * bottom forecast to the total, `r_i = f_i·T / Σf`, so the hierarchy
    * ADDS UP (the property every planning consumer silently assumes).
    * Integer milli-units, exact division.
    *
    * OVERFLOW LEDGER (int64, non-ANSI Spark wraps silently where DuckDB
    * errors): f·T·1000 must stay under 2⁶³, i.e. f·T < 9.2·10¹⁵ — a
    * per-key forecast of 10⁶ against a total of 10⁹ is fine; forecasts
    * of raw event counts at the 10⁹/10⁹ scale are not. Pre-divide both
    * sides by a common unit (thousands) before reconciling in that
    * regime. Same convention as [[graft.ops.Features.shrunkRates]].
    *
    * @param bottoms one row per key: (keyCols..., f) integer forecasts
    * @param top     ONE row with the independent total forecast under
    *                `t_total` (broadcast — the stat-broadcast idiom)
    * @return (keyCols..., f, sum_f, t_total, reconciled_milli,
    *         reconciled)
    */
  def reconcileForecasts(bottoms: DataFrame, keyCols: Seq[String],
      fCol: String, top: DataFrame): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    bottoms.select(keyCols.map(col) :+ col(fCol).as("f"): _*)
      .withColumn("sum_f", sum(col("f")).over(wAll))
      .crossJoin(broadcast(top.select(col("t_total"))))
      .withColumn("reconciled_milli",
        when(col("sum_f") > 0,
          expr("(f * t_total * 1000L) div sum_f")))
      .withColumn("reconciled",
        col("reconciled_milli").cast("double") / 1000.0)
  }

  /** DuckDB oracle for [[reconcileForecasts]]: `innerSql` yields
    * (keyCols..., f); `topSql` yields one `t_total` row. */
  def reconcileForecastsOracleSql(innerSql: String,
      keyCols: Seq[String], topSql: String): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH b AS ($innerSql), t AS (
       |  SELECT *, CAST(sum(f) OVER () AS BIGINT) AS sum_f FROM b
       |), tp AS ($topSql)
       |SELECT $keys, f, sum_f, t_total,
       |       CAST(CASE WHEN sum_f > 0 THEN
       |         (f * t_total * 1000) // sum_f END AS BIGINT)
       |         AS reconciled_milli,
       |       CAST(CASE WHEN sum_f > 0 THEN
       |         (f * t_total * 1000) // sum_f END AS DOUBLE)
       |         / 1000.0 AS reconciled
       |FROM t CROSS JOIN tp""".stripMargin
  }

  /** SPLIT-CONFORMAL interval audit over the per-key OLS trend: fit on
    * the calibration span, take the rank-⌈q·n⌉ absolute residual as the
    * interval half-width (the distribution-free conformal guarantee:
    * ≥ q coverage on exchangeable data), then MEASURE coverage on the
    * held-out span — the "are my uncertainty bands honest" audit, which
    * a model that merely reports variance never gets.
    *
    * Residuals quantized to integer millis (the q251 device); the
    * width is a discrete histogram quantile (q40 convention,
    * cross-multiplied rank test); coverage is an exact count ratio.
    *
    * @param cutoff first `tCol` value of the held-out span
    * @return per key: (keyCols..., n_cal, width_milli, n_test,
    *         n_covered, coverage)
    */
  def conformalAudit(series: DataFrame, keyCols: Seq[String],
      tCol: String, xCol: String, cutoff: Long,
      qNum: Int = 9, qDen: Int = 10): DataFrame = {
    require(qNum > 0 && qDen > qNum)
    val s = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t"), col(xCol).as("__x")): _*)
    val cal = s.filter(col("__t") < cutoff)
    val fit = linearTrend(cal, keyCols, "__t", "__x")
      .filter(col("slope").isNotNull)
      .select(keyCols.map(col) :+ col("slope") :+ col("intercept"): _*)
    def resid(df: DataFrame) = df.join(broadcast(fit), keyCols)
      .withColumn("__r",
        abs(col("__x") - (col("intercept") + col("slope") * col("__t"))))
      .withColumn("__rq", (col("__r") * lit(1000.0)).cast("long"))
    val calR = resid(cal)
    val hist = calR.groupBy(keyCols.map(col) :+ col("__rq"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("__rq"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val widths = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("__n")).as("n_cal"),
        min(when(col("__cum") * qDen >= col("__n") * qNum, col("__rq")))
          .as("width_milli"))
    val test = resid(s.filter(col("__t") >= cutoff))
      .join(broadcast(widths), keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__rq") <= col("width_milli"), 1L).otherwise(0L))
          .as("n_covered"))
    widths.join(test, keyCols)
      .withColumn("coverage",
        when(col("n_test") > 0,
          col("n_covered").cast("double") / col("n_test")))
      .select(keyCols.map(col) ++ Seq(col("n_cal"), col("width_milli"),
        col("n_test"), col("n_covered"), col("coverage")): _*)
  }

  /** DuckDB oracle for [[conformalAudit]]: `innerSql` yields
    * (keyCols..., t, x) as integers. */
  def conformalAuditOracleSql(innerSql: String, keyCols: Seq[String],
      cutoff: Long, qNum: Int = 9, qDen: Int = 10): String = {
    val keys = keyCols.mkString(", ")
    val eqFit = keyCols.map(k => s"c.$k = fit.$k").mkString(" AND ")
    s"""WITH b AS ($innerSql), cal AS (
       |  SELECT * FROM b WHERE t < $cutoff
       |), f AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(t) AS BIGINT) AS sx, CAST(sum(x) AS BIGINT) AS sy,
       |         CAST(sum(t * t) AS BIGINT) AS sxx,
       |         CAST(sum(t * x) AS BIGINT) AS sxy
       |  FROM cal GROUP BY $keys
       |), fit AS (
       |  SELECT $keys,
       |    CAST(n * sxy - sx * sy AS DOUBLE)
       |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       |    (CAST(sy AS DOUBLE)
       |      - (CAST(n * sxy - sx * sy AS DOUBLE)
       |         / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n
       |      AS intercept
       |  FROM f WHERE n * sxx - sx * sx > 0
       |), calr AS (
       |  SELECT ${keyCols.map(k => s"c.$k").mkString(", ")},
       |    CAST(trunc(abs(c.x - (intercept + slope * c.t)) * 1000.0)
       |      AS BIGINT) AS rq
       |  FROM cal c JOIN fit ON $eqFit
       |), h AS (
       |  SELECT $keys, rq, CAST(count(*) AS BIGINT) AS cc
       |  FROM calr GROUP BY ${(1 to keyCols.length + 1).mkString(", ")}
       |), cum AS (
       |  SELECT *, CAST(sum(cc) OVER (PARTITION BY $keys ORDER BY rq
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cm,
       |    CAST(sum(cc) OVER (PARTITION BY $keys) AS BIGINT) AS n
       |  FROM h
       |), widths AS (
       |  SELECT $keys, max(n) AS n_cal,
       |         min(CASE WHEN cm * $qDen >= n * $qNum THEN rq END)
       |           AS width_milli
       |  FROM cum GROUP BY $keys
       |), testr AS (
       |  SELECT ${keyCols.map(k => s"c.$k").mkString(", ")},
       |    CAST(trunc(abs(c.x - (intercept + slope * c.t)) * 1000.0)
       |      AS BIGINT) AS rq
       |  FROM (SELECT * FROM b WHERE t >= $cutoff) c JOIN fit ON $eqFit
       |), tst AS (
       |  SELECT ${keyCols.map(k => s"testr.$k").mkString(", ")},
       |         CAST(count(*) AS BIGINT) AS n_test,
       |         CAST(sum(CASE WHEN rq <= width_milli THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_covered
       |  FROM testr JOIN widths USING ($keys)
       |  GROUP BY ${keyCols.map(k => s"testr.$k").mkString(", ")}
       |)
       |SELECT $keys, n_cal, width_milli, n_test, n_covered,
       |       CASE WHEN n_test > 0 THEN
       |         CAST(n_covered AS DOUBLE) / n_test END AS coverage
       |FROM widths JOIN tst USING ($keys)""".stripMargin
  }

  /** MASE backtest of the SEASONAL-NAIVE forecast: on the test span,
    * predict x(t) = x(t − season) and score the mean absolute error
    * SCALED by the train span's one-step-naive MAE — the
    * scale-free forecast quality number (MASE < 1 = beats naive;
    * Hyndman & Koehler 2006) that decides whether a fancier model is
    * worth shipping.
    *
    * Both error legs are keyed self-joins on exact lag keys (t−season /
    * t−1) — series gaps simply contribute no pair (documented; dense
    * series give the textbook MASE). Absolute errors sum as exact
    * longs; the two means and their ratio are fixed IEEE steps.
    *
    * @param cutoff first `tCol` value of the TEST span
    * @return (keyCols..., n_test, sae_test, n_naive, sae_naive, mase) —
    *         mase NULL when either leg is empty or train MAE is zero
    */
  def maseBacktest(series: DataFrame, keyCols: Seq[String], tCol: String,
      xCol: String, season: Long, cutoff: Long): DataFrame = {
    require(season >= 1)
    val s = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t"), col(xCol).as("__x")): _*)
    def lagErrors(lag: Long, keep: org.apache.spark.sql.Column,
        nName: String, saeName: String) = {
      val cur = s.select(
        keyCols.map(col) ++ Seq(col("__t"), col("__x")): _*)
      val prev = s.select(
        keyCols.map(col) ++ Seq((col("__t") + lag).as("__t"),
          col("__x").as("__xp")): _*)
      cur.join(prev, keyCols :+ "__t").filter(keep)
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as(nName),
          sum(abs(col("__x") - col("__xp"))).as(saeName))
    }
    val test = lagErrors(season, col("__t") >= cutoff, "n_test", "sae_test")
    val train = lagErrors(1L, col("__t") < cutoff, "n_naive", "sae_naive")
    test.join(train, keyCols)
      .withColumn("mase",
        when(col("n_test") > 0 && col("sae_naive") > 0,
          (col("sae_test").cast("double") / col("n_test")) /
            (col("sae_naive").cast("double") / col("n_naive"))))
  }

  /** DuckDB oracle for [[maseBacktest]]: `innerSql` yields
    * (keyCols..., t, x) as integers. */
  def maseOracleSql(innerSql: String, keyCols: Seq[String], season: Long,
      cutoff: Long): String = {
    val keys = keyCols.mkString(", ")
    val eq = keyCols.map(k => s"c.$k = p.$k").mkString(" AND ")
    val ck = keyCols.map(k => s"c.$k").mkString(", ")
    s"""WITH b AS ($innerSql), test AS (
       |  SELECT $ck, CAST(count(*) AS BIGINT) AS n_test,
       |         CAST(sum(abs(c.x - p.x)) AS BIGINT) AS sae_test
       |  FROM b c JOIN b p ON $eq AND c.t = p.t + $season
       |  WHERE c.t >= $cutoff GROUP BY $ck
       |), train AS (
       |  SELECT $ck, CAST(count(*) AS BIGINT) AS n_naive,
       |         CAST(sum(abs(c.x - p.x)) AS BIGINT) AS sae_naive
       |  FROM b c JOIN b p ON $eq AND c.t = p.t + 1
       |  WHERE c.t < $cutoff GROUP BY $ck
       |)
       |SELECT $keys, n_test, sae_test, n_naive, sae_naive,
       |       CASE WHEN n_test > 0 AND sae_naive > 0 THEN
       |         (CAST(sae_test AS DOUBLE) / n_test)
       |           / (CAST(sae_naive AS DOUBLE) / n_naive) END AS mase
       |FROM test JOIN train USING ($keys)""".stripMargin
  }

  /** Truncating-free FLOOR division through doubles — exact for
    * |a| < 2⁵³ and identical on both engines (DuckDB's `//` truncates
    * toward zero for negatives, so the shared formulation is
    * floor(double/double) instead). */
  private def fdiv(a: Column, d: Long): Column =
    floor(a.cast("double") / lit(d.toDouble)).cast("long")

  /** Holt LINEAR (double exponential) smoothing — the trend-aware step
    * up from EWMA the q157 family stops at: per key, fold the ordered
    * series through the coupled level/trend recurrence
    *   h₁ = x₁, b₁ = 0
    *   hₜ = ⌊(αn·xₜ + (αd−αn)·(hₜ₋₁+bₜ₋₁)) / αd⌋
    *   bₜ = ⌊(βn·(hₜ−hₜ₋₁) + (βd−βn)·bₜ₋₁) / βd⌋
    * in exact quantized integers (cents in, cents out — floor at each
    * step, both engines identical), and read out the final state plus
    * the k-step linear forecast h + k·b. A level-only EWMA lags a
    * trending series by a constant; Holt's trend term closes that gap —
    * the standard capacity-planning forecaster.
    *
    * Scale shape: the [[graft.ops.BinPack]] per-key sequential-fold
    * contract — ONE keyed shuffle collects each key's series (bounded
    * by the calendar, not the corpus: the module invariant), the fold
    * is a per-row array aggregate, and the DuckDB oracle replays the
    * identical recurrence as a recursive CTE.
    *
    * @return (keyCol, n, level, trend, forecast) — integer cents */
  /** Forecast BAKE-OFF over a trailing holdout — the model-selection
    * readout the forecasting family ([[holtLinear]]/[[holtWinters]]/
    * seasonal-naive MASE) motivates but never tabulates: per key, hold
    * out the last `holdout` observations, forecast them with the three
    * closed-form baselines, and report each method's exact-integer MAE
    * plus the winner:
    *
    *  - naive: last training value;
    *  - snaive: the value one `period` back (falls back to naive for
    *    horizons the training series is too short to reach);
    *  - drift: last + h·(last−first) div (n_train−1) (truncating
    *    division — portable on negatives, the CEM probe).
    *
    * One per-key position window, one bounded per-key scalar join, one
    * lagged self-equi-join for snaive, one aggregation. Positions are
    * OBSERVATION ranks (ties broken by the value — the [[holtLinear]]
    * total-order convention), so gaps don't shear the holdout.
    *
    * @return (keyCol, n_train, h_count, mae_naive, mae_snaive,
    *         mae_drift, best_method) — best ties break by method name;
    *         keys with fewer than holdout+2 observations drop out */
  def forecastBakeoff(df: DataFrame, keyCol: String, tsCol: String,
      valueCents: Column, period: Int = 24, holdout: Int = 6)
      : DataFrame = {
    // holdout ≤ period keeps snaive honest: every h reaches back into
    // the TRAINING series, never into holdout actuals
    require(period >= 1 && holdout >= 1 && holdout <= period)
    val W = org.apache.spark.sql.expressions.Window
    val pos = df
      .select(col(keyCol).as("k"), col(tsCol).as("__t"),
        valueCents.as("__x"))
      .withColumn("p", row_number().over(
        W.partitionBy(col("k")).orderBy(col("__t"), col("__x")))
        .cast("long"))
      .select(col("k"), col("p"), col("__x"))
      .persist() // holdout rows, snaive lag rows, and scalars all read it
    val scal = pos.groupBy(col("k"))
      .agg(count(lit(1)).as("__n"),
        min(when(col("p") === 1, col("__x"))).as("__x0"))
      .filter(col("__n") >= holdout + 2)
      .withColumn("__c", col("__n") - holdout)
    val last = pos.select(col("k"), col("p"), col("__x").as("__xl"))
      .join(scal, Seq("k"))
      .filter(col("p") === col("__c"))
      .select(col("k"), col("__n"), col("__c"), col("__x0"),
        col("__xl"))
    val hold = pos.select(col("k"), col("p"), col("__x").as("actual"))
      .join(last, Seq("k"))
      .filter(col("p") > col("__c"))
      .withColumn("h", col("p") - col("__c"))
    val sn = pos.select(col("k"),
      (col("p") + period).as("p"), col("__x").as("__xs"))
    val err = hold.join(sn, Seq("k", "p"), "left")
      .select(col("k"), col("__c"),
        abs(col("actual") - col("__xl")).as("e_naive"),
        abs(col("actual") - coalesce(col("__xs"), col("__xl")))
          .as("e_snaive"),
        abs(col("actual") - (col("__xl") +
          expr("(h * (__xl - __x0)) div (__c - 1)"))).as("e_drift"))
    err.groupBy(col("k"))
      .agg(min(col("__c")).as("n_train"),
        count(lit(1)).as("h_count"),
        sum(col("e_naive")).as("mae_naive"),
        sum(col("e_snaive")).as("mae_snaive"),
        sum(col("e_drift")).as("mae_drift"))
      .withColumn("best_method",
        when(col("mae_drift") < col("mae_naive") &&
          col("mae_drift") < col("mae_snaive"), lit("drift"))
          .when(col("mae_naive") <= col("mae_snaive"), lit("naive"))
          .otherwise(lit("snaive")))
      .select(col("k").as(keyCol), col("n_train"), col("h_count"),
        col("mae_naive"), col("mae_snaive"), col("mae_drift"),
        col("best_method"))
  }

  /** DuckDB oracle for [[forecastBakeoff]] — identical positions,
    * scalars, lag join, and integer errors. `baseSql` yields
    * (k, t, x). */
  def forecastBakeoffOracleSql(baseSql: String, keyName: String,
      period: Int = 24, holdout: Int = 6): String =
    s"""WITH b AS ($baseSql), p AS (
       |  SELECT k, x, CAST(row_number() OVER (PARTITION BY k
       |           ORDER BY t, x) AS BIGINT) AS p
       |  FROM b
       |), sc AS (
       |  SELECT k, CAST(count(*) AS BIGINT) AS n,
       |         min(CASE WHEN p = 1 THEN x END) AS x0
       |  FROM p GROUP BY 1 HAVING count(*) >= ${holdout + 2}
       |), lastv AS (
       |  SELECT p.k, sc.n, sc.n - $holdout AS c, sc.x0, p.x AS xl
       |  FROM p JOIN sc ON p.k = sc.k AND p.p = sc.n - $holdout
       |), hold AS (
       |  SELECT p.k, p.p, p.x AS actual, l.n, l.c, l.x0, l.xl,
       |         p.p - l.c AS h
       |  FROM p JOIN lastv l ON p.k = l.k
       |  WHERE p.p > l.c
       |), err AS (
       |  SELECT hold.k, hold.c,
       |         abs(actual - xl) AS e_naive,
       |         abs(actual - coalesce(sn.x, xl)) AS e_snaive,
       |         abs(actual - (xl + (h * (xl - x0)) // (c - 1)))
       |           AS e_drift
       |  FROM hold LEFT JOIN p sn
       |    ON hold.k = sn.k AND sn.p + $period = hold.p
       |)
       |SELECT k AS $keyName, CAST(min(c) AS BIGINT) AS n_train,
       |       CAST(count(*) AS BIGINT) AS h_count,
       |       CAST(sum(e_naive) AS BIGINT) AS mae_naive,
       |       CAST(sum(e_snaive) AS BIGINT) AS mae_snaive,
       |       CAST(sum(e_drift) AS BIGINT) AS mae_drift,
       |       CASE WHEN sum(e_drift) < sum(e_naive)
       |              AND sum(e_drift) < sum(e_snaive) THEN 'drift'
       |            WHEN sum(e_naive) <= sum(e_snaive) THEN 'naive'
       |            ELSE 'snaive' END AS best_method
       |FROM err GROUP BY 1""".stripMargin

  def holtLinear(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCents: Column,
      alphaNum: Long = 1L, alphaDen: Long = 2L,
      betaNum: Long = 1L, betaDen: Long = 4L, horizon: Long = 1L)
      : DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen &&
      betaNum > 0 && betaNum < betaDen)
    val grouped = df
      .select(col(keyCol), struct(col(tsCol).as("t"), col(tieCol).as("u"),
        valueCents.as("x")).as("__e"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("__e"))).as("__s"))
    val s = col("__s")
    val fold = aggregate(
      slice(s, lit(2), greatest(size(s) - 1, lit(0))),
      struct(element_at(s, 1).getField("x").as("h"), lit(0L).as("b")),
      (acc, e) => {
        val prev = acc.getField("h") + acc.getField("b")
        val hn = fdiv(lit(alphaNum) * e.getField("x") +
          lit(alphaDen - alphaNum) * prev, alphaDen)
        val bn = fdiv(lit(betaNum) * (hn - acc.getField("h")) +
          lit(betaDen - betaNum) * acc.getField("b"), betaDen)
        struct(hn.as("h"), bn.as("b"))
      })
    grouped.select(col(keyCol), size(s).cast("long").as("n"),
        fold.getField("h").as("level"), fold.getField("b").as("trend"))
      .withColumn("forecast", col("level") + lit(horizon) * col("trend"))
  }

  /** Holt-Winters ADDITIVE seasonal smoothing — the seasonal member of
    * the classical trio ([[holtLinear]] + a per-season offset): after
    * initializing level/seasonals from the FIRST full season
    * (h = ⌊mean of season 1⌋, sᵢ = xᵢ − h, b = 0), fold the rest of the
    * series through
    *   hₜ = ⌊(αn·(xₜ − s⁻) + (αd−αn)(h+b)) / αd⌋
    *   bₜ = ⌊(βn·(hₜ − h) + (βd−βn)·b) / βd⌋
    *   sₜ = ⌊(γn·(xₜ − hₜ) + (γd−γn)·s⁻) / γd⌋   (s⁻ = the slot m back)
    * in the same exact quantized integers. Readout: final level/trend
    * plus the one-step forecast h + b + s_next — the deseasonalized
    * capacity forecast a daily/weekly cycle demands (Holt alone chases
    * the cycle as trend).
    *
    * Keys with fewer than m+1 observations drop out (no full season to
    * initialize from — absence, not a zero). Same per-key
    * sequential-fold scale contract as [[holtLinear]]; the seasonal
    * state is an m-slot array updated in place per step (O(m) per
    * observation, m a deployment constant).
    *
    * @return (keyCol, n, level, trend, s_next, forecast) */
  def holtWinters(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCents: Column, period: Int,
      alphaNum: Long = 1L, alphaDen: Long = 2L,
      betaNum: Long = 1L, betaDen: Long = 4L,
      gammaNum: Long = 1L, gammaDen: Long = 4L): DataFrame = {
    require(period >= 2 && alphaNum > 0 && alphaNum < alphaDen &&
      betaNum > 0 && betaNum < betaDen && gammaNum > 0 &&
      gammaNum < gammaDen)
    val m = period
    val grouped = df
      .select(col(keyCol), struct(col(tsCol).as("t"), col(tieCol).as("u"),
        valueCents.as("x")).as("__e"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("__e"))).as("__s"))
      .filter(size(col("__s")) > m)
    val s = col("__s")
    val h0 = fdiv(aggregate(slice(s, lit(1), lit(m)), lit(0L),
      (a, e) => a + e.getField("x")), m.toLong)
    val ss0 = transform(slice(s, lit(1), lit(m)),
      e => e.getField("x") - h0)
    // acc: (h, b, ss[m], t) — t the index of the NEXT observation; the
    // season slot of observation t is ((t−1) mod m) + 1 (1-based).
    val fold = aggregate(
      slice(s, lit(m + 1), size(s) - m),
      struct(h0.as("h"), lit(0L).as("b"), ss0.as("ss"),
        lit(m + 1).as("t")),
      (acc, e) => {
        val slot = ((acc.getField("t") - 1) % m) + 1
        val sPrev = element_at(acc.getField("ss"), slot)
        val hn = fdiv(lit(alphaNum) * (e.getField("x") - sPrev) +
          lit(alphaDen - alphaNum) *
            (acc.getField("h") + acc.getField("b")), alphaDen)
        val bn = fdiv(lit(betaNum) * (hn - acc.getField("h")) +
          lit(betaDen - betaNum) * acc.getField("b"), betaDen)
        val sn = fdiv(lit(gammaNum) * (e.getField("x") - hn) +
          lit(gammaDen - gammaNum) * sPrev, gammaDen)
        struct(hn.as("h"), bn.as("b"),
          zip_with(acc.getField("ss"),
            sequence(lit(1), lit(m)),
            (v, k) => when(k === slot, sn).otherwise(v)).as("ss"),
          (acc.getField("t") + 1).as("t"))
      })
    val nextSlot = ((size(s)) % m) + 1
    grouped.select(col(keyCol), size(s).cast("long").as("n"),
        fold.getField("h").as("level"), fold.getField("b").as("trend"),
        element_at(fold.getField("ss"), nextSlot).as("s_next"))
      .withColumn("forecast",
        col("level") + col("trend") + col("s_next"))
  }

  /** DuckDB oracle for [[holtWinters]] (the [[holtLinearOracleSql]]
    * recursive replay with the m-slot seasonal list carried in the
    * recursion state). `baseSql` yields (key, t, u, x). */
  def holtWintersOracleSql(baseSql: String, keyCol: String, period: Int,
      alphaNum: Long, alphaDen: Long, betaNum: Long, betaDen: Long,
      gammaNum: Long, gammaDen: Long): String = {
    val m = period
    def fd(a: String, d: Long) =
      s"CAST(floor(CAST($a AS DOUBLE) / $d) AS BIGINT)"
    val sPrev = s"s.ss[((s.t - 1) % $m) + 1]"
    val hn = fd(s"$alphaNum * (e.x - $sPrev) + " +
      s"${alphaDen - alphaNum} * (s.h + s.b)", alphaDen)
    val bn = fd(s"$betaNum * ($hn - s.h) + ${betaDen - betaNum} * s.b",
      betaDen)
    val sn = fd(s"$gammaNum * (e.x - $hn) + ${gammaDen - gammaNum} * $sPrev",
      gammaDen)
    s"""WITH RECURSIVE ser AS (
       |  SELECT $keyCol, x,
       |         CAST(row_number() OVER (PARTITION BY $keyCol
       |                                 ORDER BY t, u, x) AS BIGINT) AS i
       |  FROM ($baseSql)
       |), lens AS (
       |  SELECT $keyCol, CAST(count(*) AS BIGINT) AS n FROM ser GROUP BY 1
       |), init AS (
       |  SELECT $keyCol,
       |         CAST(floor(CAST(sum(x) AS DOUBLE) / $m) AS BIGINT) AS h
       |  FROM ser WHERE i <= $m GROUP BY 1
       |), init2 AS (
       |  SELECT s.$keyCol, init.h,
       |         list(s.x - init.h ORDER BY s.i) AS ss
       |  FROM ser s JOIN init USING ($keyCol)
       |  WHERE s.i <= $m GROUP BY s.$keyCol, init.h
       |), st AS (
       |  SELECT i2.$keyCol, $m + 1 AS t, i2.h, CAST(0 AS BIGINT) AS b,
       |         i2.ss
       |  FROM init2 i2 JOIN lens USING ($keyCol) WHERE lens.n > $m
       |  UNION ALL
       |  SELECT s.$keyCol, s.t + 1,
       |         $hn,
       |         $bn,
       |         list_transform(generate_series(1, $m),
       |           k -> CASE WHEN k = ((s.t - 1) % $m) + 1 THEN $sn
       |                     ELSE s.ss[k] END)
       |  FROM st s JOIN ser e ON e.$keyCol = s.$keyCol AND e.i = s.t
       |), fin AS (
       |  SELECT st.$keyCol, CAST(st.t - 1 AS BIGINT) AS n,
       |         st.h AS level, st.b AS trend,
       |         st.ss[(((st.t - 1)) % $m) + 1] AS s_next
       |  FROM st JOIN lens USING ($keyCol) WHERE st.t = lens.n + 1
       |)
       |SELECT $keyCol, n, level, trend, s_next,
       |       level + trend + s_next AS forecast
       |FROM fin""".stripMargin
  }

  /** DuckDB oracle for [[holtLinear]]: the identical recurrence as a
    * recursive CTE stepping one observation per key per round (the
    * BinPack FFD oracle shape). `baseSql` yields (key, t, u, x). */
  def holtLinearOracleSql(baseSql: String, keyCol: String,
      alphaNum: Long, alphaDen: Long, betaNum: Long, betaDen: Long,
      horizon: Long): String = {
    def fd(a: String, d: Long) =
      s"CAST(floor(CAST($a AS DOUBLE) / $d) AS BIGINT)"
    val hn = fd(s"$alphaNum * e.x + ${alphaDen - alphaNum} * (s.h + s.b)",
      alphaDen)
    s"""WITH RECURSIVE ser AS (
       |  SELECT $keyCol, x,
       |         CAST(row_number() OVER (PARTITION BY $keyCol
       |                                 ORDER BY t, u, x) AS BIGINT) AS i
       |  FROM ($baseSql)
       |), st AS (
       |  SELECT $keyCol, 1 AS i, x AS h, CAST(0 AS BIGINT) AS b
       |  FROM ser WHERE i = 1
       |  UNION ALL
       |  SELECT s.$keyCol, s.i + 1,
       |         $hn,
       |         ${fd(s"$betaNum * ($hn - s.h) + ${betaDen - betaNum} * s.b",
                     betaDen)}
       |  FROM st s JOIN ser e ON e.$keyCol = s.$keyCol AND e.i = s.i + 1
       |), fin AS (
       |  SELECT $keyCol, i, h, b,
       |         row_number() OVER (PARTITION BY $keyCol ORDER BY i DESC) AS rn
       |  FROM st
       |)
       |SELECT $keyCol, CAST(i AS BIGINT) AS n, h AS level, b AS trend,
       |       h + $horizon * b AS forecast
       |FROM fin WHERE rn = 1""".stripMargin
  }
}
