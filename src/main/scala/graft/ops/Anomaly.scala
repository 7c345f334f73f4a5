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

  /** Robust per-group outliers — [[zscoreFilter]]'s 50%-breakdown
    * sibling: mean/stddev are themselves dragged by the outliers they
    * hunt (one 10⁹ value in a 10³ group shifts the mean past every real
    * anomaly); the median and the Median Absolute Deviation move only
    * when HALF the group does. Flag = |v − median| > k·MAD, all in
    * integer cents arithmetic — no doubles anywhere, so the verdict is
    * trivially exact cross-engine. Medians are [[Quantiles.exact]]'s
    * DISCRETE rank-selected quantiles (the q40 determinism rationale).
    *
    * Plan: two grouped median passes (each one keyed window sort — the
    * exactness cost, see [[Quantiles.exact]]; substitute
    * [[Quantiles.approx]] cuts per group for the sketched 100 TB path)
    * + two joins of group-cardinality stat frames (AQE broadcasts
    * them). The deviation frame feeds the second median AND the final
    * verdict — two evaluations of one scan+broadcast-join arm, cheaper
    * than persisting a corpus-sized intermediate.
    *
    * Constant groups: MAD = 0, so ANY deviation (> k·0) flags — correct
    * for "everything was X, suddenly Y". With MAD = 0 and v = median
    * nothing flags. No NaN path exists (integer arithmetic only).
    *
    * @return df + (med, mad, is_outlier) */
  def robustOutliers(df: DataFrame, grp: Seq[String], centsCol: String,
      k: Long = 3L): DataFrame = {
    val med = Quantiles.exact(df, grp.map(col), col(centsCol), Seq(0.5))
      .withColumnRenamed("p50", "med")
    val dev = df.join(med, grp)
      .withColumn("__dev", abs(col(centsCol) - col("med")))
    val mad = Quantiles.exact(dev, grp.map(col), col("__dev"), Seq(0.5))
      .select((grp.map(col) :+ col("p50").as("mad")): _*)
    dev.join(mad, grp)
      .withColumn("is_outlier", col("__dev") > lit(k) * col("mad"))
      .drop("__dev")
  }

  /** One-sided upper CUSUM change-point alarms (Page 1954) per series —
    * the SEQUENTIAL drift detector the pointwise z-score (q07) and
    * median/MAD (q103) gates can't be: a sustained small shift never
    * trips a pointwise threshold but accumulates here.
    *
    * The textbook recurrence S_i = max(0, S_{i−1} + (x_i − target − slack))
    * is not window-expressible; the identity S_i = P_i − min(0, min_{j≤i} P_j)
    * (P = the plain prefix sum of deviations) is — two cumulative frames
    * over ONE per-series window, all in exact integer cents, so alarms
    * are deterministic across partitionings and engines. An alarm row is
    * emitted at each upward CROSSING of the threshold (S goes above h
    * with the previous S at/below), not for every excursion row.
    *
    * `target` is the series' own integer-mean (sum div n) — the
    * retrospective formulation; pass precomputed targets by joining a
    * `target` column and using [[cusumAlarmsWithTarget]] semantics if
    * monitoring against SLOs. Per-series mean join is aggregate-sized.
    *
    * Scale: the window partitions by the series key — series cardinality
    * (user, sensor, metric id) must exceed core count, the same contract
    * as every per-key sequence op (W3). NOT for 5-value dimension keys.
    *
    * @return (keyCol, tsCol, tieCol, x, target, s) — alarm crossings only */
  def cusumAlarms(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCents: Column, slackCents: Long,
      thresholdCents: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol), col(tsCol), col(tieCol),
      valueCents.as("x"))
    val target = base.groupBy(col(keyCol))
      .agg(expr("sum(x) div count(1)").as("target"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(target, keyCol)
      .withColumn("__d", col("x") - col("target") - lit(slackCents))
      .withColumn("__p", sum(col("__d")).over(cum))
      .withColumn("s",
        col("__p") - least(min(col("__p")).over(cum), lit(0L)))
      .withColumn("__sp", lag(col("s"), 1, 0L).over(w))
      .filter(col("s") > thresholdCents && col("__sp") <= thresholdCents)
      .drop("__d", "__p", "__sp")
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

  /** Seasonal-baseline anomalies: score each observation cell against
    * the mean/σ of its OWN season group (e.g. hour-of-day × metric key)
    * rather than a global baseline — Monday 3am traffic is compared to
    * other 3ams, so the daily cycle stops masquerading as anomaly and
    * quiet-hour incidents stop hiding under the busy-hour σ. The
    * deseasonalized sibling of [[zscoreFilter]].
    *
    * Same exactness/scale recipe as the global form: integer (n, Σx,
    * Σx²) per season group, mean/σ by one fixed IEEE sequence
    * ([[Exact.stddevFromSums]]), baselines joined back BROADCAST
    * (season-cardinality rows, never a collect). Input is the
    * pre-aggregated cell frame (one row per observation cell).
    *
    * @param cells     observation frame with integer `xCol`
    * @param seasonCols season-group key (e.g. metric key + hour-of-day)
    * @param threshold flag cells with |z| ≥ threshold (σ > 0 groups only)
    * @return flagged cells + (n_obs, mean_x, sd_x, z)
    */
  def seasonalZ(cells: DataFrame, seasonCols: Seq[String], xCol: String,
      threshold: Double): DataFrame = {
    val stats = cells.groupBy(seasonCols.map(col): _*)
      .agg(count(lit(1)).as("n_obs"),
        sum(col(xCol)).as("__s"),
        sum(col(xCol) * col(xCol)).as("__ss"))
      .withColumn("mean_x", col("__s").cast("double") / col("n_obs"))
      // n = 1 would 0/0 into NaN, and NaN orders DIFFERENTLY across
      // engines (DuckDB sorts it above every double) — guard to NULL
      .withColumn("sd_x", when(col("n_obs") >= 2,
        Exact.stddevFromSums(col("__s"), col("__ss"), col("n_obs"))))
      .drop("__s", "__ss")
    cells.join(broadcast(stats), seasonCols)
      .withColumn("z",
        when(col("sd_x") > 0,
          (col(xCol).cast("double") - col("mean_x")) / col("sd_x")))
      .filter(abs(col("z")) >= threshold)
  }
}
