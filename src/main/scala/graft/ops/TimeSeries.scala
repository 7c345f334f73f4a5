package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over keyed series: Markov transition
  * matrices (what follows what), lagged autocorrelation (does the series
  * remember itself), and the Mann-Kendall trend test (is it monotonically
  * drifting) — the behavioral / drift questions an event-log pipeline
  * answers after the rollups (A3/A6) have compressed raw events into
  * per-key series.
  *
  * Scale shape: everything here operates on either (a) per-key windows
  * partitioned by the series key — one shuffle, no global ordering — or
  * (b) equi-joins of a PRE-AGGREGATED series frame against itself, where
  * the series length is bounded by the CALENDAR (hours in the retention
  * window), not the corpus: 100× more events is 100× denser cells, not
  * longer series, so the O(n·lag) / O(n²) pair counts are constants of
  * the deployment, not of the data volume.
  *
  * Exactness: counts, sign sums and micro-probabilities are integers;
  * the float statistics (autocorrelation, MK z) derive from integer sums
  * with one fixed IEEE sequence (see [[Exact]]).
  */
object TimeSeries extends TimeSeriesForecasting {

  /** First-order Markov transition matrix of `typeCol` per `keyCol`
    * sequence (ordered by `orderCols`): for every observed (prev → next)
    * pair, its count, the total out of `prev`, and the integer
    * micro-probability `n·1e6 div from_total` (row-stochastic up to
    * integer truncation).
    *
    * One keyed window (lag) + one hash aggregation; the matrix is
    * |types|² rows, so the final per-prev total window runs over a
    * type-cardinality-bounded frame, never the corpus.
    *
    * @return (prev_type, next_type, n, from_total, p_micro)
    */
  def transitionMatrix(df: DataFrame, keyCol: Column, typeCol: Column,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val pairs = df
      .select(typeCol.as("next_type"),
        lag(typeCol, 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
    pairs.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total",
        sum("n").over(Window.partitionBy(col("prev_type"))))
      // integer div, not double-divide-then-cast: a correctly-rounded
      // double quotient can land ON the next integer and truncate high
      .withColumn("p_micro", expr("(n * 1000000) div from_total"))
  }

  /** Lag-`lag` autocorrelation of a keyed integer series `(key, t, x)`:
    * Pearson correlation of the exact pairs (x_t, x_{t−lag}), formed by
    * an equi-join of the series against itself shifted by `lag` — gap
    * positions simply produce no pair (never a silent shorter-lag pair,
    * which a window `lag()` over observed rows would fabricate).
    *
    * The join is an equi-join on (key, t) of two series-sized frames —
    * calendar-bounded, see the object doc. NULL when the series is
    * constant on either leg (no correlation verdict; see
    * [[Exact.corrFromSums]]).
    *
    * @param series pre-aggregated frame: keyCols ++ (tCol: long,
    *               xCol: long)
    * @return keyCols ++ (n_pairs, s_x, s_y, acf)
    */
  def autocorr(series: DataFrame, keyCols: Seq[String], tCol: String,
      xCol: String, lagSteps: Long): DataFrame = {
    require(lagSteps >= 1, s"lag must be >= 1, got $lagSteps")
    val cur = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t"), col(xCol).as("__x")): _*)
    val prev = series.select(
      keyCols.map(col) ++
        Seq((col(tCol) + lit(lagSteps)).as("__t"), col(xCol).as("__y")): _*)
    cur.join(prev, keyCols :+ "__t")
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum("__x").as("s_x"), sum("__y").as("s_y"),
        sum(col("__x") * col("__x")).as("s_xx"),
        sum(col("__y") * col("__y")).as("s_yy"),
        sum(col("__x") * col("__y")).as("s_xy"))
      .withColumn("acf", Exact.corrFromSums(col("n_pairs"),
        col("s_x"), col("s_y"), col("s_xx"), col("s_yy"), col("s_xy")))
      .select(keyCols.map(col) ++
        Seq(col("n_pairs"), col("s_x"), col("s_y"), col("acf")): _*)
  }

  /** Mann-Kendall monotone-trend test per key over an integer series
    * `(key, t, x)`: S = Σ_{i<j} sign(x_j − x_i) via the exact pairwise
    * self-join, the no-ties variance `Var·18 = n(n−1)(2n+5)` as an
    * exact integer, and the continuity-corrected
    * z = (S∓1)/sqrt(Var18/18.0) in one fixed IEEE sequence. The
    * non-parametric drift detector: immune to outliers and level, it
    * asks only "do later points tend to exceed earlier ones".
    *
    * PER-KEY PAIR LEDGER (the shrunkRates convention): the self-join
    * materializes n(n−1)/2 rows PER KEY — quadratic in the per-key
    * series length, hash-balanced across keys. The contract cap is
    * n ≤ 4096 points per key (≈ 8.4M pair rows/key, a fraction of one
    * shuffle partition; OpsSpec runs the cap magnitude end-to-end) —
    * comfortably above any calendar-bucketed caller (hourly × month =
    * 744; daily × decade = 3653), and INDEPENDENT of corpus scale:
    * 100 TB grows the key count, never n. Series beyond the cap are
    * re-bucketing problems (the q42 rollup family), not bigger joins;
    * the O(n log n) inversion-count form buys nothing at n ≤ 4096 and
    * costs a per-key sort barrier.
    *
    * @return keyCols ++ (n, s_stat, var18, z, trend) — trend ∈
    *         {increasing, decreasing, no_trend} at the two-sided 5% level
    */
  def mannKendall(series: DataFrame, keyCols: Seq[String], tCol: String,
      xCol: String): DataFrame = {
    val a = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t1"), col(xCol).as("__x1")): _*)
    val b = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t2"), col(xCol).as("__x2")): _*)
    val pairs = a.join(b, keyCols).filter(col("__t1") < col("__t2"))
    val stats = pairs.groupBy(keyCols.map(col): _*)
      .agg(sum(signum(col("__x2") - col("__x1")).cast("long")).as("s_stat"))
    // n counted EXACTLY with a second (cheap, one-row-per-key)
    // aggregation — inverting n_pairs = n(n-1)/2 via sqrt is exact only
    // when every (key, t) is unique; duplicate t values per key make
    // n_pairs < n(n-1)/2 and the truncated sqrt silently mis-states n,
    // var18 and z. Duplicate-t pairs are excluded from S by the strict
    // __t1 < __t2 filter (the standard tied-time treatment); var18
    // stays the no-ties-in-x formula.
    val counts = series.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val withN = stats.join(counts, keyCols)
      .withColumn("var18",
        col("n") * (col("n") - 1) * (lit(2) * col("n") + 5))
    val denom = sqrt(col("var18").cast("double") / lit(18.0))
    val z = when(col("s_stat") > 0,
        (col("s_stat") - lit(1)).cast("double") / denom)
      .when(col("s_stat") < 0,
        (col("s_stat") + lit(1)).cast("double") / denom)
      .otherwise(lit(0.0))
    withN.withColumn("z", z)
      .withColumn("trend",
        when(col("z") > 1.96, lit("increasing"))
          .when(col("z") < -1.96, lit("decreasing"))
          .otherwise(lit("no_trend")))
      .select(keyCols.map(col) ++ Seq(col("n"), col("s_stat"),
        col("var18"), col("z"), col("trend")): _*)
  }

  /** Per-key least-squares trend line over an integer series — slope
    * and intercept from the five exact integer sums, the parametric
    * sibling of [[mannKendall]] (MK answers "is it drifting", the fit
    * answers "how fast"). One aggregation; NULL fit for degenerate
    * series (constant x). Unlike [[graft.text.Spans.zipfSlope]]'s
    * bit-length quantization, the inputs here are already integers, so
    * the regression sums are EXACT — only the two final divisions are
    * floating point, in one fixed sequence each.
    *
    * @return keyCols ++ (n, slope, intercept)
    */
  def linearTrend(series: DataFrame, keyCols: Seq[String], tCol: String,
      xCol: String): DataFrame = {
    val s = series.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(tCol)).as("sx"), sum(col(xCol)).as("sy"),
        sum(col(tCol) * col(tCol)).as("sxx"),
        sum(col(tCol) * col(xCol)).as("sxy"))
    val det = s("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double") / det.cast("double")
    s.withColumn("slope", when(det > 0, slope))
      .withColumn("intercept",
        when(det > 0,
          (col("sy").cast("double") - slope * col("sx")) / col("n")))
      .select(keyCols.map(col) ++
        Seq(col("n"), col("slope"), col("intercept")): _*)
  }

  /** DuckDB oracle for [[linearTrend]]: `innerSql` yields
    * (keyCols..., t, x). */
  def linearTrendOracleSql(innerSql: String, keyCols: Seq[String])
      : String = {
    val keys = keyCols.mkString(", ")
    val det = "(n * sxx - sx * sx)"
    val slope = s"CAST(n * sxy - sx * sy AS DOUBLE) / CAST($det AS DOUBLE)"
    s"""WITH g AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(t) AS BIGINT) AS sx, CAST(sum(x) AS BIGINT) AS sy,
       |         CAST(sum(t * t) AS BIGINT) AS sxx,
       |         CAST(sum(t * x) AS BIGINT) AS sxy
       |  FROM ($innerSql) GROUP BY $keys
       |)
       |SELECT $keys, n,
       |       CASE WHEN $det > 0 THEN $slope END AS slope,
       |       CASE WHEN $det > 0 THEN
       |         (CAST(sy AS DOUBLE) - ($slope) * sx) / n
       |       END AS intercept
       |FROM g""".stripMargin
  }

  /** Time-weighted average (TWAP) per key: each observation weighted by
    * how long it REMAINED the current value (till the next observation)
    * — the correct average for irregularly-sampled gauges, where the
    * plain mean over-weights chatty periods. The last observation has
    * no successor and carries no weight (the standard
    * until-next-reading convention; pass a sentinel end-of-window row
    * to close it out).
    *
    * Exact: durations in integer micros (lead window), value·duration
    * products exact integers (ledger: |v|·span_micros per key must fit
    * int64 — cents × a month of micros ≈ 10¹⁷, fine), one final
    * division.
    *
    * @return (keyCols..., n_intervals, span_micros, vdt_sum, twap) —
    *         keys with a single observation have no interval and drop
    */
  def twap(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, xCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__m"), col(tieCol))
    df.select(keyCols.map(col) ++ Seq(
        unix_micros(col(tsCol).cast("timestamp")).as("__m"),
        col(tieCol), col(xCol).as("__x")): _*)
      .withColumn("__next", lead(col("__m"), 1).over(w))
      .filter(col("__next").isNotNull)
      .withColumn("__dt", col("__next") - col("__m"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dt")).as("span_micros"),
        sum(col("__x") * col("__dt")).as("vdt_sum"))
      .withColumn("twap",
        when(col("span_micros") > 0,
          col("vdt_sum").cast("double") / col("span_micros")))
  }

  /** DuckDB oracle for [[twap]]: `xExpr` the integer value expression. */
  def twapOracleSql(table: String, keyCols: Seq[String], tsCol: String,
      tieCol: String, xExpr: String): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH b AS (
       |  SELECT $keys, epoch_us($tsCol) AS m, $tieCol AS tie,
       |         $xExpr AS x
       |  FROM $table
       |), d AS (
       |  SELECT $keys, x,
       |         lead(m) OVER (PARTITION BY $keys ORDER BY m, tie) - m AS dt
       |  FROM b
       |)
       |SELECT $keys, CAST(count(*) AS BIGINT) AS n_intervals,
       |       CAST(sum(dt) AS BIGINT) AS span_micros,
       |       CAST(sum(x * dt) AS BIGINT) AS vdt_sum,
       |       CASE WHEN sum(dt) > 0 THEN
       |         CAST(sum(x * dt) AS DOUBLE) / sum(dt)
       |       END AS twap
       |FROM d WHERE dt IS NOT NULL GROUP BY $keys""".stripMargin
  }

  /** Half-life time-decayed sum per key: each event contributes
    * `x · 2^(−age/halflife)` with age bucketed to whole half-lives —
    * the "recent popularity" score every trending/ranking surface wants
    * (yesterday counts half of today), as ONE map-side-combinable
    * aggregation.
    *
    * EXACT: ages quantize to half-life buckets `b = age div halflife`
    * (integer), each event contributes the integer
    * `x · 2^(maxBuckets − b)` (a left shift — exact), and the final
    * score divides once by `2^maxBuckets` — a power-of-two double scale,
    * which is exact in IEEE. No per-row `exp()` (not correctly-rounded
    * portable), no order-dependent double summation. Events older than
    * `maxBuckets` half-lives contribute 0 (2⁻³⁰ of an event is noise —
    * and the cutoff is what bounds the shift).
    *
    * Overflow bound: Σx per (key, bucket) · 2^maxBuckets must stay
    * inside int64 — with maxBuckets = 30 that is Σx < 8.5·10⁹ per key,
    * scale `x` or lower maxBuckets for heavier keys.
    *
    * @param asOfMicros decay reference instant (epoch micros; pass the
    *                   corpus max or the wall clock)
    * @return (keyCols..., n_events, n_live, decayed) — n_live counts
    *         events inside the decay horizon
    */
  def decayedSum(df: DataFrame, keyCols: Seq[String], tsCol: String,
      xCol: String, asOfMicros: Long, halflifeSeconds: Long,
      maxBuckets: Int = 30): DataFrame = {
    require(halflifeSeconds >= 1 && maxBuckets >= 1 && maxBuckets <= 60)
    val age = lit(asOfMicros) - unix_micros(col(tsCol).cast("timestamp"))
    // clamp future events (negative age) to bucket 0 — an unguarded
    // negative bucket would shift past 60 bits and overflow
    val b = greatest(expr(s"(__age div 1000000) div $halflifeSeconds"),
      lit(0L))
    df.withColumn("__age", age)
      .withColumn("__b", b)
      .withColumn("__w",
        when(col("__b") < maxBuckets,
          col(xCol) *
            expr(s"shiftleft(1L, CAST($maxBuckets - __b AS INT))"))
          .otherwise(lit(0L)))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__b") < maxBuckets, 1L).otherwise(0L)).as("n_live"),
        sum(col("__w")).as("__sw"))
      .withColumn("decayed",
        col("__sw").cast("double") / lit(math.pow(2.0, maxBuckets)))
      .drop("__sw")
  }

  /** DuckDB oracle for [[decayedSum]] over `table` with `xExpr`. */
  def decayedSumOracleSql(table: String, keyCols: Seq[String],
      tsCol: String, xExpr: String, asOfMicros: Long,
      halflifeSeconds: Long, maxBuckets: Int = 30): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH b AS (
       |  SELECT $keys,
       |         greatest((($asOfMicros - epoch_us($tsCol)) // 1000000)
       |           // $halflifeSeconds, 0) AS bkt,
       |         $xExpr AS x
       |  FROM $table
       |)
       |SELECT $keys, CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(CASE WHEN bkt < $maxBuckets THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_live,
       |       CAST(sum(CASE WHEN bkt < $maxBuckets
       |         THEN x * (1::BIGINT << ($maxBuckets - CAST(bkt AS INTEGER)))
       |         ELSE 0 END) AS DOUBLE) / ${math.pow(2.0, maxBuckets)}
       |         AS decayed
       |FROM b GROUP BY $keys""".stripMargin
  }

  /** Theil–Sen slope: the MEDIAN of all pairwise slopes per key — the
    * robust sibling of [[linearTrend]]'s least squares (one wild outlier
    * hour drags OLS arbitrarily; Theil–Sen tolerates up to ~29 %
    * contamination), and the magnitude [[mannKendall]]'s yes/no trend
    * verdict lacks.
    *
    * Each pairwise slope is ONE IEEE division of exact integer deltas
    * (bit-portable); the median is the DISCRETE rank-⌈n/2⌉ element
    * (the q40 convention — value-only sort, ties interchangeable, no
    * interpolation), picked by a per-key window over the pair frame.
    *
    * Scale shape: the same calendar-bounded self-join as
    * [[mannKendall]] (n hours ⇒ n² pairs per key, bounded by the
    * calendar, not the corpus) + one keyed window.
    *
    * @return (keyCols..., n_pairs, ts_slope)
    */
  def theilSen(series: DataFrame, keyCols: Seq[String], tCol: String,
      xCol: String): DataFrame = {
    val a = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t1"), col(xCol).as("__x1")): _*)
    val b = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t2"), col(xCol).as("__x2")): _*)
    val pairs = a.join(b, keyCols).filter(col("__t1") < col("__t2"))
      .withColumn("slope",
        (col("__x2") - col("__x1")).cast("double") /
          (col("__t2") - col("__t1")).cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("slope"))
    pairs
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(keyCols.map(col) ++
        Seq(col("__n").as("n_pairs"), col("slope").as("ts_slope")): _*)
  }

  /** DuckDB oracle for [[theilSen]]: `innerSql` yields
    * (keyCols..., t, x) as integers. */
  def theilSenOracleSql(innerSql: String, keyCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    val eq = keyCols.map(k => s"i.$k = j.$k").mkString(" AND ")
    val ik = keyCols.map(k => s"i.$k").mkString(", ")
    s"""WITH b AS ($innerSql), p AS (
       |  SELECT $ik,
       |         CAST(j.x - i.x AS DOUBLE) / CAST(j.t - i.t AS DOUBLE)
       |           AS slope
       |  FROM b i JOIN b j ON $eq AND i.t < j.t
       |), r AS (
       |  SELECT *,
       |    CAST(row_number() OVER (PARTITION BY $keys ORDER BY slope)
       |      AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY $keys) AS BIGINT) AS n
       |  FROM p
       |)
       |SELECT $keys, n AS n_pairs, slope AS ts_slope
       |FROM r WHERE rn = (n + 1) // 2""".stripMargin
  }

  /** STATIONARY DISTRIBUTION of the [[transitionMatrix]] chain —
    * "where do users END UP" — by integer power iteration in exact
    * micro-probabilities (the q63 PageRank device on the behavioral
    * chain): π₀ uniform, πₖ₊₁(j) = Σᵢ πₖ(i)·p(i→j) div 1e6, fixed
    * `iters` sweeps, every intermediate a deterministic long, the
    * oracle an unrolled replay. Mass leaks ≤ |states| micros per sweep
    * to integer truncation (reported — don't renormalize silently).
    *
    * Scale shape: the chain is |states|² rows; iterations are joins of
    * state-cardinality frames — corpus touched once to count
    * transitions.
    *
    * @return per state: (state, pi_micro, pi)
    */
  def stationaryDistribution(df: DataFrame, keyCol: Column,
      typeCol: Column, orderCols: Seq[Column],
      iters: Int = 4): DataFrame = {
    require(iters >= 1)
    val tm = transitionMatrix(df, keyCol, typeCol, orderCols)
      .select(col("prev_type").as("i"), col("next_type").as("j"),
        col("p_micro"))
    val states = tm.select(col("i").as("state"))
      .unionAll(tm.select(col("j").as("state"))).distinct()
    val nRow = states.agg(count(lit(1)).as("__ns"))
    var pi = states.crossJoin(broadcast(nRow))
      .select(col("state"), expr("1000000 div __ns").as("pi_micro"))
    (1 to iters).foreach { _ =>
      pi = tm.join(pi.withColumnRenamed("state", "i"), "i")
        .select(col("j").as("state"),
          expr("(pi_micro * p_micro) div 1000000").as("__c"))
        .groupBy(col("state")).agg(sum(col("__c")).as("pi_micro"))
    }
    pi.withColumn("pi", col("pi_micro").cast("double") / 1000000.0)
  }

  /** DuckDB oracle for [[stationaryDistribution]], unrolled.
    * `transSql` yields (i, j, p_micro) — generate it with the q173
    * transition-matrix oracle machinery. */
  def stationaryOracleSql(transSql: String, iters: Int = 4): String = {
    val steps = (1 to iters).map { k =>
      s"""pi$k AS (
         |  SELECT j AS state,
         |         CAST(sum((pi_micro * p_micro) // 1000000) AS BIGINT)
         |           AS pi_micro
         |  FROM tm JOIN pi${k - 1} ON tm.i = pi${k - 1}.state
         |  GROUP BY 1
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH tm AS ($transSql),
       |states AS (
       |  SELECT DISTINCT state FROM
       |    (SELECT i AS state FROM tm UNION ALL SELECT j FROM tm)
       |), pi0 AS (
       |  SELECT state,
       |         CAST(1000000 // (SELECT count(*) FROM states) AS BIGINT)
       |           AS pi_micro
       |  FROM states
       |), $steps
       |SELECT state, pi_micro,
       |       CAST(pi_micro AS DOUBLE) / 1000000.0 AS pi
       |FROM pi$iters""".stripMargin
  }

  /** LINEAR interpolation of series gaps — the straight-line companion
    * to `Rollups.forwardFill` (LOCF answers "what was the last reading";
    * interpolation answers "what was it probably DURING the gap", the
    * right gauge semantics for slowly-moving signals). Dense integer
    * spine per key from min to max observed t, so leading/trailing
    * edges are always anchored by observations.
    *
    * Exact integer milli-units: interp = pv·1000 +
    * (nv−pv)·(t−pt)·1000 div (nt−pt) — both engines' integer division
    * truncates toward zero (measured: DuckDB `-7//2 = -3`), so downward
    * slopes round toward the previous observation on BOTH sides;
    * sub-milli truncation bias, documented.
    *
    * @return (keyCols..., t, x, x_milli, filled) — x NULL on filled
    *         rows, x_milli always populated
    */
  def interpolateLinear(series: DataFrame, keyCols: Seq[String],
      tCol: String, xCol: String): DataFrame = {
    val s = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t"), col(xCol).as("__x")): _*)
    val spine = s.groupBy(keyCols.map(col): _*)
      .agg(min(col("__t")).as("__lo"), max(col("__t")).as("__hi"))
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as("__t"): _*)
    val dense = spine.join(s, keyCols :+ "__t", "left")
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("__t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("__t"))
      .rowsBetween(0, org.apache.spark.sql.expressions.Window
        .unboundedFollowing)
    val tObs = when(col("__x").isNotNull, col("__t"))
    val withBounds = dense
      .withColumn("__pv", last(col("__x"), ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(tObs, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("__x"), ignoreNulls = true).over(wNext))
      .withColumn("__nt", first(tObs, ignoreNulls = true).over(wNext))
    withBounds
      .withColumn("__num", (col("__nv") - col("__pv")) *
        (col("__t") - col("__pt")) * lit(1000L))
      .withColumn("__den", col("__nt") - col("__pt"))
      .withColumn("x_milli",
        when(col("__x").isNotNull, col("__x") * 1000L)
          .otherwise(col("__pv") * 1000L + expr("__num div __den")))
      .select(keyCols.map(col) ++ Seq(col("__t").as(tCol),
        col("__x").as(xCol), col("x_milli"),
        col("__x").isNull.as("filled")): _*)
  }

  /** DuckDB oracle for [[interpolateLinear]]: `innerSql` yields
    * (keyCols..., t, x) as integers. */
  def interpolateOracleSql(innerSql: String, keyCols: Seq[String])
      : String = {
    val keys = keyCols.mkString(", ")
    s"""WITH b AS ($innerSql), sp AS (
       |  SELECT $keys, unnest(range(min(t), max(t) + 1)) AS t
       |  FROM b GROUP BY $keys
       |), d AS (
       |  SELECT sp.*, b.x FROM sp LEFT JOIN b USING ($keys, t)
       |), w AS (
       |  SELECT *,
       |    last_value(x IGNORE NULLS) OVER (PARTITION BY $keys ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |    last_value(CASE WHEN x IS NOT NULL THEN t END IGNORE NULLS)
       |      OVER (PARTITION BY $keys ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
       |    first_value(x IGNORE NULLS) OVER (PARTITION BY $keys ORDER BY t
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |    first_value(CASE WHEN x IS NOT NULL THEN t END IGNORE NULLS)
       |      OVER (PARTITION BY $keys ORDER BY t
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
       |  FROM d
       |)
       |SELECT $keys, t, x,
       |       CAST(CASE WHEN x IS NOT NULL THEN x * 1000
       |         ELSE pv * 1000 + ((nv - pv) * (t - pt) * 1000) // (nt - pt)
       |       END AS BIGINT) AS x_milli,
       |       x IS NULL AS filled
       |FROM w""".stripMargin
  }

  /** DETRENDED outlier detection: z-score each point against the
    * residuals of its key's OLS trend line — a spike on a steep ramp
    * stops hiding inside the ramp's variance (the q07 global z false
    * negative), and a ramp stops reading as all-outliers (its false
    * positive). [[linearTrend]] says where the line is; this says who
    * is off it.
    *
    * Two passes over the (calendar-bounded) series: the 5-sum OLS fold,
    * then residuals quantized to integer millis (the q204 trunc device
    * — cross-row moments must not sum raw doubles) feeding a per-key
    * mean/sd and one fixed z readout.
    *
    * @return flagged rows: (keyCols..., t, x, resid_milli, z) where
    *         |z| ≥ zThreshold
    */
  def detrendedOutliers(series: DataFrame, keyCols: Seq[String],
      tCol: String, xCol: String, zThreshold: Double = 3.0): DataFrame = {
    val fit = linearTrend(series, keyCols, tCol, xCol)
      .filter(col("slope").isNotNull)
      .select(keyCols.map(col) :+ col("slope") :+ col("intercept"): _*)
    val resid = series
      .select(keyCols.map(col) ++
        Seq(col(tCol).as("__t"), col(xCol).as("__x")): _*)
      .join(broadcast(fit), keyCols)
      .withColumn("__r",
        col("__x") - (col("intercept") + col("slope") * col("__t")))
      .withColumn("resid_milli", (col("__r") * lit(1000.0)).cast("long"))
    val stats = resid.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("resid_milli")).as("__s"),
        sum(col("resid_milli") * col("resid_milli")).as("__ss"))
      .withColumn("__mu", col("__s").cast("double") / col("__n"))
      .withColumn("__sigma",
        Exact.stddevFromSums(col("__s"), col("__ss"), col("__n")))
      .select(keyCols.map(col) :+ col("__mu") :+ col("__sigma"): _*)
    resid.join(broadcast(stats), keyCols)
      .withColumn("z",
        when(col("__sigma") > 0,
          (col("resid_milli") - col("__mu")) / col("__sigma")))
      .filter(abs(col("z")) >= zThreshold)
      .select(keyCols.map(col) ++ Seq(col("__t").as(tCol),
        col("__x").as(xCol), col("resid_milli"), col("z")): _*)
  }

  /** DuckDB oracle for [[detrendedOutliers]]: `innerSql` yields
    * (keyCols..., t, x) as integers. */
  def detrendedOutliersOracleSql(innerSql: String, keyCols: Seq[String],
      zThreshold: Double = 3.0): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH b AS ($innerSql), f AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(t) AS BIGINT) AS sx, CAST(sum(x) AS BIGINT) AS sy,
       |         CAST(sum(t * t) AS BIGINT) AS sxx,
       |         CAST(sum(t * x) AS BIGINT) AS sxy
       |  FROM b GROUP BY $keys
       |), fit AS (
       |  SELECT $keys,
       |    CAST(n * sxy - sx * sy AS DOUBLE)
       |      / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       |    (CAST(sy AS DOUBLE)
       |      - (CAST(n * sxy - sx * sy AS DOUBLE)
       |         / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n
       |      AS intercept
       |  FROM f WHERE n * sxx - sx * sx > 0
       |), r AS (
       |  SELECT b.*, CAST(trunc((x - (intercept + slope * t)) * 1000.0)
       |    AS BIGINT) AS resid_milli
       |  FROM b JOIN fit USING ($keys)
       |), st AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(resid_milli) AS BIGINT) AS s,
       |         CAST(sum(resid_milli * resid_milli) AS BIGINT) AS ss
       |  FROM r GROUP BY $keys
       |), ms AS (
       |  SELECT $keys, CAST(s AS DOUBLE) / n AS mu,
       |         sqrt((CAST(ss AS DOUBLE)
       |           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1))
       |           AS sigma
       |  FROM st
       |)
       |SELECT ${keyCols.map(k => s"r.$k").mkString(", ")}, t, x,
       |       resid_milli, (resid_milli - mu) / sigma AS z
       |FROM r JOIN ms USING ($keys)
       |WHERE sigma > 0 AND abs((resid_milli - mu) / sigma)
       |  >= $zThreshold""".stripMargin
  }

  /** Cross-correlation function (CCF) between two series at lags
    * −maxLag..+maxLag: does A LEAD B (peak at positive lag), lag it, or
    * just co-move — the lead-lag question [[autocorr]] answers only for
    * a series against itself. Positive lag correlates a(t) with
    * b(t + lag).
    *
    * Per lag one exact-integer 6-sum fold through
    * [[Exact.corrFromSums]]' fixed IEEE readout. The lag fan-out is a
    * literal (2·maxLag+1)-element generator on the (calendar-bounded)
    * series frame — the join stays keyed on the shifted time.
    *
    * @return (lag, n, r) — r NULL where either series is constant on
    *         the overlap
    */
  def crossCorrelation(a: DataFrame, b: DataFrame, tCol: String,
      xCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0)
    val aa = a.select(col(tCol).as("__t"), col(xCol).as("__xa"))
      .withColumn("lag",
        explode(sequence(lit(-maxLag.toLong), lit(maxLag.toLong))))
      .withColumn("__tb", col("__t") + col("lag"))
    val bb = b.select(col(tCol).as("__tb"), col(xCol).as("__xb"))
    aa.join(bb, Seq("__tb"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("__xa")).as("sx"), sum(col("__xb")).as("sy"),
        sum(col("__xa") * col("__xa")).as("sxx"),
        sum(col("__xb") * col("__xb")).as("syy"),
        sum(col("__xa") * col("__xb")).as("sxy"))
      .select(col("lag"), col("n"),
        Exact.corrFromSums(col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy")).as("r"))
  }

  /** DuckDB oracle for [[crossCorrelation]]: `aSql`/`bSql` yield
    * (t, x) as integers. */
  def crossCorrelationOracleSql(aSql: String, bSql: String,
      maxLag: Int): String =
    s"""WITH a AS ($aSql), b AS ($bSql), p AS (
       |  SELECT l.lag, a.x AS xa, b.x AS xb
       |  FROM a
       |  CROSS JOIN (SELECT unnest(range(${-maxLag}, ${maxLag + 1}))
       |              AS lag) l
       |  JOIN b ON b.t = a.t + l.lag
       |), s AS (
       |  SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(xa) AS BIGINT) AS sx, CAST(sum(xb) AS BIGINT) AS sy,
       |         CAST(sum(xa * xa) AS BIGINT) AS sxx,
       |         CAST(sum(xb * xb) AS BIGINT) AS syy,
       |         CAST(sum(xa * xb) AS BIGINT) AS sxy
       |  FROM p GROUP BY 1
       |)
       |SELECT lag, n, ${Exact.corrFromSumsSql("n", "sx", "sy", "sxx",
      "syy", "sxy")} AS r
       |FROM s""".stripMargin

  /** Seasonality STRENGTH: the fraction of a series' variance explained
    * by its seasonal profile, `1 − SS_within / SS_total` over
    * season-position groups (hour-of-day for daily seasonality) — the
    * one-number "is this series actually seasonal" gate that decides
    * whether [[maseBacktest]]'s seasonal-naive is even the right
    * baseline; q187 FLAGS deviations from the profile, this scores the
    * profile itself.
    *
    * Group sums stay exact longs; each group's within-variance term
    * `ss_h − s_h²/n_h` is quantized to integer micros (the q204
    * chi-square trunc device) so the cross-group sum is
    * partition-order-free; SS_total gets the same treatment. One final
    * fixed IEEE division.
    *
    * @return (keyCols..., n, ss_total_q, ss_within_q, strength) —
    *         strength NULL on constant series
    */
  def seasonalityStrength(series: DataFrame, keyCols: Seq[String],
      tCol: String, xCol: String, season: Long = 24L): DataFrame = {
    require(season >= 2)
    val withPos = series.select(
      keyCols.map(col) ++ Seq(col(tCol).as("__t"), col(xCol).as("__x")): _*)
      .withColumn("__pos", pmod(col("__t"), lit(season)))
    val perPos = withPos
      .groupBy((keyCols.map(col) :+ col("__pos")): _*)
      .agg(count(lit(1)).as("nh"), sum(col("__x")).as("sh"),
        sum(col("__x") * col("__x")).as("ssh"))
      .withColumn("within_q",
        floor((col("ssh").cast("double") -
          col("sh").cast("double") * col("sh") / col("nh")) *
          lit(1000000.0)).cast("long"))
    val tot = withPos.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("s"),
        sum(col("__x") * col("__x")).as("ss"))
      .withColumn("ss_total_q",
        floor((col("ss").cast("double") -
          col("s").cast("double") * col("s") / col("n")) *
          lit(1000000.0)).cast("long"))
    val within = perPos.groupBy(keyCols.map(col): _*)
      .agg(sum(col("within_q")).as("ss_within_q"))
    tot.join(within, keyCols)
      .select(keyCols.map(col) ++ Seq(col("n"), col("ss_total_q"),
        col("ss_within_q"),
        when(col("ss_total_q") > 0,
          lit(1.0) - col("ss_within_q").cast("double") /
            col("ss_total_q")).as("strength")): _*)
  }

  /** DuckDB oracle for [[seasonalityStrength]]: `innerSql` yields
    * (keyCols..., t, x) as integers. */
  def seasonalityStrengthOracleSql(innerSql: String,
      keyCols: Seq[String], season: Long = 24L): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH b AS ($innerSql), pp AS (
       |  SELECT $keys, t % $season AS pos,
       |         CAST(count(*) AS BIGINT) AS nh,
       |         CAST(sum(x) AS BIGINT) AS sh,
       |         CAST(sum(x * x) AS BIGINT) AS ssh
       |  FROM b GROUP BY ${(1 to keyCols.length + 1).mkString(", ")}
       |), wq AS (
       |  SELECT $keys,
       |         CAST(sum(CAST(floor((CAST(ssh AS DOUBLE)
       |           - CAST(sh AS DOUBLE) * sh / nh) * 1000000.0) AS BIGINT))
       |           AS BIGINT) AS ss_within_q
       |  FROM pp GROUP BY $keys
       |), tt AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(floor((CAST(sum(x * x) AS DOUBLE)
       |           - CAST(sum(x) AS DOUBLE) * sum(x) / count(*)) * 1000000.0)
       |           AS BIGINT) AS ss_total_q
       |  FROM b GROUP BY $keys
       |)
       |SELECT $keys, n, ss_total_q, ss_within_q,
       |       CASE WHEN ss_total_q > 0 THEN
       |         1.0 - CAST(ss_within_q AS DOUBLE) / ss_total_q END
       |         AS strength
       |FROM tt JOIN wq USING ($keys)""".stripMargin
  }

  /** Robust seasonal decomposition (STL's shape with MEDIANS — Cleveland
    * et al. 1990's robustness goal without loess): per key,
    * `trend = centered moving LOWER MEDIAN` (window `trendWindow`,
    * truncated at the series edges), `seasonal = per-phase lower median
    * of the detrended series` (phase = t mod period), `resid = x −
    * trend − seasonal`. Medians make the decomposition immune to the
    * spikes that wreck the moving-average/Holt–Winters fits (q324/q325
    * — this is their robust sibling; a single 1000× anomaly shifts
    * their trend for a whole window, and shifts this one not at all).
    *
    * Exactness: the LOWER median of integers is an ELEMENT (sorted
    * pick at ⌈n/2⌉) — no averaging, no floats anywhere; both engines
    * sort-and-index the same frame, so every output is an exact long.
    *
    * Scale shape: one keyed window carrying a `trendWindow`-bounded
    * collected frame (bounded array per row — the documented cap), one
    * (key, phase) aggregation whose groups are series-length/period
    * bounded, two keyed joins. Nothing global.
    *
    * @return (keyCol, tCol, x, trend, seasonal, resid) */
  def robustDecompose(df: DataFrame, keyCol: String, tCol: String,
      x: Column, period: Int, trendWindow: Int = 25): DataFrame = {
    require(period >= 2 && trendWindow >= 3 && trendWindow % 2 == 1)
    val W = org.apache.spark.sql.expressions.Window
    val half = trendWindow / 2
    val wT = W.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(-half, half)
    def lowerMed(arr: Column): Column =
      element_at(array_sort(arr), ((size(arr) + 1) / 2).cast("int"))
    val base = df.select(col(keyCol), col(tCol), x.as("x"))
      .withColumn("trend", lowerMed(collect_list(col("x")).over(wT)))
      .withColumn("__detr", col("x") - col("trend"))
      .withColumn("__ph", pmod(col(tCol), lit(period.toLong)))
    val seasonal = base.groupBy(col(keyCol), col("__ph"))
      .agg(lowerMed(collect_list(col("__detr"))).as("seasonal"))
    base.join(seasonal, Seq(keyCol, "__ph"))
      .select(col(keyCol), col(tCol), col("x"), col("trend"),
        col("seasonal"),
        (col("__detr") - col("seasonal")).as("resid"))
  }

  /** DuckDB oracle for [[robustDecompose]]: `innerSql` yields
    * (`keyName`, t, x). */
  def robustDecomposeOracleSql(innerSql: String, keyName: String,
      tName: String, period: Int, trendWindow: Int = 25): String = {
    val half = trendWindow / 2
    s"""WITH b AS (
       |  SELECT $keyName, $tName, x,
       |         list_sort(list(x) OVER (PARTITION BY $keyName
       |           ORDER BY $tName
       |           ROWS BETWEEN $half PRECEDING AND $half FOLLOWING))
       |           AS __w
       |  FROM ($innerSql)
       |), t AS MATERIALIZED (
       |  SELECT $keyName, $tName, x,
       |         __w[CAST((len(__w) + 1) // 2 AS INTEGER)] AS trend,
       |         x - __w[CAST((len(__w) + 1) // 2 AS INTEGER)] AS detr,
       |         $tName % $period AS ph
       |  FROM b
       |), s AS (
       |  SELECT $keyName, ph,
       |         list_sort(list(detr))
       |           [CAST((count(*) + 1) // 2 AS INTEGER)] AS seasonal
       |  FROM t GROUP BY 1, 2
       |)
       |SELECT t.$keyName, CAST(t.$tName AS BIGINT) AS $tName,
       |       CAST(t.x AS BIGINT) AS x,
       |       CAST(t.trend AS BIGINT) AS trend,
       |       CAST(s.seasonal AS BIGINT) AS seasonal,
       |       CAST(t.detr - s.seasonal AS BIGINT) AS resid
       |FROM t JOIN s USING ($keyName, ph)""".stripMargin
  }
}
