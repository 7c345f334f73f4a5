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
object TimeSeries {

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
