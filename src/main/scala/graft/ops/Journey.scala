package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over an event log: ordered funnels, retention
  * cohorts, and SCD2 (slowly-changing-dimension) interval histories — the
  * product-analytics surface a complete engine serves next to its
  * rollups.
  *
  * Scale shapes:
  *  - [[funnel]] is one keyed aggregation per stage chained by keyed
  *    joins (each stage's survivors only — monotonically shrinking), no
  *    window over the raw log.
  *  - [[retention]] is two keyed aggregations (first-touch, then
  *    cohort×offset distincts).
  *  - [[scd2]] is one window sort per key — the unavoidable shape for
  *    interval construction; keys partition it, so it scales with the
  *    busiest key, not the table.
  */
object Journey {

  /** Ordered funnel: for each stage i>0, a user converts only with an
    * event of that stage type AT/AFTER their stage i−1 conversion time
    * (first-touch semantics).
    *
    * @return (stage_idx, stage, n_users) — one row per stage
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct == stages,
      "repeated stage types make the survivor join ambiguous")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    // Stage i survivors: stage-i events of stage-(i-1) survivors at/after
    // their conversion time, reduced to first-touch per user.
    val stageFrames = stages.zipWithIndex.tail.scanLeft(first) {
      case (prev, (stage, i)) =>
        events.filter(col(typeCol) === stage)
          .join(prev, userCol)
          .filter(col(tsCol) >= col(s"t${i - 1}"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
    }
    stageFrames.zip(stages).zipWithIndex.map { case ((frame, stage), i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(stage).as("stage"),
          col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Retention cohorts: users cohorted by the week of their first
    * `anchorType` event; activity counted as distinct users per
    * (cohort_week, whole weeks since cohort) for events at/after the
    * anchor.
    *
    * @return (cohort_week: date, week_offset, n_users)
    */
  def retention(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, anchorType: String): DataFrame = {
    val anchors = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_anchor"))
    events.join(anchors, userCol)
      .filter(col(tsCol) >= col("t_anchor"))
      .select(col(userCol),
        date_trunc("week", col("t_anchor")).cast("date").as("cohort_week"),
        datediff(date_trunc("week", col(tsCol)).cast("date"),
          date_trunc("week", col("t_anchor")).cast("date")).as("__dd"))
      // integer div, not a float quotient cast: the double path is exact
      // only while __dd stays a multiple of 7 — div matches the oracle's
      // `// 7` unconditionally
      .withColumn("week_offset", expr("__dd div 7").cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** SCD2 interval history: each event opens a validity interval closed
    * by the key's next event (half-open [from, to); ties broken by
    * `tieCol` so the history is deterministic). The change-capture →
    * dimension-history step of a warehouse load.
    *
    * @return original columns + (valid_from, valid_to, is_current)
    */
  def scd2(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Per-user ordered action sequence — the behavior-sequence layout
    * recommender/session models train on (one row per user: the journey
    * as a delimited string plus span stats). Ordering ties on the
    * timestamp break by `tieCol` (an id), so the sequence is total and
    * reproducible across engines — `collect_list` alone has no order
    * contract; the `array_sort` over (ts, tie, action) structs imposes
    * one.
    *
    * ONE keyed shuffle; the per-user list is bounded by that user's
    * activity (the same bound any sessionization carries). Whale users →
    * cap first with [[Sampling.capPerKey]].
    *
    * @return (userCol, n_events, first_ts, last_ts, seq) */
  def eventSequences(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, actionCol: String, sep: String = "->"): DataFrame =
    events.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col(tsCol), col(tieCol), col(actionCol).as("__a")))),
            x => x.getField("__a")),
          sep).as("seq"))

  /** Inter-event GAP profile with the Goh–Barabási burstiness parameter
    * B = (σ−μ)/(σ+μ) over each user's gap distribution (gaps in whole
    * seconds): B → −1 is metronome-periodic (cron jobs, heartbeats),
    * B ≈ 0 memoryless/Poisson (organic usage), B → 1 bursty (sessions,
    * scrapers firing in volleys). The bot/automation signal per-event
    * rate thresholds miss — a slow cron and a human can share a rate
    * but never a B.
    *
    * Exactness: gaps are integer seconds (`Δmicros div 10⁶`), profiled
    * through exact integer (n, Σg, Σg²) with population σ derived by
    * one fixed IEEE sequence — the [[Exact.stddevFromSums]] recipe.
    * Σg² bound: gaps < 2⁶³ᐟ²·√n seconds — unreachable.
    *
    * Scale: one per-user lag window + one keyed aggregation; user
    * cardinality must exceed cores (the W3 contract).
    *
    * @return (userCol, n_gaps, s_gap, ss_gap, mean_gap, gap_sigma,
    *         burstiness) — users with < 2 gaps carry no dispersion
    *         verdict and drop; all-zero-gap users read B = NULL */
  def burstiness(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    // order by the derived micros (monotone in tsCol) — the projection
    // below drops the original timestamp column
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__m"), col(tieCol))
    // cast: parquet TIMESTAMP_NTZ → session-zone timestamp (sessions
    // run UTC, so the micros value is identity) — unix_micros rejects NTZ
    val gaps = events
      .select(col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__m"), col(tieCol))
      .withColumn("__prev", lag(col("__m"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("__g", expr("(__m - __prev) div 1000000"))
    gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__g")).as("s_gap"),
        sum(col("__g") * col("__g")).as("ss_gap"))
      .filter(col("n_gaps") >= 2)
      .withColumn("mean_gap", col("s_gap").cast("double") / col("n_gaps"))
      .withColumn("gap_sigma", sqrt(
        (col("ss_gap").cast("double") -
          col("s_gap").cast("double") * col("s_gap").cast("double") /
            col("n_gaps")) / col("n_gaps")))
      .withColumn("burstiness",
        when(col("gap_sigma") + col("mean_gap") > 0,
          (col("gap_sigma") - col("mean_gap")) /
            (col("gap_sigma") + col("mean_gap"))))
  }

  /** Observed-lifetime survival curve: for each whole-day lifetime d,
    * how many users stayed active at least d days (first-to-last event
    * span) and what fraction of the cohort that is — the product
    * analyst's engagement-decay read (NOT a censoring-corrected
    * Kaplan-Meier: within a fixed observation window, span IS the
    * observable; document the window with the result).
    *
    * Exact: spans in integer days (`Δmicros div 86400·10⁶`), the
    * survival counts a DESCENDING cumulative sum over the lifetime
    * HISTOGRAM — day-cardinality-bounded (the retention window's
    * calendar, not the user count), with the cohort total broadcast
    * back as one row.
    *
    * @return (lifetime_days, n_users, n_at_least, survival_frac) — one
    *         row per observed lifetime value
    */
  def lifetimeSurvival(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val spans = events
      .select(col(userCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__m"))
      .groupBy(col(userCol))
      .agg(min(col("__m")).as("__m0"), max(col("__m")).as("__m1"))
      .withColumn("lifetime_days", expr("(__m1 - __m0) div 86400000000"))
    val hist = spans.groupBy(col("lifetime_days"))
      .agg(count(lit(1)).as("n_users"))
    val wDesc = Window.orderBy(col("lifetime_days").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("n_at_least", sum(col("n_users")).over(wDesc))
      .withColumn("survival_frac",
        col("n_at_least").cast("double") /
          sum(col("n_users")).over(Window.partitionBy()))
  }

  /** DuckDB oracle for [[lifetimeSurvival]]. */
  def lifetimeSurvivalOracleSql(table: String, userCol: String,
      tsCol: String): String =
    s"""WITH s AS (
       |  SELECT $userCol,
       |         (max(epoch_us($tsCol)) - min(epoch_us($tsCol)))
       |           // 86400000000 AS lifetime_days
       |  FROM $table GROUP BY 1
       |), h AS (
       |  SELECT lifetime_days, CAST(count(*) AS BIGINT) AS n_users
       |  FROM s GROUP BY 1
       |)
       |SELECT lifetime_days, n_users,
       |       CAST(sum(n_users) OVER (ORDER BY lifetime_days DESC
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS n_at_least,
       |       CAST(sum(n_users) OVER (ORDER BY lifetime_days DESC
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS DOUBLE) / sum(n_users) OVER () AS survival_frac
       |FROM h""".stripMargin

  /** DAU / trailing-WAU stickiness per day — the engagement-intensity
    * ratio (what share of the weekly audience shows up daily) product
    * dashboards headline.
    *
    * Rolling DISTINCT users is not window-expressible (distinct does
    * not decompose over frames); instead each (user, day) activity row
    * CONTRIBUTES itself to the 7 trailing report days (`explode` of a
    * 7-element day sequence — a fixed fan-out, the q35 densify spirit),
    * then one distinct + one count per report day. Report days are
    * restricted to observed days (a day with zero activity has no DAU
    * row — honest, not a 0/0).
    *
    * @return (day, dau, wau, stickiness) — day = epoch days
    */
  def stickiness(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val userDays = events
      .select(col(userCol).as("u"),
        expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000")
          .as("day"))
      .distinct()
    val dau = userDays.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select(col("u"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day")) // inner: only observed days report
      .withColumn("stickiness", col("dau").cast("double") / col("wau"))
  }

  /** DuckDB oracle for [[stickiness]]. */
  def stickinessOracleSql(table: String, userCol: String, tsCol: String)
      : String =
    s"""WITH ud AS (
       |  SELECT DISTINCT $userCol AS u,
       |         epoch_us($tsCol) // 86400000000 AS day
       |  FROM $table
       |), dau AS (
       |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
       |), wau AS (
       |  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM (
       |    SELECT DISTINCT u, day + off AS day
       |    FROM ud, (SELECT unnest(range(0, 7)) AS off)
       |  ) GROUP BY 1
       |)
       |SELECT day, dau, wau, CAST(dau AS DOUBLE) / wau AS stickiness
       |FROM dau JOIN wau USING (day)""".stripMargin

  /** A-then-B-within-T conversion: per user, how many trigger events
    * (type A) were followed by an outcome event (type B) STRICTLY after
    * them and within `windowSeconds` — the time-constrained funnel step
    * ("purchased within an hour of the click") that the unconstrained
    * [[funnel]] cannot express.
    *
    * Plan: both legs filter at the scan, join on the USER key with the
    * time range as a join-side predicate — per-user fan-out is
    * A-count × B-count for that user (activity-bounded, the
    * sessionization bound; cap whales first with
    * [[Sampling.capPerKey]]). Conversion = EXISTS, realized as a
    * left-semi count per trigger, then one per-user rollup.
    *
    * @return (userCol, n_triggers, n_converted, conversion) per user
    *         with ≥ 1 trigger
    */
  def withinWindowConversion(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      triggerType: String, outcomeType: String, windowSeconds: Long)
      : DataFrame = {
    require(windowSeconds >= 1)
    val m = unix_micros(col(tsCol).cast("timestamp"))
    val a = events.filter(col(typeCol) === triggerType)
      .select(col(userCol).as("__u"), m.as("__am"), col(tieCol).as("__aid"))
    val b = events.filter(col(typeCol) === outcomeType)
      .select(col(userCol).as("__u"), m.as("__bm"))
    val aa = a.as("a"); val bb = b.as("b")
    val conv = aa.join(bb,
        col("a.__u") === col("b.__u") &&
          col("b.__bm") > col("a.__am") &&
          col("b.__bm") <= col("a.__am") + lit(windowSeconds * 1000000L),
        "left_semi")
      .groupBy(col("__u")).agg(count(lit(1)).as("n_converted"))
    val triggers = a.groupBy(col("__u")).agg(count(lit(1)).as("n_triggers"))
    triggers.join(conv, Seq("__u"), "left")
      .select(col("__u").as(userCol), col("n_triggers"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"),
        (coalesce(col("n_converted"), lit(0L)).cast("double") /
          col("n_triggers")).as("conversion"))
  }

  /** DuckDB oracle for [[withinWindowConversion]]. */
  def withinWindowOracleSql(table: String, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      triggerType: String, outcomeType: String, windowSeconds: Long)
      : String =
    s"""WITH a AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS am, $tieCol AS aid
       |  FROM $table WHERE $typeCol = '$triggerType'
       |), b AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS bm
       |  FROM $table WHERE $typeCol = '$outcomeType'
       |), conv AS (
       |  SELECT u, CAST(count(*) AS BIGINT) AS n_converted FROM a
       |  WHERE EXISTS (SELECT 1 FROM b
       |                WHERE b.u = a.u AND b.bm > a.am
       |                  AND b.bm <= a.am + ${windowSeconds * 1000000L})
       |  GROUP BY 1
       |), trig AS (
       |  SELECT u, CAST(count(*) AS BIGINT) AS n_triggers FROM a GROUP BY 1
       |)
       |SELECT trig.u AS $userCol, n_triggers,
       |       coalesce(n_converted, 0) AS n_converted,
       |       CAST(coalesce(n_converted, 0) AS DOUBLE) / n_triggers
       |         AS conversion
       |FROM trig LEFT JOIN conv ON conv.u = trig.u""".stripMargin

  /** Multi-touch attribution: distribute each conversion's credit over
    * the user's touches in the lookback window, under the three
    * standard models AT ONCE — first-touch, last-touch, linear — so the
    * model disagreement (the actual analyst question: "does paid search
    * only close or also open?") is one frame, not three pipeline runs.
    *
    * Credit is integer micros per conversion (1e6 split per model;
    * linear truncates `1e6 div n` per touch — up to n−1 micros of a
    * conversion evaporate, documented bias, exactness over prettiness).
    * First/last are total-order picks: (ts, tie) ascending/descending.
    * Conversions with no in-window touch carry no credit anywhere.
    *
    * Plan: both legs filter at the scan, one USER-keyed join with the
    * time range as a join predicate (activity-bounded fan-out, the q213
    * shape), two fused per-conversion windows, one channel rollup.
    *
    * @return (channel, n_touches, first_micro, last_micro,
    *         linear_micro) per touch channel (= `typeCol` value)
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, tieCol: String, conversionType: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1)
    val m = unix_micros(col(tsCol).cast("timestamp"))
    val conv = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("__u"), m.as("__cm"), col(tieCol).as("__cid"))
      .as("c")
    val touch = events.filter(col(typeCol) =!= conversionType)
      .select(col(userCol).as("__u"), m.as("__tm"), col(tieCol).as("__tid"),
        col(typeCol).as("channel"))
      .as("t")
    val pairs = touch.join(conv,
      col("t.__u") === col("c.__u") &&
        col("t.__tm") < col("c.__cm") &&
        col("t.__tm") >= col("c.__cm") - lit(windowSeconds * 1000000L))
    val wConv = Window.partitionBy(col("c.__u"), col("c.__cid"))
    val rFirst = row_number()
      .over(wConv.orderBy(col("t.__tm"), col("t.__tid")))
    val rLast = row_number()
      .over(wConv.orderBy(col("t.__tm").desc, col("t.__tid").desc))
    pairs
      .withColumn("__n", count(lit(1)).over(wConv))
      .withColumn("__first", when(rFirst === 1, lit(1000000L)).otherwise(0L))
      .withColumn("__last", when(rLast === 1, lit(1000000L)).otherwise(0L))
      .withColumn("__linear", expr("1000000 div __n"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("__first")).as("first_micro"),
        sum(col("__last")).as("last_micro"),
        sum(col("__linear")).as("linear_micro"))
  }

  /** DuckDB oracle for [[attribution]]. */
  def attributionOracleSql(table: String, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      conversionType: String, windowSeconds: Long): String =
    s"""WITH c AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS cm, $tieCol AS cid
       |  FROM $table WHERE $typeCol = '$conversionType'
       |), t AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS tm, $tieCol AS tid,
       |         $typeCol AS channel
       |  FROM $table WHERE $typeCol <> '$conversionType'
       |), p AS (
       |  SELECT t.channel, c.u, c.cid, t.tm, t.tid
       |  FROM t JOIN c ON t.u = c.u AND t.tm < c.cm
       |    AND t.tm >= c.cm - ${windowSeconds * 1000000L}
       |), w AS (
       |  SELECT channel,
       |    CASE WHEN row_number() OVER (PARTITION BY u, cid
       |      ORDER BY tm, tid) = 1 THEN 1000000 ELSE 0 END AS f,
       |    CASE WHEN row_number() OVER (PARTITION BY u, cid
       |      ORDER BY tm DESC, tid DESC) = 1 THEN 1000000 ELSE 0 END AS l,
       |    1000000 // count(*) OVER (PARTITION BY u, cid) AS lin
       |  FROM p
       |)
       |SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
       |       CAST(sum(f) AS BIGINT) AS first_micro,
       |       CAST(sum(l) AS BIGINT) AS last_micro,
       |       CAST(sum(lin) AS BIGINT) AS linear_micro
       |FROM w GROUP BY 1""".stripMargin

  /** Per-user CONSUMPTION DIVERSITY: entropy of each user's event-type
    * distribution via the integer identity `h_q = n·blog(n) −
    * Σ k·blog(k)` (the q282 device per user) — the engagement-breadth
    * signal ("power users of one feature" vs "explorers") a type count
    * alone misses.
    *
    * @return per user: (userCol, n, n_types, h_q)
    */
  def userDiversity(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    val blog = (x: Column) => length(bin(x)).cast("long")
    events.select(col(userCol), col(typeCol).as("__t"))
      .groupBy(col(userCol), col("__t"))
      .agg(count(lit(1)).as("__k"))
      .groupBy(col(userCol))
      .agg(sum(col("__k")).as("n"), count(lit(1)).as("n_types"),
        sum(col("__k") * blog(col("__k"))).as("__skb"))
      .withColumn("h_q", col("n") * blog(col("n")) - col("__skb"))
      .drop("__skb")
  }

  /** DuckDB oracle for [[userDiversity]]. */
  def userDiversityOracleSql(table: String, userCol: String,
      typeCol: String): String =
    s"""WITH k AS (
       |  SELECT $userCol, $typeCol, CAST(count(*) AS BIGINT) AS k
       |  FROM $table GROUP BY 1, 2
       |), g AS (
       |  SELECT $userCol, CAST(sum(k) AS BIGINT) AS n,
       |         CAST(count(*) AS BIGINT) AS n_types,
       |         CAST(sum(k * length(bin(k))) AS BIGINT) AS skb
       |  FROM k GROUP BY 1
       |)
       |SELECT $userCol, n, n_types,
       |       CAST(n * length(bin(n)) - skb AS BIGINT) AS h_q
       |FROM g""".stripMargin

  /** ACTIVATION LAG: days from a user's FIRST event to their k-th
    * `milestoneType` event — "how long to the third purchase", the
    * activation metric growth teams steer by; discrete quantiles over
    * the lag-value histogram (the q243 device — no global row sort).
    *
    * @return one row: (n_activated, p50_days, p90_days per `ps`)
    */
  def activationLag(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      milestoneType: String, k: Int,
      ps: Seq[(Int, Int)] = Seq((1, 2), (9, 10))): DataFrame = {
    require(k >= 1 && ps.nonEmpty)
    val m = unix_micros(col(tsCol).cast("timestamp"))
    val first = events.groupBy(col(userCol).as("__u"))
      .agg(min(m).as("__m0"))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__mk"), col("__tie"))
    val kth = events.filter(col(typeCol) === milestoneType)
      .select(col(userCol).as("__u"), m.as("__mk"),
        col(tieCol).as("__tie"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === k)
    val lags = kth.join(first, "__u")
      .select(expr("(__mk - __m0) div 86400000000").as("d"))
    val hist = lags.groupBy(col("d")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("__N", sum(col("c")).over(wAll))
    val qs = ps.map { case (num, den) =>
      min(when(col("cum") * den >= col("__N") * num, col("d")))
        .as(s"p${num * 100 / den}_days")
    }
    val aggs = max(col("__N")).as("n_activated") +: qs
    cum.agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB oracle for [[activationLag]]. */
  def activationLagOracleSql(table: String, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      milestoneType: String, k: Int,
      ps: Seq[(Int, Int)] = Seq((1, 2), (9, 10))): String = {
    val qs = ps.map { case (num, den) =>
      s"""min(CASE WHEN cum * $den >= nn * $num THEN d END)
         |  AS p${num * 100 / den}_days""".stripMargin
    }.mkString(",\n|       ")
    s"""WITH f AS (
       |  SELECT $userCol AS u, min(epoch_us($tsCol)) AS m0
       |  FROM $table GROUP BY 1
       |), kth AS (
       |  SELECT u, mk FROM (
       |    SELECT $userCol AS u, epoch_us($tsCol) AS mk,
       |           row_number() OVER (PARTITION BY $userCol
       |             ORDER BY epoch_us($tsCol), $tieCol) AS rn
       |    FROM $table WHERE $typeCol = '$milestoneType'
       |  ) WHERE rn = $k
       |), lag0 AS (
       |  SELECT (mk - m0) // 86400000000 AS d
       |  FROM kth JOIN f USING (u)
       |), h AS (
       |  SELECT d, CAST(count(*) AS BIGINT) AS c FROM lag0 GROUP BY 1
       |), cc AS (
       |  SELECT d,
       |    CAST(sum(c) OVER (ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(c) OVER () AS BIGINT) AS nn
       |  FROM h
       |)
       |SELECT max(nn) AS n_activated,
       |       $qs
       |FROM cc""".stripMargin
  }

  /** STRICT-ORDER time-boxed 3-step funnel: users who did s1, then s2
    * within `windowSeconds` of SOME qualifying s1, then s3 within the
    * window of that s2 — the sequencing-and-deadline funnel the
    * unordered q60 membership funnel can't express (doing the steps
    * backwards counts there, not here).
    *
    * Step sets are EXISTS semantics realized as user-keyed semi-join
    * chains (activity-bounded fan-out, the q213 shape) — each step's
    * population is a set of users, counted exactly.
    *
    * @return one row: (n_step1, n_step2, n_step3, rate_12, rate_23,
    *         rate_13)
    */
  def funnelSteps3(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, s1: String, s2: String, s3: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1)
    val m = unix_micros(col(tsCol).cast("timestamp"))
    val win = windowSeconds * 1000000L
    def step(t: String, u: String, mm: String) =
      events.filter(col(typeCol) === t)
        .select(col(userCol).as(u), m.as(mm))
    val e1 = step(s1, "__u", "__m1")
    val e2 = step(s2, "__u2", "__m2")
    val e3 = step(s3, "__u3", "__m3")
    val p12 = e1.join(e2,
      col("__u") === col("__u2") && col("__m2") > col("__m1") &&
        col("__m2") <= col("__m1") + win)
    val p123 = p12.join(e3,
      col("__u") === col("__u3") && col("__m3") > col("__m2") &&
        col("__m3") <= col("__m2") + win)
    val n1 = e1.agg(countDistinct(col("__u")).as("n_step1"))
    val n2 = p12.agg(countDistinct(col("__u")).as("n_step2"))
    val n3 = p123.agg(countDistinct(col("__u")).as("n_step3"))
    n1.crossJoin(broadcast(n2)).crossJoin(broadcast(n3))
      .withColumn("rate_12",
        when(col("n_step1") > 0,
          col("n_step2").cast("double") / col("n_step1")))
      .withColumn("rate_23",
        when(col("n_step2") > 0,
          col("n_step3").cast("double") / col("n_step2")))
      .withColumn("rate_13",
        when(col("n_step1") > 0,
          col("n_step3").cast("double") / col("n_step1")))
  }

  /** DuckDB oracle for [[funnelSteps3]]. */
  def funnelSteps3OracleSql(table: String, userCol: String,
      typeCol: String, tsCol: String, s1: String, s2: String,
      s3: String, windowSeconds: Long): String = {
    val win = windowSeconds * 1000000L
    s"""WITH e1 AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS m1 FROM $table
       |  WHERE $typeCol = '$s1'
       |), e2 AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS m2 FROM $table
       |  WHERE $typeCol = '$s2'
       |), e3 AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS m3 FROM $table
       |  WHERE $typeCol = '$s3'
       |), p12 AS (
       |  SELECT e1.u, e2.m2 FROM e1 JOIN e2 ON e1.u = e2.u
       |    AND e2.m2 > e1.m1 AND e2.m2 <= e1.m1 + $win
       |), p123 AS (
       |  SELECT p12.u FROM p12 JOIN e3 ON p12.u = e3.u
       |    AND e3.m3 > p12.m2 AND e3.m3 <= p12.m2 + $win
       |), s AS (
       |  SELECT (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM e1)
       |           AS n_step1,
       |         (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM p12)
       |           AS n_step2,
       |         (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM p123)
       |           AS n_step3
       |)
       |SELECT n_step1, n_step2, n_step3,
       |  CASE WHEN n_step1 > 0 THEN
       |    CAST(n_step2 AS DOUBLE) / n_step1 END AS rate_12,
       |  CASE WHEN n_step2 > 0 THEN
       |    CAST(n_step3 AS DOUBLE) / n_step2 END AS rate_23,
       |  CASE WHEN n_step1 > 0 THEN
       |    CAST(n_step3 AS DOUBLE) / n_step1 END AS rate_13
       |FROM s""".stripMargin
  }

  /** RESTRICTED MEAN SURVIVAL TIME: expected observed lifetime TRUNCATED
    * at a horizon — `RMST(H) = E[min(L, H)]`, the area under the
    * survival curve up to H, computed directly as an exact truncated-
    * lifetime mean (no curve materialization): the "how many days do we
    * keep a user, within the first month" single number on top of
    * [[lifetimeSurvival]]'s full curve.
    *
    * @return one row: (n, horizon_days, sum_trunc_days, rmst_days)
    */
  def rmst(events: DataFrame, userCol: String, tsCol: String,
      horizonDays: Long): DataFrame = {
    require(horizonDays >= 1)
    val m = unix_micros(col(tsCol).cast("timestamp"))
    events.select(col(userCol).as("__u"), m.as("__m"))
      .groupBy(col("__u"))
      .agg(expr("(max(__m) - min(__m)) div 86400000000").as("__days"))
      .select(least(col("__days"), lit(horizonDays)).as("__trunc"))
      .agg(count(lit(1)).as("n"), lit(horizonDays).as("horizon_days"),
        sum(col("__trunc")).as("sum_trunc_days"))
      .withColumn("rmst_days",
        col("sum_trunc_days").cast("double") / col("n"))
  }

  /** DuckDB oracle for [[rmst]]. */
  def rmstOracleSql(table: String, userCol: String, tsCol: String,
      horizonDays: Long): String =
    s"""WITH l AS (
       |  SELECT $userCol AS u,
       |         (max(epoch_us($tsCol)) - min(epoch_us($tsCol)))
       |           // 86400000000 AS days
       |  FROM $table GROUP BY 1
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n,
       |       CAST($horizonDays AS BIGINT) AS horizon_days,
       |       CAST(sum(least(days, $horizonDays)) AS BIGINT)
       |         AS sum_trunc_days,
       |       CAST(sum(least(days, $horizonDays)) AS DOUBLE) / count(*)
       |         AS rmst_days
       |FROM l""".stripMargin

  /** GROWTH ACCOUNTING (the Social-Capital ledger): per period, active
    * users split into NEW (first period ever), RETAINED (also active
    * the previous period) and RESURRECTED (active before, skipped the
    * previous period), plus CHURNED (active previous period, gone now)
    * — the four numbers whose sum explains every DAU/WAU move, where
    * q61's retention triangles only show decay curves.
    *
    * Identity (testable): active(w) = new + retained + resurrected, and
    * active(w−1) = retained(w) + churned(w).
    *
    * Scale shape: one (user, period) distinct, one per-user min
    * aggregation, two self-joins keyed on (user, period±1). No windows.
    *
    * @param periodCol integer period (e.g. epoch-week)
    * @return per period: (period, n_active, n_new, n_retained,
    *         n_resurrected, n_churned)
    */
  def growthAccounting(events: DataFrame, userCol: String,
      periodCol: Column): DataFrame = {
    val au = events.select(col(userCol).as("__u"), periodCol.as("__w"))
      .filter(col("__w").isNotNull)
      .distinct()
    val firstW = au.groupBy(col("__u")).agg(min(col("__w")).as("__fw"))
    val prev = au.select(col("__u"), (col("__w") + 1).as("__w"),
      lit(1L).as("__wasPrev"))
    val flags = au.join(firstW, "__u")
      .join(prev, Seq("__u", "__w"), "left")
      .select(col("__w"),
        when(col("__w") === col("__fw"), 1L).otherwise(0L).as("__new"),
        when(col("__wasPrev") === 1L, 1L).otherwise(0L).as("__ret"),
        when(col("__w") > col("__fw") && col("__wasPrev").isNull, 1L)
          .otherwise(0L).as("__res"))
      .groupBy(col("__w").as("period"))
      .agg(count(lit(1)).as("n_active"), sum(col("__new")).as("n_new"),
        sum(col("__ret")).as("n_retained"),
        sum(col("__res")).as("n_resurrected"))
    val churn = au.select(col("__u"), (col("__w") + 1).as("__w"))
      .join(au.withColumn("__act", lit(1L)), Seq("__u", "__w"), "left")
      .filter(col("__act").isNull)
      .groupBy(col("__w").as("period"))
      .agg(count(lit(1)).as("n_churned"))
    flags.join(churn, Seq("period"), "full_outer")
      .select(col("period"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** DuckDB oracle for [[growthAccounting]]: `innerSql` yields (u, w). */
  def growthAccountingOracleSql(innerSql: String): String =
    s"""WITH au AS (
       |  SELECT DISTINCT u, w FROM ($innerSql) WHERE w IS NOT NULL
       |), fw AS (SELECT u, min(w) AS fwk FROM au GROUP BY 1),
       |fl AS (
       |  SELECT au.w,
       |    CASE WHEN au.w = fw.fwk THEN 1 ELSE 0 END AS isnew,
       |    CASE WHEN p.u IS NOT NULL THEN 1 ELSE 0 END AS isret,
       |    CASE WHEN au.w > fw.fwk AND p.u IS NULL THEN 1 ELSE 0 END
       |      AS isres
       |  FROM au JOIN fw ON au.u = fw.u
       |  LEFT JOIN au p ON p.u = au.u AND p.w = au.w - 1
       |), g AS (
       |  SELECT w AS period, CAST(count(*) AS BIGINT) AS n_active,
       |         CAST(sum(isnew) AS BIGINT) AS n_new,
       |         CAST(sum(isret) AS BIGINT) AS n_retained,
       |         CAST(sum(isres) AS BIGINT) AS n_resurrected
       |  FROM fl GROUP BY 1
       |), ch AS (
       |  SELECT a.w + 1 AS period, CAST(count(*) AS BIGINT) AS n_churned
       |  FROM au a LEFT JOIN au b ON b.u = a.u AND b.w = a.w + 1
       |  WHERE b.u IS NULL GROUP BY 1
       |)
       |SELECT coalesce(g.period, ch.period) AS period,
       |       coalesce(n_active, 0) AS n_active,
       |       coalesce(n_new, 0) AS n_new,
       |       coalesce(n_retained, 0) AS n_retained,
       |       coalesce(n_resurrected, 0) AS n_resurrected,
       |       coalesce(n_churned, 0) AS n_churned
       |FROM g FULL OUTER JOIN ch ON g.period = ch.period""".stripMargin

  /** Windowed co-occurrence matrix: for EVERY ordered event-type pair
    * (a, b), how often b follows a within `windowSeconds` on the same
    * user — the all-pairs generalization of [[withinWindowConversion]]
    * (one chosen pair) and the q173 Markov matrix (adjacent steps
    * only): "what tends to happen within the hour after X", per X.
    *
    * Scale shape: ONE user-keyed self-join with the time range as a
    * join predicate (per-user fan-out activity-bounded — cap whales
    * with [[Sampling.capPerKey]] first), one pair aggregation. Distinct
    * users via exact count (the matrix is |types|² rows).
    *
    * @return (type_a, type_b, n_pairs, n_users) — ordered pairs,
    *         a ≠ b, strictly later b
    */
  def cooccurrenceWindow(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1)
    val m = unix_micros(col(tsCol).cast("timestamp"))
    val a = events.select(col(userCol).as("__u"), col(typeCol).as("ta"),
      m.as("__ma"))
    val b = events.select(col(userCol).as("__u2"), col(typeCol).as("tb"),
      m.as("__mb"))
    a.join(b,
        col("__u") === col("__u2") &&
          col("ta") =!= col("tb") &&
          col("__mb") > col("__ma") &&
          col("__mb") <= col("__ma") + lit(windowSeconds * 1000000L))
      .groupBy(col("ta").as("type_a"), col("tb").as("type_b"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("__u")).as("n_users"))
  }

  /** DuckDB oracle for [[cooccurrenceWindow]]. */
  def cooccurrenceOracleSql(table: String, userCol: String,
      typeCol: String, tsCol: String, windowSeconds: Long): String =
    s"""WITH e AS (
       |  SELECT $userCol AS u, $typeCol AS ty, epoch_us($tsCol) AS m
       |  FROM $table
       |)
       |SELECT a.ty AS type_a, b.ty AS type_b,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(count(DISTINCT a.u) AS BIGINT) AS n_users
       |FROM e a JOIN e b ON a.u = b.u AND a.ty <> b.ty
       |  AND b.m > a.m AND b.m <= a.m + ${windowSeconds * 1000000L}
       |GROUP BY 1, 2""".stripMargin

  /** Time-to-convert distribution: per user, FIRST trigger → first
    * outcome after it; discrete quantiles of the lag in seconds — the
    * "how long does the funnel take" number
    * [[withinWindowConversion]]'s fixed-window rate can't give (it
    * answers "how many convert within T", this answers "what T
    * covers the median / the p90").
    *
    * Quantiles come from the lag-value histogram (cumulative counts
    * over DISTINCT lag values — the q84 device), so there is no global
    * row sort; rank ⌈p·n⌉ discrete selection, the q40 convention.
    *
    * @param ps quantiles as (num, den) rationals, e.g. (1,2) → p50
    * @return one row: (n_converted, p50_sec, p90_sec, ...) per `ps`
    */
  def conversionLag(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, triggerType: String, outcomeType: String,
      ps: Seq[(Int, Int)] = Seq((1, 2), (9, 10))): DataFrame = {
    require(ps.nonEmpty)
    val m = unix_micros(col(tsCol).cast("timestamp"))
    val trig = events.filter(col(typeCol) === triggerType)
      .groupBy(col(userCol).as("__u")).agg(min(m).as("__tm"))
    val outc = events.filter(col(typeCol) === outcomeType)
      .select(col(userCol).as("__u"), m.as("__om"))
    val deltas = trig.join(outc, "__u")
      .filter(col("__om") > col("__tm"))
      .groupBy(col("__u"), col("__tm")).agg(min(col("__om")).as("__om"))
      .select(expr("(__om - __tm) div 1000000").as("d"))
    val hist = deltas.groupBy(col("d")).agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("__N", sum(col("c")).over(wAll))
    val qs = ps.map { case (num, den) =>
      min(when(col("cum") * den >= col("__N") * num, col("d")))
        .as(s"p${num * 100 / den}_sec")
    }
    val aggs = max(col("__N")).as("n_converted") +: qs
    cum.agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB oracle for [[conversionLag]]. */
  def conversionLagOracleSql(table: String, userCol: String,
      typeCol: String, tsCol: String, triggerType: String,
      outcomeType: String,
      ps: Seq[(Int, Int)] = Seq((1, 2), (9, 10))): String = {
    val qs = ps.map { case (num, den) =>
      s"""min(CASE WHEN cum * $den >= nn * $num THEN d END)
         |  AS p${num * 100 / den}_sec""".stripMargin
    }.mkString(",\n|       ")
    s"""WITH trig AS (
       |  SELECT $userCol AS u, min(epoch_us($tsCol)) AS tm
       |  FROM $table WHERE $typeCol = '$triggerType' GROUP BY 1
       |), outc AS (
       |  SELECT $userCol AS u, epoch_us($tsCol) AS om
       |  FROM $table WHERE $typeCol = '$outcomeType'
       |), d0 AS (
       |  SELECT (min(om) - tm) // 1000000 AS d
       |  FROM trig JOIN outc USING (u) WHERE om > tm
       |  GROUP BY u, tm
       |), h AS (
       |  SELECT d, CAST(count(*) AS BIGINT) AS c FROM d0 GROUP BY 1
       |), cc AS (
       |  SELECT d,
       |    CAST(sum(c) OVER (ORDER BY d
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(c) OVER () AS BIGINT) AS nn
       |  FROM h
       |)
       |SELECT max(nn) AS n_converted,
       |       $qs
       |FROM cc""".stripMargin
  }

  /** Batch sessionization: split each user's event stream at inactivity
    * gaps > `gapSeconds`, one output row per SESSION with its span and
    * size — the batch sibling of the streaming session window
    * ([[graft.streaming.Streams]] S-ops), and the input the funnel /
    * burstiness / Markov family refines.
    *
    * The classic two-window formulation: a lag gap flags session starts,
    * a running sum of flags numbers sessions (both over the same
    * (user, ts, tie) keyed order — ONE shuffle, Spark fuses the
    * windows), then one keyed aggregation per (user, session). Gaps are
    * exact integer seconds (`Δmicros div 10⁶`, the [[burstiness]]
    * contract).
    *
    * @return (userCol, session_idx, n_events, first_ts, last_ts,
    *         duration_sec)
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 1, s"gap must be >= 1s, got $gapSeconds")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__m"), col(tieCol))
    events
      .select(col(userCol), col(tsCol).as("__ts"),
        unix_micros(col(tsCol).cast("timestamp")).as("__m"), col(tieCol))
      .withColumn("__prev", lag(col("__m"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          expr("(__m - __prev) div 1000000") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts")).as("first_ts"),
        max(col("__ts")).as("last_ts"),
        min(col("__m")).as("__m0"), max(col("__m")).as("__m1"))
      // integer div, never double-divide-then-cast (rounding can land
      // on the next integer)
      .withColumn("duration_sec", expr("(__m1 - __m0) div 1000000"))
      .drop("__m0", "__m1")
  }

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * DATA-DRIVEN model next to [[attribution]]'s heuristic trio: build
    * the first-order journey chain (START → channels → CONV/NULL,
    * truncated at the first conversion), compute the absorption
    * probability of converting, and credit each channel by how much
    * that probability DROPS when the channel is removed (transitions
    * into it redirected to NULL) — "what would conversions be without
    * this channel", which first/last/linear cannot ask.
    *
    * Deterministic integer recurrence: absorption probabilities in
    * exact micros via `iters` synchronous Jacobi sweeps —
    * `p'(s) = (Σ_j n_sj·val(j)) div n_s` with val(CONV) = 10⁶,
    * val(NULL) = val(removed) = 0 — identical on both engines (the
    * oracle unrolls every sweep per scenario). Fixed sweep count: the
    * chain has cycles, so this is the documented bounded-horizon
    * estimate (micro-scale convergence by ~10 sweeps on acyclic-ish
    * journey data).
    *
    * Scale shape: journey truncation and transition building are two
    * keyed windows + one counting aggregation; the transition matrix
    * is ≤ (|channels|+1)² rows — COLLECTED under the bounded-frame
    * contract (the IVF-centroid idiom) and iterated driver-side;
    * `channels` is the fixed catalog the caller states (shared with
    * the oracle generation, the stopword-list pattern).
    *
    * @return per channel: (channel, base_micro, removed_micro,
    *         effect_micro, share_micro) — share NULL when no channel
    *         has positive effect */
  def markovAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      conversionType: String, channels: Seq[String],
      iters: Int = 12): DataFrame = {
    require(channels.nonEmpty && iters >= 1 && iters <= 24)
    val spark = events.sparkSession
    val m = unix_micros(col(tsCol).cast("timestamp"))
    val ev = events
      .filter(col(typeCol).isInCollection(channels :+ conversionType))
      .select(col(userCol).as("__u"), m.as("__m"),
        col(tieCol).as("__id"), col(typeCol).as("__et"))
    // first conversion instant per user, (ts, tie) total order
    val fc = ev.filter(col("__et") === conversionType)
      .groupBy(col("__u"))
      .agg(min(struct(col("__m"), col("__id"))).as("__fc"))
    val ch = ev.filter(col("__et") =!= conversionType)
      .join(fc, Seq("__u"), "left")
      .filter(col("__fc").isNull ||
        struct(col("__m"), col("__id")) < col("__fc"))
      .withColumn("__conv", col("__fc").isNotNull)
    val wU = Window.partitionBy(col("__u"))
      .orderBy(col("__m"), col("__id"))
    val steps = ch
      .select(coalesce(lag(col("__et"), 1).over(wU), lit("START"))
        .as("f"), col("__et").as("t"))
    val wDesc = Window.partitionBy(col("__u"))
      .orderBy(col("__m").desc, col("__id").desc)
    val lasts = ch
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") === 1)
      .select(col("__et").as("f"),
        when(col("__conv"), lit("CONV")).otherwise(lit("NULL")).as("t"))
    // converted users with zero channel touches: START → CONV
    val direct = fc.join(
        ch.select(col("__u")).distinct(), Seq("__u"), "left_anti")
      .select(lit("START").as("f"), lit("CONV").as("t"))
    val tr = steps.unionAll(lasts).unionAll(direct)
      .groupBy(col("f"), col("t")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the bounded-frame contract, ASSERTED: sources ∈ {START}∪channels,
    // targets ∈ channels∪{CONV,NULL} — corpus scale grows the counts in
    // the cells, never the cell count
    require(tr.length <= (channels.size + 1) * (channels.size + 2),
      s"transition matrix ${tr.length} rows exceeds the " +
        s"(|channels|+1)·(|channels|+2) bound — typeCol values outside " +
        s"the stated channel catalog")
    // driver-side integer sweeps over the bounded matrix
    val states = "START" +: channels
    val outN = tr.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    def sweep(removed: Option[String]): Long = {
      var p = states.map(_ -> 0L).toMap
      (1 to iters).foreach { _ =>
        p = states.map { s =>
          val num = tr.filter(_._1 == s).map { case (_, t, n) =>
            n * (t match {
              case "CONV" => 1000000L
              case "NULL" => 0L
              case c if removed.contains(c) => 0L
              case c => p.getOrElse(c, 0L)
            })
          }.sum
          s -> (if (outN.getOrElse(s, 0L) == 0L) 0L
                else num / outN(s))
        }.toMap
      }
      p("START")
    }
    val base = sweep(None)
    val rows = channels.sorted.map { c =>
      val rem = sweep(Some(c))
      (c, base, rem, math.max(base - rem, 0L))
    }
    val tot = rows.map(_._4).sum
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (c, b, r, e) =>
        org.apache.spark.sql.Row(c, b, r, e,
          if (tot > 0) java.lang.Long.valueOf(e * 1000000L / tot)
          else null)
      }.asJava,
      StructType(Seq(StructField("channel", StringType),
        StructField("base_micro", LongType),
        StructField("removed_micro", LongType),
        StructField("effect_micro", LongType),
        StructField("share_micro", LongType))))
  }

  /** DuckDB oracle for [[markovAttribution]]: the transition CTE, then
    * per scenario (base + one per channel) the `iters` sweeps unrolled
    * — each a 1-CTE aggregation over the transition matrix joined to
    * the previous sweep's state frame. */
  def markovAttributionOracleSql(table: String, userCol: String,
      typeCol: String, tsCol: String, tieCol: String,
      conversionType: String, channels: Seq[String],
      iters: Int = 12): String = {
    val chList = channels.map(c => s"'$c'").mkString(", ")
    def sweeps(tag: String, removed: Option[String]): String = {
      val remVal = removed.map(c => s"WHEN t = '$c' THEN 0").getOrElse("")
      (1 to iters).map { i =>
        s"""p$tag$i AS (
           |  SELECT f AS s, CAST(sum(n * (CASE WHEN t = 'CONV' THEN 1000000
           |           WHEN t = 'NULL' THEN 0 $remVal
           |           ELSE coalesce(pp.p, 0) END)) // sum(n) AS BIGINT) AS p
           |  FROM tr LEFT JOIN p$tag${i - 1} pp ON pp.s = tr.t
           |  GROUP BY 1
           |)""".stripMargin
      }.mkString(", ")
    }
    val p0 = s"(SELECT 'START' AS s, CAST(0 AS BIGINT) AS p UNION ALL " +
      channels.map(c => s"SELECT '$c', 0").mkString(" UNION ALL ") + ")"
    val scenarioCtes = (("base", None) +:
      channels.sorted.map(c => (s"r${channels.sorted.indexOf(c)}", Some(c))))
      .map { case (tag, rem) =>
        s"p${tag}0 AS (SELECT * FROM $p0 z), ${sweeps(tag, rem)}"
      }.mkString(", ")
    val effects = channels.sorted.zipWithIndex.map { case (c, i) =>
      s"""SELECT '$c' AS channel,
         |  (SELECT p FROM pbase$iters WHERE s = 'START') AS base_micro,
         |  (SELECT p FROM pr$i$iters WHERE s = 'START') AS removed_micro"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ev AS (
       |  SELECT $userCol AS u, $tsCol AS m, $tieCol AS id,
       |         $typeCol AS et
       |  FROM $table
       |  WHERE $typeCol IN ($chList, '$conversionType')
       |), fc AS (
       |  SELECT u, m AS fm, id AS fid FROM (
       |    SELECT u, m, id,
       |           row_number() OVER (PARTITION BY u ORDER BY m, id) AS rn
       |    FROM ev WHERE et = '$conversionType') WHERE rn = 1
       |), ch AS (
       |  SELECT ev.u, ev.m, ev.id, ev.et, fc.u IS NOT NULL AS conv
       |  FROM ev LEFT JOIN fc USING (u)
       |  WHERE ev.et <> '$conversionType'
       |    AND (fc.u IS NULL OR ev.m < fc.fm
       |         OR (ev.m = fc.fm AND ev.id < fc.fid))
       |), steps AS (
       |  SELECT coalesce(lag(et) OVER (PARTITION BY u ORDER BY m, id),
       |           'START') AS f, et AS t
       |  FROM ch
       |  UNION ALL
       |  SELECT et, CASE WHEN conv THEN 'CONV' ELSE 'NULL' END
       |  FROM (SELECT et, conv, row_number() OVER (PARTITION BY u
       |          ORDER BY m DESC, id DESC) AS rn FROM ch)
       |  WHERE rn = 1
       |  UNION ALL
       |  SELECT 'START', 'CONV' FROM fc
       |  WHERE fc.u NOT IN (SELECT DISTINCT u FROM ch)
       |), tr AS MATERIALIZED (
       |  SELECT f, t, CAST(count(*) AS BIGINT) AS n
       |  FROM steps GROUP BY 1, 2
       |), $scenarioCtes,
       |eff AS ($effects)
       |SELECT channel, base_micro, removed_micro,
       |       greatest(base_micro - removed_micro, 0) AS effect_micro,
       |       CASE WHEN (SELECT sum(greatest(base_micro - removed_micro, 0))
       |                  FROM eff) > 0
       |            THEN CAST(greatest(base_micro - removed_micro, 0)
       |                   * 1000000
       |                   // (SELECT sum(greatest(base_micro
       |                        - removed_micro, 0)) FROM eff)
       |                   AS BIGINT)
       |            END AS share_micro
       |FROM eff""".stripMargin
  }
}
