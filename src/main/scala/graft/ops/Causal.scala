package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Causal-inference / observational-effect estimators, split from
  * [[ABTest]] (which keeps the randomized-experiment hypothesis tests):
  * paired pre/post differences, segment-mix decomposition, event-study
  * panels, CUPED variance reduction, difference-in-differences, and
  * coarsened-exact-matching ATT — the designs an analyst reaches for
  * when assignment was NOT randomized (or a randomized metric needs a
  * covariate adjustment). Exactness and scale contracts follow the
  * [[ABTest]] conventions: integer ledgers aggregated exactly, doubles
  * derived by one identical IEEE expression on both engines, plans of
  * one-or-two keyed aggregations with dimension-sized frames broadcast.
  */
object Causal {

  /** PAIRED pre/post comparison: each unit is its own control — per
    * unit the mean outcome before and after the boundary, then one
    * t-style readout over the per-unit DIFFS. Between-unit variance
    * (the thing that drowns [[diffInDiff]]'s unpaired cells) cancels
    * entirely; this is the highest-power design when every unit is
    * observed on both sides. Units missing either side are excluded
    * (and counted).
    *
    * Per-unit means are fixed IEEE from exact sums; each diff is
    * quantized to integer MILLIS before the cross-unit sums (the q204
    * device — milli not micro: Σdq² must stay under 2⁶³), so mean/sd/t
    * are partition-order-free.
    *
    * @return one row: (n_pairs, n_pre_only, n_post_only,
    *         mean_diff, sd_diff, t) — t NULL when sd is 0 or pairs < 2
    */
  def pairedDiff(df: DataFrame, unitCol: String, post: Column,
      y: Column): DataFrame = {
    val per = df.select(col(unitCol), post.as("__p"), y.as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .groupBy(col(unitCol))
      .agg(sum(when(!col("__p"), col("__y")).otherwise(0L)).as("__s0"),
        sum(when(!col("__p"), 1L).otherwise(0L)).as("__n0"),
        sum(when(col("__p"), col("__y")).otherwise(0L)).as("__s1"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("__n1"))
    val d = (col("__s1").cast("double") / col("__n1")) -
      (col("__s0").cast("double") / col("__n0"))
    val q = per.withColumn("__dq",
      when(col("__n0") > 0 && col("__n1") > 0,
        (d * lit(1000.0)).cast("long")))
    val agg = q.agg(
      sum(when(col("__dq").isNotNull, 1L).otherwise(0L)).as("n_pairs"),
      sum(when(col("__n1") === 0 && col("__n0") > 0, 1L).otherwise(0L))
        .as("n_pre_only"),
      sum(when(col("__n0") === 0 && col("__n1") > 0, 1L).otherwise(0L))
        .as("n_post_only"),
      sum(col("__dq")).as("__sd1"),
      sum(col("__dq") * col("__dq")).as("__sd2"))
    val meanD = col("__sd1").cast("double") / col("n_pairs") /
      lit(1000.0)
    val sdD = Exact.stddevFromSums(col("__sd1"), col("__sd2"),
      col("n_pairs")) / lit(1000.0)
    agg
      .withColumn("mean_diff", when(col("n_pairs") > 0, meanD))
      .withColumn("sd_diff", when(col("n_pairs") > 1, sdD))
      .withColumn("t",
        when(col("n_pairs") > 1 && col("sd_diff") > 0,
          col("mean_diff") /
            (col("sd_diff") / sqrt(col("n_pairs").cast("double")))))
      .drop("__sd1", "__sd2")
  }


  /** MIX-SHIFT DECOMPOSITION (Oaxaca-style): a metric moved between
    * two periods — how much came from segments CHANGING their rates
    * vs the POPULATION shifting between segments? Exact identity:
    * `r_B − r_A = Σ_s (w_Bs − w_As)·r_As  [mix]
    *           + Σ_s w_Bs·(r_Bs − r_As)  [rate]`.
    * The "why did the number move" answer a bare before/after delta
    * never gives (a constant-rate world still moves if mix shifts).
    *
    * Per-segment terms are quantized to integer micros before any
    * cross-segment total (the q204 device — a handful of raw doubles
    * summed in engine-specific order would still diverge); rates and
    * weights themselves are fixed IEEE from exact counts.
    *
    * @param inPeriodB boolean period indicator
    * @param success   boolean outcome
    * @return per segment: (segment, n_a, pos_a, n_b, pos_b, mix_q,
    *         rate_q) — Σmix_q + Σrate_q ≈ 1e6·(r_B − r_A); segments
    *         empty in a period contribute their defined half only
    */
  def mixDecomposition(df: DataFrame, segmentCol: String,
      inPeriodB: Column, success: Column): DataFrame = {
    val seg = df.select(col(segmentCol), inPeriodB.as("__b"),
        success.cast("long").as("__y"))
      .filter(col("__b").isNotNull && col("__y").isNotNull)
      .groupBy(col(segmentCol))
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__b"), col("__y")).otherwise(0L)).as("pos_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__b"), col("__y")).otherwise(0L)).as("pos_b"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val t = seg
      .withColumn("__ta", sum(col("n_a")).over(wAll))
      .withColumn("__tb", sum(col("n_b")).over(wAll))
    val ra = when(col("n_a") > 0, col("pos_a").cast("double") / col("n_a"))
    val rb = when(col("n_b") > 0, col("pos_b").cast("double") / col("n_b"))
    val wa = col("n_a").cast("double") / col("__ta")
    val wb = col("n_b").cast("double") / col("__tb")
    t.withColumn("mix_q",
        floor((wb - wa) * ra * lit(1000000.0)).cast("long"))
      .withColumn("rate_q",
        floor(wb * (rb - ra) * lit(1000000.0)).cast("long"))
      .select(col(segmentCol), col("n_a"), col("pos_a"), col("n_b"),
        col("pos_b"), col("mix_q"), col("rate_q"))
  }

  /** DuckDB oracle for [[mixDecomposition]]: `innerSql` yields
    * (`segName`, b, y). */
  def mixDecompositionOracleSql(innerSql: String, segName: String)
      : String =
    s"""WITH seg AS (
       |  SELECT $segName,
       |    CAST(sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN NOT b THEN y ELSE 0 END) AS BIGINT)
       |      AS pos_a,
       |    CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN b THEN y ELSE 0 END) AS BIGINT) AS pos_b
       |  FROM ($innerSql) WHERE b IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), t AS (
       |  SELECT *, CAST(sum(n_a) OVER () AS BIGINT) AS ta,
       |         CAST(sum(n_b) OVER () AS BIGINT) AS tb
       |  FROM seg
       |)
       |SELECT $segName, n_a, pos_a, n_b, pos_b,
       |  CAST(floor((CAST(n_b AS DOUBLE) / tb
       |      - CAST(n_a AS DOUBLE) / ta)
       |    * (CASE WHEN n_a > 0
       |        THEN CAST(pos_a AS DOUBLE) / n_a END)
       |    * 1000000.0) AS BIGINT) AS mix_q,
       |  CAST(floor(CAST(n_b AS DOUBLE) / tb
       |    * ((CASE WHEN n_b > 0 THEN CAST(pos_b AS DOUBLE) / n_b END)
       |      - (CASE WHEN n_a > 0 THEN CAST(pos_a AS DOUBLE) / n_a END))
       |    * 1000000.0) AS BIGINT) AS rate_q
       |FROM t""".stripMargin

  /** EVENT STUDY — the dynamic version of [[diffInDiff]]: the
    * treated-vs-control gap per RELATIVE period, normalized to the
    * period−(−1) gap (the convention that makes pre-trends visible: if
    * the pre-period bars aren't flat at 0, parallel trends is broken
    * and the DiD number is fiction).
    *
    * Exact per-(period, arm) integer sums; gaps and the baseline
    * subtraction are fixed IEEE; the baseline row broadcasts back
    * (stat-broadcast idiom).
    *
    * @param relPeriod integer period RELATIVE to the intervention
    *                  (negative = before)
    * @return per period: (rel_period, n_t, n_c, mean_t, mean_c, gap,
    *         gap_vs_baseline) — baseline = the gap at rel_period −1;
    *         gap NULL when an arm is empty in a period
    */
  def eventStudy(df: DataFrame, treated: Column, relPeriod: Column,
      y: Column): DataFrame = {
    val per = df.select(treated.as("__t"), relPeriod.as("__w"),
        y.as("__y"))
      .filter(col("__t").isNotNull && col("__w").isNotNull &&
        col("__y").isNotNull)
      .groupBy(col("__w").as("rel_period"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("n_c"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("__st"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("__sc"))
    val gap = when(col("n_t") > 0 && col("n_c") > 0,
      col("__st").cast("double") / col("n_t") -
        col("__sc").cast("double") / col("n_c"))
    val withGap = per
      .withColumn("mean_t",
        when(col("n_t") > 0, col("__st").cast("double") / col("n_t")))
      .withColumn("mean_c",
        when(col("n_c") > 0, col("__sc").cast("double") / col("n_c")))
      .withColumn("gap", gap)
    // one-row aggregate, not a filter: a missing −1 period must yield
    // a NULL baseline row (matching the oracle's scalar subquery), not
    // an empty cross join that erases the whole output
    val baseline = withGap
      .agg(max(when(col("rel_period") === -1L, col("gap"))).as("__bgap"))
    withGap.crossJoin(broadcast(baseline))
      .withColumn("gap_vs_baseline", col("gap") - col("__bgap"))
      .select(col("rel_period"), col("n_t"), col("n_c"), col("mean_t"),
        col("mean_c"), col("gap"), col("gap_vs_baseline"))
  }

  /** DuckDB oracle for [[eventStudy]]: `innerSql` yields (t, w, y). */
  def eventStudyOracleSql(innerSql: String): String =
    s"""WITH per AS (
       |  SELECT w AS rel_period,
       |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |    CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS st,
       |    CAST(sum(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT) AS sc
       |  FROM ($innerSql)
       |  WHERE t IS NOT NULL AND w IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), g AS (
       |  SELECT *,
       |    CASE WHEN n_t > 0 THEN CAST(st AS DOUBLE) / n_t END AS mean_t,
       |    CASE WHEN n_c > 0 THEN CAST(sc AS DOUBLE) / n_c END AS mean_c,
       |    CASE WHEN n_t > 0 AND n_c > 0 THEN
       |      CAST(st AS DOUBLE) / n_t - CAST(sc AS DOUBLE) / n_c
       |    END AS gap
       |  FROM per
       |)
       |SELECT rel_period, n_t, n_c, mean_t, mean_c, gap,
       |       gap - (SELECT gap FROM g WHERE rel_period = -1)
       |         AS gap_vs_baseline
       |FROM g""".stripMargin

  /** DuckDB oracle for [[pairedDiff]]: `innerSql` yields (u, p, y). */
  def pairedDiffOracleSql(innerSql: String): String =
    s"""WITH per AS (
       |  SELECT u,
       |    CAST(sum(CASE WHEN NOT p THEN y ELSE 0 END) AS BIGINT) AS s0,
       |    CAST(sum(CASE WHEN NOT p THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN p THEN y ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n1
       |  FROM ($innerSql) WHERE p IS NOT NULL AND y IS NOT NULL
       |  GROUP BY 1
       |), q AS (
       |  SELECT *,
       |    CASE WHEN n0 > 0 AND n1 > 0 THEN
       |      CAST(trunc((CAST(s1 AS DOUBLE) / n1
       |        - CAST(s0 AS DOUBLE) / n0) * 1000.0) AS BIGINT)
       |    END AS dq
       |  FROM per
       |), a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN dq IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN n1 = 0 AND n0 > 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_pre_only,
       |    CAST(sum(CASE WHEN n0 = 0 AND n1 > 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_post_only,
       |    CAST(sum(dq) AS BIGINT) AS sd1,
       |    CAST(sum(dq * dq) AS BIGINT) AS sd2
       |  FROM q
       |), r AS (
       |  SELECT n_pairs, n_pre_only, n_post_only,
       |    CASE WHEN n_pairs > 0 THEN
       |      CAST(sd1 AS DOUBLE) / n_pairs / 1000.0 END AS mean_diff,
       |    CASE WHEN n_pairs > 1 THEN
       |      sqrt((CAST(sd2 AS DOUBLE)
       |        - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE) / n_pairs)
       |        / (n_pairs - 1)) / 1000.0 END AS sd_diff
       |  FROM a
       |)
       |SELECT *,
       |  CASE WHEN n_pairs > 1 AND sd_diff > 0 THEN
       |    mean_diff / (sd_diff / sqrt(CAST(n_pairs AS DOUBLE)))
       |  END AS t
       |FROM r""".stripMargin

  /** CUPED variance reduction (Deng et al. 2013): adjust the experiment
    * metric by its pre-experiment covariate,
    * `y' = y − θ·(x_pre − x̄_pre)` with `θ = cov(x,y)/var(x)`, then
    * compare arm means of y' — same expectation as the raw diff, often
    * 30-60 % less variance, i.e. the same experiment decides in half
    * the traffic. The modern default in front of [[proportionTest]]'s
    * style of readout.
    *
    * Determinism: θ and x̄ are fixed IEEE readouts of exact integer
    * sums (one-row broadcast, never a collect); each row's adjusted
    * value is quantized to integer CENTI-units (`⌊y'·100⌋`) before any
    * cross-row sum, so arm means and variances are partition-order-free
    * (the q204 trunc device). Overflow ledger: Σ(y'·100)² needs
    * rows·(100·|y|)² < 2⁶³ — at cents ≤ 10⁶ that allows ~10⁶ rows per
    * call; quantize coarser beyond.
    *
    * @param armB boolean treatment indicator
    * @param y    exact integer metric ([[Exact.cents]])
    * @param xPre exact integer pre-period covariate
    * @return one row: (n_a, n_b, theta, diff_raw, diff_cuped,
    *         var_y, var_adj, var_reduction)
    */
  def cuped(df: DataFrame, armB: Column, y: Column,
      xPre: Column): DataFrame = {
    val base = df.select(armB.as("__b"), y.as("__y"), xPre.as("__x"))
      .filter(col("__b").isNotNull && col("__y").isNotNull &&
        col("__x").isNotNull)
    val g = base.agg(count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__x") * col("__y")).as("sxy"))
      .withColumn("theta",
        (col("sxy").cast("double") -
          col("sx").cast("double") * col("sy") / col("n")) /
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx") / col("n")))
      .withColumn("xmean", col("sx").cast("double") / col("n"))
    val adj = base.crossJoin(broadcast(g.select(col("theta"),
        col("xmean"))))
      .withColumn("adj_q",
        floor((col("__y") - col("theta") * (col("__x") - col("xmean"))) *
          lit(100.0)).cast("long"))
      .withColumn("y_q", col("__y") * 100L)
    val arms = adj.agg(
      sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
      sum(when(!col("__b"), col("__y")).otherwise(0L)).as("sya"),
      sum(when(col("__b"), col("__y")).otherwise(0L)).as("syb"),
      sum(when(!col("__b"), col("adj_q")).otherwise(0L)).as("saa"),
      sum(when(col("__b"), col("adj_q")).otherwise(0L)).as("sab"),
      sum(col("y_q")).as("sq"), sum(col("y_q") * col("y_q")).as("sq2"),
      sum(col("adj_q")).as("aq"),
      sum(col("adj_q") * col("adj_q")).as("aq2"),
      count(lit(1)).as("n"))
    val varY = col("sq2").cast("double") / col("n") -
      (col("sq").cast("double") / col("n")) *
        (col("sq").cast("double") / col("n"))
    val varA = col("aq2").cast("double") / col("n") -
      (col("aq").cast("double") / col("n")) *
        (col("aq").cast("double") / col("n"))
    arms.crossJoin(broadcast(g.select(col("theta"))))
      .select(col("n_a"), col("n_b"), col("theta"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("syb").cast("double") / col("n_b") -
            col("sya").cast("double") / col("n_a")).as("diff_raw"),
        when(col("n_a") > 0 && col("n_b") > 0,
          (col("sab").cast("double") / col("n_b") -
            col("saa").cast("double") / col("n_a")) / 100.0)
          .as("diff_cuped"),
        varY.as("var_y"), varA.as("var_adj"),
        when(varY > 0, varA / varY).as("var_reduction"))
  }

  /** DuckDB oracle for [[cuped]]: `innerSql` yields (b, y, x). */
  def cupedOracleSql(innerSql: String): String =
    s"""WITH b0 AS (
       |  SELECT b, y, x FROM ($innerSql)
       |  WHERE b IS NOT NULL AND y IS NOT NULL AND x IS NOT NULL
       |), g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x * x) AS BIGINT) AS sxx,
       |         CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM b0
       |), th AS (
       |  SELECT n,
       |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
       |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
       |      AS theta,
       |    CAST(sx AS DOUBLE) / n AS xmean
       |  FROM g
       |), adj AS (
       |  SELECT b0.b, b0.y,
       |         CAST(floor((b0.y - th.theta * (b0.x - th.xmean)) * 100.0)
       |           AS BIGINT) AS adj_q,
       |         b0.y * 100 AS y_q, th.theta
       |  FROM b0 CROSS JOIN th
       |), arms AS (
       |  SELECT
       |    CAST(sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN NOT b THEN y ELSE 0 END) AS BIGINT) AS sya,
       |    CAST(sum(CASE WHEN b THEN y ELSE 0 END) AS BIGINT) AS syb,
       |    CAST(sum(CASE WHEN NOT b THEN adj_q ELSE 0 END) AS BIGINT)
       |      AS saa,
       |    CAST(sum(CASE WHEN b THEN adj_q ELSE 0 END) AS BIGINT) AS sab,
       |    CAST(sum(y_q) AS BIGINT) AS sq,
       |    CAST(sum(y_q * y_q) AS BIGINT) AS sq2,
       |    CAST(sum(adj_q) AS BIGINT) AS aq,
       |    CAST(sum(adj_q * adj_q) AS BIGINT) AS aq2,
       |    CAST(count(*) AS BIGINT) AS n,
       |    max(theta) AS theta
       |  FROM adj
       |)
       |SELECT n_a, n_b, theta,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    CAST(syb AS DOUBLE) / n_b - CAST(sya AS DOUBLE) / n_a
       |  END AS diff_raw,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    (CAST(sab AS DOUBLE) / n_b - CAST(saa AS DOUBLE) / n_a) / 100.0
       |  END AS diff_cuped,
       |  CAST(sq2 AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n)
       |    * (CAST(sq AS DOUBLE) / n) AS var_y,
       |  CAST(aq2 AS DOUBLE) / n - (CAST(aq AS DOUBLE) / n)
       |    * (CAST(aq AS DOUBLE) / n) AS var_adj,
       |  CASE WHEN CAST(sq2 AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n)
       |    * (CAST(sq AS DOUBLE) / n) > 0 THEN
       |    (CAST(aq2 AS DOUBLE) / n - (CAST(aq AS DOUBLE) / n)
       |      * (CAST(aq AS DOUBLE) / n))
       |    / (CAST(sq2 AS DOUBLE) / n - (CAST(sq AS DOUBLE) / n)
       |      * (CAST(sq AS DOUBLE) / n))
       |  END AS var_reduction
       |FROM arms""".stripMargin

  /** Difference-in-differences: the causal-effect estimate when
    * treatment was NOT randomized but a before/after boundary exists —
    * (treated post − treated pre) − (control post − control pre), the
    * parallel-trends workhorse [[proportionTest]] (which assumes
    * randomized arms) cannot replace.
    *
    * One pass, four conditional (Σy, n) cells in exact integers; each
    * cell mean is one fixed IEEE division and the estimate is three
    * fixed subtractions — bit-portable. NULL when any cell is empty
    * (the design is broken, not zero).
    *
    * @param treated boolean per-row treatment-group indicator
    * @param post    boolean per-row after-boundary indicator
    * @param y       exact integer outcome ([[Exact.cents]])
    * @return one row: (n_t0, n_t1, n_c0, n_c1, mean_t0, mean_t1,
    *         mean_c0, mean_c1, did)
    */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
      y: Column): DataFrame = {
    val cells = df
      .select(treated.as("__t"), post.as("__p"), y.as("__y"))
      .filter(col("__t").isNotNull && col("__p").isNotNull &&
        col("__y").isNotNull)
      .agg(
        sum(when(col("__t") && !col("__p"), 1L).otherwise(0L)).as("n_t0"),
        sum(when(col("__t") && col("__p"), 1L).otherwise(0L)).as("n_t1"),
        sum(when(!col("__t") && !col("__p"), 1L).otherwise(0L)).as("n_c0"),
        sum(when(!col("__t") && col("__p"), 1L).otherwise(0L)).as("n_c1"),
        sum(when(col("__t") && !col("__p"), col("__y")).otherwise(0L))
          .as("__st0"),
        sum(when(col("__t") && col("__p"), col("__y")).otherwise(0L))
          .as("__st1"),
        sum(when(!col("__t") && !col("__p"), col("__y")).otherwise(0L))
          .as("__sc0"),
        sum(when(!col("__t") && col("__p"), col("__y")).otherwise(0L))
          .as("__sc1"))
    def mean(s: String, n: String) =
      when(col(n) > 0, col(s).cast("double") / col(n))
    cells
      .withColumn("mean_t0", mean("__st0", "n_t0"))
      .withColumn("mean_t1", mean("__st1", "n_t1"))
      .withColumn("mean_c0", mean("__sc0", "n_c0"))
      .withColumn("mean_c1", mean("__sc1", "n_c1"))
      .withColumn("did",
        (col("mean_t1") - col("mean_t0")) -
          (col("mean_c1") - col("mean_c0")))
      .drop("__st0", "__st1", "__sc0", "__sc1")
  }

  /** DuckDB oracle for [[diffInDiff]]: `innerSql` yields (t, p, y). */
  def diffInDiffOracleSql(innerSql: String): String =
    s"""WITH b AS (
       |  SELECT t, p, y FROM ($innerSql)
       |  WHERE t IS NOT NULL AND p IS NOT NULL AND y IS NOT NULL
       |), g AS (
       |  SELECT
       |    CAST(sum(CASE WHEN t AND NOT p THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_t0,
       |    CAST(sum(CASE WHEN t AND p THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_t1,
       |    CAST(sum(CASE WHEN NOT t AND NOT p THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c0,
       |    CAST(sum(CASE WHEN NOT t AND p THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c1,
       |    CAST(sum(CASE WHEN t AND NOT p THEN y ELSE 0 END) AS BIGINT)
       |      AS st0,
       |    CAST(sum(CASE WHEN t AND p THEN y ELSE 0 END) AS BIGINT) AS st1,
       |    CAST(sum(CASE WHEN NOT t AND NOT p THEN y ELSE 0 END) AS BIGINT)
       |      AS sc0,
       |    CAST(sum(CASE WHEN NOT t AND p THEN y ELSE 0 END) AS BIGINT)
       |      AS sc1
       |  FROM b
       |), mm AS (
       |  SELECT n_t0, n_t1, n_c0, n_c1,
       |    CASE WHEN n_t0 > 0 THEN CAST(st0 AS DOUBLE) / n_t0 END AS mean_t0,
       |    CASE WHEN n_t1 > 0 THEN CAST(st1 AS DOUBLE) / n_t1 END AS mean_t1,
       |    CASE WHEN n_c0 > 0 THEN CAST(sc0 AS DOUBLE) / n_c0 END AS mean_c0,
       |    CASE WHEN n_c1 > 0 THEN CAST(sc1 AS DOUBLE) / n_c1 END AS mean_c1
       |  FROM g
       |)
       |SELECT *, (mean_t1 - mean_t0) - (mean_c1 - mean_c0) AS did
       |FROM mm""".stripMargin


  /** Coarsened Exact Matching ATT (Iacus, King & Porro 2012) — the
    * observational-causal estimator the randomized family ([[abZTest]],
    * [[cuped]]) and the parallel-trends one ([[diffInDiff]]) both
    * leave open: coarsen the covariates to bins, keep only cells where
    * BOTH arms appear, weight controls to the treated cell
    * composition, and difference the outcomes — confounding by the
    * binned covariates is removed EXACTLY (not modeled), which is
    * CEM's whole pitch, and the method is one aggregation, fully
    * data-parallel where nearest-neighbor propensity matching is
    * inherently sequential.
    *
    * `ATT = (Σ_cells Σy_t·10⁶ − Σ_cells n_t·cm_q) div Σ n_t` with
    * `cm_q = Σy_c·10⁶ div n_c` the cell's control mean in micros —
    * exact integers with one documented truncation per cell.
    *
    * @param covCols coarsened covariate columns (the caller bins)
    * @return one row: (n_cells, n_cells_matched, n_t, n_t_matched,
    *         n_c_matched, att_micro) — att NULL when nothing matches */
  def cemAtt(df: DataFrame, covCols: Seq[String], treat: Column,
      y: Column): DataFrame = {
    require(covCols.nonEmpty)
    val cells = df
      .select(covCols.map(col) :+ treat.cast("boolean").as("__t") :+
        y.cast("long").as("__y"): _*)
      .filter(col("__t").isNotNull && col("__y").isNotNull)
      .groupBy(covCols.map(col): _*)
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__nt"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__t"), col("__y")).otherwise(0L)).as("__syt"),
        sum(when(!col("__t"), col("__y")).otherwise(0L)).as("__syc"))
    val matched = col("__nt") > 0 && col("__nc") > 0
    cells
      .select(col("__nt"), col("__nc"), col("__syt"),
        matched.as("__m"),
        when(matched, expr("__syc * 1000000 div __nc")).as("__cmq"))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("__m"), 1L).otherwise(0L)).as("n_cells_matched"),
        sum(col("__nt")).as("n_t"),
        sum(when(col("__m"), col("__nt")).otherwise(0L)).as("n_t_matched"),
        sum(when(col("__m"), col("__nc")).otherwise(0L)).as("n_c_matched"),
        sum(when(col("__m"), col("__syt") * 1000000L -
          col("__nt") * col("__cmq")).otherwise(0L)).as("__num"))
      .withColumn("att_micro",
        when(col("n_t_matched") > 0,
          expr("__num div n_t_matched")))
      .drop("__num")
  }

  /** DuckDB oracle for [[cemAtt]]: `innerSql` yields
    * (c1..ck, t, y) with `covNames` the coarsened columns. */
  def cemAttOracleSql(innerSql: String, covNames: Seq[String]): String = {
    val covs = covNames.mkString(", ")
    s"""WITH cells AS (
       |  SELECT $covs,
       |         CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |         CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS nc,
       |         CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) AS syt,
       |         CAST(sum(CASE WHEN t THEN 0 ELSE y END) AS BIGINT) AS syc
       |  FROM ($innerSql) WHERE t IS NOT NULL AND y IS NOT NULL
       |  GROUP BY $covs
       |), w AS (
       |  SELECT nt, nc, syt, nt > 0 AND nc > 0 AS m,
       |         CASE WHEN nt > 0 AND nc > 0
       |              THEN syc * 1000000 // nc END AS cmq
       |  FROM cells
       |), agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |         CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_cells_matched,
       |         CAST(sum(nt) AS BIGINT) AS n_t,
       |         CAST(sum(CASE WHEN m THEN nt ELSE 0 END) AS BIGINT)
       |           AS n_t_matched,
       |         CAST(sum(CASE WHEN m THEN nc ELSE 0 END) AS BIGINT)
       |           AS n_c_matched,
       |         CAST(sum(CASE WHEN m THEN syt * 1000000 - nt * cmq
       |                       ELSE 0 END) AS BIGINT) AS num
       |  FROM w
       |)
       |SELECT n_cells, n_cells_matched, n_t, n_t_matched, n_c_matched,
       |       CASE WHEN n_t_matched > 0
       |            THEN CAST(num // n_t_matched AS BIGINT)
       |            END AS att_micro
       |FROM agg""".stripMargin
  }

}
