package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample proportion z-test per metric group — the A/B readout:
  * is arm B's conversion rate different from arm A's, beyond what the
  * sample sizes explain? The pooled-proportion z statistic
  * `(p̂_b − p̂_a) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))` with a two-sided 5%
  * verdict.
  *
  * Exactness: per-arm trial/conversion counts are integers from ONE
  * map-side-combinable aggregation (conditional sums — no per-arm
  * scans); every rate and the z derive in one fixed IEEE sequence.
  * Degenerate cells (an empty arm, or a pooled rate of 0/1 — no
  * variance) yield NULL z: no verdict beats a fabricated one.
  *
  * Scale shape: one aggregation keyed by the metric group; arm
  * assignment is a per-row expression (typically a hash of the unit id
  * — deterministic, balanced, and reproducible, exactly how real
  * experiment frameworks bucket).
  */
object ABTest {

  /** @param armB   boolean per-row arm indicator (false = A/control)
    * @param convert boolean per-row success indicator
    * @return (groupCols..., n_a, conv_a, n_b, conv_b, rate_a, rate_b,
    *         z, significant)
    */
  def proportionTest(df: DataFrame, groupCols: Seq[String], armB: Column,
      convert: Column): DataFrame = {
    val agg = df
      .withColumn("__b", armB)
      .withColumn("__c", convert)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__b") && col("__c"), 1L).otherwise(0L)).as("conv_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__b") && col("__c"), 1L).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    agg
      .withColumn("rate_a", when(col("n_a") > 0, pa))
      .withColumn("rate_b", when(col("n_b") > 0, pb))
      .withColumn("z",
        when(col("n_a") > 0 && col("n_b") > 0 &&
          col("conv_a") + col("conv_b") > 0 &&
          col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
          (pb - pa) / se))
      .withColumn("significant",
        when(col("z").isNotNull, abs(col("z")) > 1.96))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) with the tie-corrected normal
    * approximation and the rank-biserial effect size — the
    * NON-PARAMETRIC two-arm comparison next to [[proportionTest]]
    * (binary) and [[cuped]] (means): heavy-tailed metrics (revenue,
    * latency) break t-style tests, ranks don't care.
    *
    * SCALE SHAPE — ranks come from the VALUE HISTOGRAM, never a
    * row-level sort: one map-side-combined groupBy(value), one ordered
    * window over the DISTINCT-value frame (value-cardinality-bounded,
    * the q40/q84 quantile device), one final aggregation. Every item at
    * value v has average rank (2·C(v) + t(v) + 1)/2 where C = items
    * strictly below, t = tie size — carried DOUBLED so all rank sums
    * are exact integers; tie cubes and the doubled rank sum accumulate
    * in DECIMAL(38,0) (order-independent), with one fixed IEEE sequence
    * at the end. r_rb and z are derived from the DECIMAL 2·U₁ directly,
    * so they stay correct at any scale; only the u1_dbl OUTPUT column
    * narrows to long, under an explicit contract (the CUPED-style
    * overflow ledger): 2·U₁ ≤ 2·n₁·n₂ < 2⁶³, i.e. **n₁·n₂ < 2⁶²** —
    * beyond it Spark's non-ANSI cast nulls while DuckDB's CAST errors,
    * so the contract is the honest boundary, not a silent divergence in
    * the derived statistics.
    *
    * U₁ = R₁ − n₁(n₁+1)/2 (arm-B side); rank-biserial
    * r = 1 − 2U₁/(n₁n₂) ∈ [−1, 1]; z = (U₁ − n₁n₂/2)/σ with
    * σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1))) (no continuity
    * correction — documented choice, same on both engines).
    *
    * @return one row: (n1, n2, u1_dbl = 2·U₁ exact, r_rb, z) — z NULL
    *         when an arm is empty or every value ties (σ = 0) */
  def mannWhitney(df: DataFrame, armB: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val W = org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val hist = df
      .select(armB.as("__b"), value.cast("long").as("__v"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__tb"))
    val ranked = hist.withColumn("__c",
      coalesce(sum(col("__t")).over(W.orderBy(col("__v"))
        .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
    val agg = ranked.agg(
      sum(col("__tb")).as("n1"),
      sum(col("__t") - col("__tb")).as("n2"),
      // cast BEFORE multiplying: the per-value products, not just their
      // sum, can pass 2^63 (a 3e9-row tie cubes to 2.7e28)
      sum(col("__tb").cast(dec) *
        (lit(2) * col("__c") + col("__t") + 1).cast(dec)).as("__r1_dbl"),
      sum(col("__t").cast(dec) * col("__t").cast(dec) *
        col("__t").cast(dec) - col("__t").cast(dec)).as("__ties"))
    val n = col("n1") + col("n2")
    // r_rb/z derive from the DECIMAL 2·U₁ (exact at any scale); only the
    // output column narrows to long under the documented n1·n2 < 2⁶²
    // contract — see scaladoc.
    val u1 = col("__u1d").cast("double") / lit(2.0)
    val mu = col("n1").cast("double") * col("n2").cast("double") / lit(2.0)
    val variance = col("n1").cast("double") * col("n2").cast("double") /
      lit(12.0) * ((n + 1).cast("double") -
        col("__ties").cast("double") /
          (n.cast("double") * (n - 1).cast("double")))
    agg
      .withColumn("__u1d", col("__r1_dbl") - (col("n1").cast(dec) *
        (col("n1") + 1).cast(dec)))
      .withColumn("u1_dbl", col("__u1d").cast("long"))
      .withColumn("r_rb",
        when(col("n1") > 0 && col("n2") > 0,
          lit(1.0) - col("__u1d").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double"))))
      .withColumn("z",
        when(col("n1") > 0 && col("n2") > 0 && n > 1 && variance > 0,
          (u1 - mu) / sqrt(variance)))
      .select(col("n1"), col("n2"), col("u1_dbl"), col("r_rb"), col("z"))
  }

  /** Cochran–Mantel–Haenszel test: the STRATIFIED two-arm comparison —
    * does the arm shift the outcome rate once a confounding stratum
    * (geography, device, event type) is held fixed? [[proportionTest]]
    * pools and Simpson's paradox can flip it; CMH asks the question
    * within every stratum and pools the EVIDENCE, not the rows:
    * z = (Σₖ aₖ − Σₖ Eₖ)/√(Σₖ Vₖ) with the classic hypergeometric
    * Eₖ = n1ₖm1ₖ/Tₖ and Vₖ = n1ₖn2ₖm1ₖ(Tₖ−m1ₖ)/(Tₖ²(Tₖ−1)).
    *
    * DETERMINISM: Eₖ/Vₖ are doubles whose cross-strata sum would be
    * partition-order-dependent under a plain agg — so the bounded
    * strata frame collects into ONE sorted array and folds in stratum
    * order (a per-row codegen'd `aggregate`, not a driver loop): both
    * engines add the same IEEE values in the same order. Strata are a
    * stated catalog (the markov-channel contract) — corpus scale grows
    * cell COUNTS, never the array.
    *
    * @return one row: (n_strata, sum_a, e_sum, v_sum, z) — z NULL when
    *         ΣV = 0 (every stratum degenerate); strata with T ≤ 1 or
    *         an empty margin contribute zero evidence */
  def cmhTest(df: DataFrame, strataCol: String, armB: Column,
      outcome: Column): DataFrame = {
    val cells = df
      .select(col(strataCol).as("__s"), armB.as("__b"), outcome.as("__o"))
      .groupBy(col("__s"))
      .agg(sum(when(col("__b") && col("__o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("__b"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("__o"), 1L).otherwise(0L)).as("m1"),
        count(lit(1)).as("t"))
    val e = when(col("t") > 1,
      col("n1").cast("double") * col("m1").cast("double") /
        col("t").cast("double")).otherwise(lit(0.0))
    val v = when(col("t") > 1,
      col("n1").cast("double") * col("n2").cast("double") *
        col("m1").cast("double") * (col("t") - col("m1")).cast("double") /
        (col("t").cast("double") * col("t").cast("double") *
          (col("t") - 1).cast("double"))).otherwise(lit(0.0))
    val terms = cells.select(struct(col("__s"),
      when(col("t") > 1, col("a")).otherwise(lit(0L)).as("a"),
      e.as("e"), v.as("v")).as("__term"))
    terms
      .agg(array_sort(collect_list(col("__term"))).as("__arr"))
      .select(size(col("__arr")).cast("long").as("n_strata"),
        aggregate(col("__arr"), lit(0L),
          (acc, x) => acc + x.getField("a")).as("sum_a"),
        aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("e")).as("e_sum"),
        aggregate(col("__arr"), lit(0.0),
          (acc, x) => acc + x.getField("v")).as("v_sum"))
      .withColumn("z",
        when(col("v_sum") > 0,
          (col("sum_a").cast("double") - col("e_sum")) /
            sqrt(col("v_sum"))))
  }

  /** DuckDB oracle for [[cmhTest]]: identical cells, identical sorted
    * fold (list_sort + list_reduce over same-shape structs — both
    * engines add the same IEEE values in the same order). `innerSql`
    * yields (s, b BOOLEAN, o BOOLEAN). */
  def cmhOracleSql(innerSql: String): String =
    s"""WITH src AS ($innerSql), cells AS (
       |  SELECT s,
       |         CAST(sum(CASE WHEN b AND o THEN 1 ELSE 0 END) AS BIGINT)
       |           AS a,
       |         CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |         CAST(sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n2,
       |         CAST(sum(CASE WHEN o THEN 1 ELSE 0 END) AS BIGINT) AS m1,
       |         CAST(count(*) AS BIGINT) AS t
       |  FROM src GROUP BY 1
       |), terms AS (
       |  SELECT s,
       |         CASE WHEN t > 1 THEN a ELSE 0 END AS a,
       |         CASE WHEN t > 1 THEN
       |           CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE)
       |             / CAST(t AS DOUBLE) ELSE 0.0 END AS e,
       |         CASE WHEN t > 1 THEN
       |           CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
       |             * CAST(m1 AS DOUBLE) * CAST(t - m1 AS DOUBLE)
       |             / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
       |                * CAST(t - 1 AS DOUBLE)) ELSE 0.0 END AS v
       |  FROM cells
       |), arr AS (
       |  SELECT list_sort(list(struct_pack(s := s, a := CAST(a AS DOUBLE),
       |           e := e, v := v))) AS terms_arr,
       |         CAST(count(*) AS BIGINT) AS n_strata
       |  FROM terms
       |), folded AS (
       |  SELECT n_strata,
       |         list_reduce(terms_arr, (x, y) -> struct_pack(
       |           s := x.s, a := x.a + y.a, e := x.e + y.e,
       |           v := x.v + y.v)) AS f
       |  FROM arr
       |)
       |SELECT n_strata, CAST(f.a AS BIGINT) AS sum_a, f.e AS e_sum,
       |       f.v AS v_sum,
       |       CASE WHEN f.v > 0 THEN (f.a - f.e) / sqrt(f.v) END AS z
       |FROM folded""".stripMargin

  /** DuckDB oracle for [[mannWhitney]]: the same histogram ranks with
    * HUGEINT accumulators and the identical IEEE tail. `innerSql`
    * yields (b BOOLEAN, v BIGINT). */
  def mannWhitneyOracleSql(innerSql: String): String =
    s"""WITH src AS ($innerSql), h AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS t,
       |         CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS tb
       |  FROM src GROUP BY 1
       |), r AS (
       |  SELECT t, tb,
       |         CAST(coalesce(sum(t) OVER (ORDER BY v
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS c
       |  FROM h
       |), a AS (
       |  SELECT CAST(sum(tb) AS BIGINT) AS n1,
       |         CAST(sum(t - tb) AS BIGINT) AS n2,
       |         sum(CAST(tb AS HUGEINT)
       |             * CAST(2 * c + t + 1 AS HUGEINT)) AS r1_dbl,
       |         sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
       |             * CAST(t AS HUGEINT) - CAST(t AS HUGEINT)) AS ties
       |  FROM r
       |), u AS (
       |  SELECT n1, n2,
       |         CAST(r1_dbl - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT)
       |           AS u1_dbl,
       |         CAST(r1_dbl - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE)
       |           AS u1d_d,
       |         CAST(ties AS DOUBLE) AS tiesd
       |  FROM a
       |)
       |SELECT n1, n2, u1_dbl,
       |       CASE WHEN n1 > 0 AND n2 > 0 THEN
       |         1.0 - u1d_d
       |           / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END AS r_rb,
       |       CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1
       |              AND CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
       |                * (CAST(n1 + n2 + 1 AS DOUBLE) - tiesd
       |                   / (CAST(n1 + n2 AS DOUBLE)
       |                      * CAST(n1 + n2 - 1 AS DOUBLE))) > 0
       |       THEN (u1d_d / 2.0
       |             - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
       |            / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
       |                * (CAST(n1 + n2 + 1 AS DOUBLE) - tiesd
       |                   / (CAST(n1 + n2 AS DOUBLE)
       |                      * CAST(n1 + n2 - 1 AS DOUBLE))))
       |       END AS z
       |FROM u""".stripMargin

  /** RATIO-METRIC test with DELTA-METHOD variance — the correct
    * inference for per-user ratio metrics (clicks per session, revenue
    * per order): the naive per-user-mean test answers a different
    * question and the naive SE on Σx/Σy ignores that users, not rows,
    * are the randomization unit. Per arm, from exact per-user (x, y)
    * integer moments:
    * `var(x̂/ŷ) ≈ (σ²_x − 2r·σ_xy + r²·σ²_y) / (n·ȳ²)`,
    * then the two-arm z. All sums exact longs; readout fixed IEEE.
    *
    * @param x per-row numerator contribution (integer)
    * @param y per-row denominator contribution (integer)
    * @return one row: (n_a, ratio_a, n_b, ratio_b, diff, se, z,
    *         significant)
    */
  def ratioMetricTest(df: DataFrame, unitCol: String, armB: Column,
      x: Column, y: Column): DataFrame = {
    val per = df.select(col(unitCol).as("__u"), armB.as("__b"),
        x.as("__x"), y.as("__y"))
      .filter(col("__b").isNotNull)
      .groupBy(col("__u"), col("__b"))
      .agg(sum(col("__x")).as("ux"), sum(col("__y")).as("uy"))
    val arms = per.groupBy(col("__b"))
      .agg(count(lit(1)).as("n"),
        sum(col("ux")).as("sx"), sum(col("uy")).as("sy"),
        sum(col("ux") * col("ux")).as("sxx"),
        sum(col("uy") * col("uy")).as("syy"),
        sum(col("ux") * col("uy")).as("sxy"))
    def ratio = col("sx").cast("double") / col("sy")
    def ybar = col("sy").cast("double") / col("n")
    def varX = (col("sxx").cast("double") -
      col("sx").cast("double") * col("sx") / col("n")) / (col("n") - 1)
    def varY = (col("syy").cast("double") -
      col("sy").cast("double") * col("sy") / col("n")) / (col("n") - 1)
    def covXY = (col("sxy").cast("double") -
      col("sx").cast("double") * col("sy") / col("n")) / (col("n") - 1)
    val withStats = arms
      .withColumn("ratio", when(col("sy") > 0, ratio))
      .withColumn("var_ratio",
        when(col("sy") > 0 && col("n") > 1,
          (varX - lit(2.0) * ratio * covXY + ratio * ratio * varY) /
            (col("n") * ybar * ybar)))
    // one-row GLOBAL aggregate per arm (each arm frame has ≤ 1 row, so
    // max = identity): a degenerate arm with zero users still yields a
    // row — n 0, NULL ratio/z — matching proportionTest's NULL
    // convention and the oracle's always-one-row global aggregate,
    // instead of an empty cross-join silently swallowing the readout
    val a = withStats.filter(!col("__b"))
      .agg(coalesce(max(col("n")), lit(0L)).as("n_a"),
        max(col("ratio")).as("ratio_a"),
        max(col("var_ratio")).as("__va"))
    val b = withStats.filter(col("__b"))
      .agg(coalesce(max(col("n")), lit(0L)).as("n_b"),
        max(col("ratio")).as("ratio_b"),
        max(col("var_ratio")).as("__vb"))
    a.crossJoin(broadcast(b))
      .withColumn("diff", col("ratio_b") - col("ratio_a"))
      .withColumn("se", sqrt(col("__va") + col("__vb")))
      .withColumn("z",
        when(col("se") > 0, col("diff") / col("se")))
      .withColumn("significant",
        when(col("z").isNotNull, abs(col("z")) > 1.96))
      .drop("__va", "__vb")
  }

  /** DuckDB oracle for [[ratioMetricTest]]: `innerSql` yields
    * (u, b, x, y). */
  def ratioMetricOracleSql(innerSql: String): String = {
    def stats(flag: String) =
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(ux) AS BIGINT) AS sx,
         |       CAST(sum(uy) AS BIGINT) AS sy,
         |       CAST(sum(ux * ux) AS BIGINT) AS sxx,
         |       CAST(sum(uy * uy) AS BIGINT) AS syy,
         |       CAST(sum(ux * uy) AS BIGINT) AS sxy
         |FROM per WHERE $flag""".stripMargin
    val r = "CAST(sx AS DOUBLE) / sy"
    val yb = "CAST(sy AS DOUBLE) / n"
    val vx = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1)"
    val vy = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1)"
    val cxy = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1)"
    val varR = s"CASE WHEN sy > 0 AND n > 1 THEN " +
      s"(($vx) - 2.0 * ($r) * ($cxy) + ($r) * ($r) * ($vy)) " +
      s"/ (n * ($yb) * ($yb)) END"
    s"""WITH per AS (
       |  SELECT u, b, CAST(sum(x) AS BIGINT) AS ux,
       |         CAST(sum(y) AS BIGINT) AS uy
       |  FROM ($innerSql) WHERE b IS NOT NULL GROUP BY 1, 2
       |), sa AS (
       |  SELECT n, CASE WHEN sy > 0 THEN $r END AS ratio_a,
       |         $varR AS va
       |  FROM (${stats("NOT b")})
       |), sb AS (
       |  SELECT n, CASE WHEN sy > 0 THEN $r END AS ratio_b,
       |         $varR AS vb
       |  FROM (${stats("b")})
       |)
       |SELECT sa.n AS n_a, ratio_a, sb.n AS n_b, ratio_b,
       |       ratio_b - ratio_a AS diff,
       |       sqrt(va + vb) AS se,
       |       CASE WHEN sqrt(va + vb) > 0 THEN
       |         (ratio_b - ratio_a) / sqrt(va + vb) END AS z,
       |       CASE WHEN sqrt(va + vb) > 0 THEN
       |         abs((ratio_b - ratio_a) / sqrt(va + vb)) > 1.96
       |       END AS significant
       |FROM sa CROSS JOIN sb""".stripMargin
  }

  /** POWER ANALYSIS — required sample size per arm to detect a
    * relative MDE on the observed base rate at α = 0.05 (two-sided) and
    * 80 % power: `n = 2·(z_α + z_β)²·p(1−p)/δ²` with δ = p·mde. The
    * "how long must this experiment run" answer computed FROM the
    * live base rates — the planning step in front of
    * [[proportionTest]]. z constants are literals on both engines.
    *
    * @param mdeRelMicro relative MDE in micros (1e5 = 10 %)
    * @return per group: (grpCol, n_obs, pos, p, n_required_per_arm) —
    *         NULL when the observed rate is 0 or 1 (no variance to
    *         power against)
    */
  def requiredSampleSize(df: DataFrame, grpCol: String,
      success: Column, mdeRelMicro: Long = 100000L): DataFrame = {
    require(mdeRelMicro >= 1)
    val g = df.select(col(grpCol), success.cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_obs"), sum(col("__y")).as("pos"))
    val p = col("pos").cast("double") / col("n_obs")
    val delta = p * lit(mdeRelMicro.toDouble / 1e6)
    // (1.959964 + 0.841621)² — the α=.05 two-sided + 80% power pair
    val zSum2 = lit(7.848886)
    g.withColumn("p", p)
      .withColumn("n_required_per_arm",
        when(col("pos") > 0 && col("pos") < col("n_obs"),
          ceil(lit(2.0) * zSum2 * p * (lit(1.0) - p) /
            (delta * delta)).cast("long")))
  }

  /** DuckDB oracle for [[requiredSampleSize]]: `innerSql` yields
    * (`grpName`, y). */
  def requiredSampleSizeOracleSql(innerSql: String, grpName: String,
      mdeRelMicro: Long = 100000L): String = {
    val mde = mdeRelMicro.toDouble / 1e6
    s"""WITH g AS (
       |  SELECT $grpName, CAST(count(*) AS BIGINT) AS n_obs,
       |         CAST(sum(y) AS BIGINT) AS pos
       |  FROM ($innerSql) WHERE y IS NOT NULL GROUP BY 1
       |)
       |SELECT $grpName, n_obs, pos,
       |       CAST(pos AS DOUBLE) / n_obs AS p,
       |       CASE WHEN pos > 0 AND pos < n_obs THEN
       |         CAST(ceil(2.0 * 7.848886
       |           * (CAST(pos AS DOUBLE) / n_obs)
       |           * (1.0 - CAST(pos AS DOUBLE) / n_obs)
       |           / ((CAST(pos AS DOUBLE) / n_obs * $mde)
       |              * (CAST(pos AS DOUBLE) / n_obs * $mde)))
       |           AS BIGINT)
       |       END AS n_required_per_arm
       |FROM g""".stripMargin
  }

  /** Chi-square independence test over a two-way contingency table —
    * "are these two categoricals related" (source × language, segment ×
    * outcome), the categorical sibling of [[proportionTest]].
    *
    * One contingency aggregation; row/column margins re-derive FROM the
    * table (|rows|+|cols| rows, broadcast back — the corpus is scanned
    * once). Per-cell terms `(o − e)²/e` are bit-identical doubles, so
    * `trunc(term·10⁶)` is a portable integer and the statistic sums
    * exactly in any order (a raw double Σ would be partition-order-
    * dependent). Returns the quantized statistic + dof; compare against
    * the critical value for your α downstream.
    *
    * @return one row: (n, n_a_levels, n_b_levels, dof, chi2_q, chi2) —
    *         chi2 = chi2_q / 1e6
    */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("o"))
    val rowM = cells.groupBy(col("__a")).agg(sum("o").as("ra"))
    val colM = cells.groupBy(col("__b")).agg(sum("o").as("cb"))
    val total = cells.agg(sum("o").as("n"))
    // densify over the level cross: an unobserved cell contributes
    // (0 − e)²/e = e, and dropping it (observed-only groupBy) would
    // systematically understate the statistic
    val terms = rowM.crossJoin(colM)
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("__e",
        col("ra").cast("double") * col("cb") / col("n"))
      .withColumn("__t",
        ((col("o").cast("double") - col("__e")) *
          (col("o").cast("double") - col("__e")) / col("__e") *
          lit(1000000.0)).cast("long"))
    terms.agg(
        max(col("n")).as("n"),
        count_distinct(col("__a")).as("n_a_levels"),
        count_distinct(col("__b")).as("n_b_levels"),
        sum(col("__t")).as("chi2_q"))
      .withColumn("dof",
        (col("n_a_levels") - 1) * (col("n_b_levels") - 1))
      .withColumn("chi2", col("chi2_q").cast("double") / lit(1000000.0))
      .select(col("n"), col("n_a_levels"), col("n_b_levels"), col("dof"),
        col("chi2_q"), col("chi2"))
  }

  /** DuckDB oracle for [[chiSquareIndependence]]. */
  def chiSquareOracleSql(table: String, aCol: String, bCol: String)
      : String =
    s"""WITH cells AS (
       |  SELECT $aCol AS a, $bCol AS b, CAST(count(*) AS BIGINT) AS o
       |  FROM $table GROUP BY 1, 2
       |), rm AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
       |cm AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |dense AS (
       |  SELECT rm.a, cm.b, rm.ra, cm.cb, coalesce(cells.o, 0) AS o
       |  FROM rm CROSS JOIN cm
       |  LEFT JOIN cells ON cells.a = rm.a AND cells.b = cm.b
       |),
       |terms AS (
       |  SELECT o, ra, cb, t.n,
       |         CAST(trunc(((CAST(o AS DOUBLE)
       |            - CAST(ra AS DOUBLE) * cb / n)
       |           * (CAST(o AS DOUBLE)
       |            - CAST(ra AS DOUBLE) * cb / n)
       |           / (CAST(ra AS DOUBLE) * cb / n)) * 1000000.0)
       |           AS BIGINT) AS tq
       |  FROM dense CROSS JOIN t
       |)
       |SELECT max(n) AS n,
       |       (SELECT CAST(count(*) AS BIGINT) FROM rm) AS n_a_levels,
       |       (SELECT CAST(count(*) AS BIGINT) FROM cm) AS n_b_levels,
       |       ((SELECT count(*) FROM rm) - 1)
       |         * ((SELECT count(*) FROM cm) - 1) AS dof,
       |       CAST(sum(tq) AS BIGINT) AS chi2_q,
       |       CAST(sum(tq) AS DOUBLE) / 1000000.0 AS chi2
       |FROM terms""".stripMargin

  /** DuckDB oracle for [[proportionTest]]; `armBSql`/`convertSql` are
    * boolean SQL expressions over `table`'s rows. */
  def proportionTestOracleSql(table: String, groupCols: Seq[String],
      armBSql: String, convertSql: String): String = {
    val keys = groupCols.mkString(", ")
    val pa = "CAST(conv_a AS DOUBLE) / n_a"
    val pb = "CAST(conv_b AS DOUBLE) / n_b"
    val pooled = "CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)"
    val se = s"sqrt($pooled * (1.0 - $pooled) * (1.0 / n_a + 1.0 / n_b))"
    val zGuard = "n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0 " +
      "AND conv_a + conv_b < n_a + n_b"
    s"""WITH g AS (
       |  SELECT $keys,
       |    CAST(sum(CASE WHEN NOT ($armBSql) THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN NOT ($armBSql) AND ($convertSql)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(sum(CASE WHEN ($armBSql) THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b,
       |    CAST(sum(CASE WHEN ($armBSql) AND ($convertSql)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM $table GROUP BY $keys
       |)
       |SELECT $keys, n_a, conv_a, n_b, conv_b,
       |       CASE WHEN n_a > 0 THEN $pa END AS rate_a,
       |       CASE WHEN n_b > 0 THEN $pb END AS rate_b,
       |       CASE WHEN $zGuard THEN ($pb - $pa) / $se END AS z,
       |       CASE WHEN $zGuard
       |         THEN abs(CASE WHEN $zGuard THEN ($pb - $pa) / $se END) > 1.96
       |       END AS significant
       |FROM g""".stripMargin
  }

  /** BENJAMINI–HOCHBERG FDR selection over a per-group one-vs-rest
    * proportion test family — "which of these m groups really differ",
    * with the false-discovery rate controlled at `alphaNum/alphaDen`
    * instead of the per-test α that makes 20 tests yield one fake
    * discovery on average.
    *
    * Per group g: the 2×2 (g vs rest) × (flag vs not) chi-square with
    * the closed 2×2 form N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) — one fixed
    * IEEE sequence over exact integer margins, ×10⁶-truncated to a
    * portable integer (the [[chiSquareIndependence]] quantization).
    * Degenerate margins (a group that IS the table, F ∈ {0, N})
    * score 0. BH then ranks statistics descending (rank i ⇔ i-th
    * smallest p) and rejects ranks 1..i*, i* = max{i : χ²(i) ≥
    * crit(α·i/m)} — the critical ladder crit(·) is minted HERE via
    * [[probit]] and joined as an m-row literal table, so the whole
    * procedure is integer-exact at query time (no p-values, no erf).
    *
    * `m` is a CONTRACT: the size of the test family, fixed at plan
    * build (the ladder is m literals). The emitted `n_tests` column
    * carries the runtime group count — a mismatch means the family
    * drifted and every BH threshold with it; gate on n_tests = m.
    *
    * Scale shape: ONE keyed count aggregation (the corpus scan), a
    * one-row global frame broadcast back, the ladder join and the
    * rank window both over the m-row aggregate frame.
    *
    * @param flag 0/1 per row
    * @return (groupCol, n_g, f_g, chi2_q, bh_rank, crit_q, reject,
    *         n_tests) */
  def bhSelect(df: DataFrame, groupCol: String, flag: Column, m: Int,
      alphaNum: Int = 5, alphaDen: Int = 100): DataFrame = {
    require(m >= 1 && alphaNum > 0 && alphaNum < alphaDen)
    val spark0 = df.sparkSession
    import spark0.implicits._
    val ladder = (1 to m)
      .map(i => (i.toLong, chi2CritQ(alphaNum.toDouble * i /
        (alphaDen.toDouble * m))))
      .toDF("bh_rank", "crit_q")
    val per = df.select(col(groupCol), flag.cast("long").as("__f"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"), sum(col("__f")).as("f_g"))
    val tot = per.agg(sum(col("n_g")).as("__N"), sum(col("f_g")).as("__F"),
      count(lit(1)).as("n_tests"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("chi2_q").desc, col(groupCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("__a", col("f_g"))
      .withColumn("__b", col("n_g") - col("f_g"))
      .withColumn("__c", col("__F") - col("f_g"))
      .withColumn("__d",
        col("__N") - col("n_g") - col("__F") + col("f_g"))
      .withColumn("__den",
        col("n_g").cast("double") * (col("__N") - col("n_g")) *
          col("__F") * (col("__N") - col("__F")))
      .withColumn("__cross",
        col("__a").cast("double") * col("__d") -
          col("__b").cast("double") * col("__c"))
      .withColumn("chi2_q",
        when(col("__den") > 0.0,
          (col("__N").cast("double") * col("__cross") * col("__cross") /
            col("__den") * lit(1000000.0)).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("bh_rank", row_number().over(w).cast("long"))
    scored.join(broadcast(ladder), Seq("bh_rank"), "left")
      .na.fill(Long.MaxValue, Seq("crit_q"))
      .withColumn("__istar",
        max(when(col("chi2_q") >= col("crit_q"), col("bh_rank"))
          .otherwise(lit(0L))).over(wAll))
      .withColumn("reject", col("bh_rank") <= col("__istar"))
      .select(col(groupCol), col("n_g"), col("f_g"), col("chi2_q"),
        col("bh_rank"), col("crit_q"), col("reject"), col("n_tests"))
  }

  /** DuckDB oracle for [[bhSelect]] — the identical ladder literals,
    * quantization, and step-up rule. `innerSql` yields (groupName,
    * f 0/1). */
  def bhSelectOracleSql(innerSql: String, groupName: String, m: Int,
      alphaNum: Int = 5, alphaDen: Int = 100): String = {
    val ladder = (1 to m)
      .map(i => s"(${i}, ${chi2CritQ(alphaNum.toDouble * i /
        (alphaDen.toDouble * m))})")
      .mkString(", ")
    s"""WITH base AS ($innerSql),
       |per AS (
       |  SELECT $groupName, CAST(count(*) AS BIGINT) AS n_g,
       |         CAST(sum(f) AS BIGINT) AS f_g
       |  FROM base GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(n_g) AS BIGINT) AS nn,
       |         CAST(sum(f_g) AS BIGINT) AS ff,
       |         CAST(count(*) AS BIGINT) AS n_tests
       |  FROM per
       |), lad(bh_rank, crit_q) AS (VALUES $ladder),
       |scored AS (
       |  SELECT $groupName, n_g, f_g, n_tests,
       |         CASE WHEN CAST(n_g AS DOUBLE) * (nn - n_g) * ff * (nn - ff)
       |                   > 0.0
       |              THEN CAST(trunc(CAST(nn AS DOUBLE)
       |                * (CAST(f_g AS DOUBLE) * (nn - n_g - ff + f_g)
       |                   - CAST(n_g - f_g AS DOUBLE) * (ff - f_g))
       |                * (CAST(f_g AS DOUBLE) * (nn - n_g - ff + f_g)
       |                   - CAST(n_g - f_g AS DOUBLE) * (ff - f_g))
       |                / (CAST(n_g AS DOUBLE) * (nn - n_g) * ff
       |                   * (nn - ff))
       |                * 1000000.0) AS BIGINT)
       |              ELSE 0 END AS chi2_q
       |  FROM per CROSS JOIN tot
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (ORDER BY chi2_q DESC,
       |           $groupName) AS BIGINT) AS bh_rank
       |  FROM scored
       |), joined AS (
       |  SELECT ranked.*,
       |         coalesce(CAST(lad.crit_q AS BIGINT),
       |           9223372036854775807) AS crit_q
       |  FROM ranked LEFT JOIN lad USING (bh_rank)
       |), flagged AS (
       |  SELECT *, max(CASE WHEN chi2_q >= crit_q THEN bh_rank
       |                     ELSE 0 END) OVER () AS istar
       |  FROM joined
       |)
       |SELECT $groupName, n_g, f_g, chi2_q, bh_rank, crit_q,
       |       bh_rank <= istar AS reject, n_tests
       |FROM flagged""".stripMargin
  }

  /** Standard-normal quantile (probit) by Acklam's rational
    * approximation (~1.15·10⁻⁹ relative error) — evaluated at PLAN
    * BUILD time only, to mint the [[bhSelect]] critical-value ladder
    * as literals (the geomCumTable device: no erf/erfinv at query
    * time, where Spark and DuckDB libms could disagree). */
  private def probit(p: Double): Double = {
    require(p > 0.0 && p < 1.0)
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val plow = 0.02425
    if (p < plow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q +
        c(5)) / ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p > 1.0 - plow) {
      -probit(1.0 - p)
    } else {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r +
        a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r +
          1.0)
    }
  }

  /** χ²₁ upper-tail critical value as a ×10⁶-quantized literal:
    * chi2inv(1 − q, 1) = probit(1 − q/2)². */
  private def chi2CritQ(q: Double): Long =
    math.floor(math.pow(probit(1.0 - q / 2.0), 2) * 1e6).toLong
}
