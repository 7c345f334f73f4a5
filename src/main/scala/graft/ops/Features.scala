package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised feature encodings for tabular training data — the step
  * between raw categorical columns and a model that only eats numbers.
  */
object Features {

  /** Leave-one-out target encoding: each row's categorical value is
    * replaced by the mean of the target over all OTHER rows of the same
    * category — the standard high-cardinality encoding (hashing aside),
    * with the leave-one-out correction that stops a row from leaking its
    * own label into its own feature (naive mean encoding's overfit
    * mechanism).
    *
    * Exact form: per category one integer (Σy, n) aggregate, per row
    * `loo = (Σy − y) / (n − 1)` — the subtraction happens in longs, one
    * fixed IEEE division at readout, NULL for singleton categories
    * (no "other rows" to average; impute downstream with the global
    * mean).
    *
    * Scale shape: one map-side-combinable keyed aggregation, then one
    * join of the input against the aggregate-sized category frame —
    * broadcast when small, AQE otherwise; a hot category skews the
    * AGGREGATE not the join (the category frame has one row per
    * category).
    *
    * @param y exact integer target (quantize with [[Exact.cents]] first)
    * @return input id/category/target columns + `loo_mean`
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, idCol: String,
      y: Column): DataFrame = {
    val base = df.select(col(idCol), col(catCol), y.as("y"))
      .filter(col("y").isNotNull)
    val g = base.groupBy(col(catCol))
      .agg(sum(col("y")).as("__sum"), count(lit(1)).as("__cnt"))
    base.join(g, catCol)
      .withColumn("loo_mean",
        when(col("__cnt") > 1,
          (col("__sum") - col("y")).cast("double") / (col("__cnt") - 1)))
      .drop("__sum", "__cnt")
  }

  /** TWO-FEATURE ordinary least squares via the normal equations — the
    * multivariate step after q216's single-feature fit: y ≈ b0 + b1·x1
    * + b2·x2, coefficients by Cramer's rule over the 3×3 Gram matrix.
    * The whole corpus folds to NINE exact integer sums in one
    * map-side-combinable pass; the determinants are fixed IEEE
    * arithmetic over those sums (bit-portable — the same expression
    * tree runs on both engines). Singular designs (collinear features)
    * yield NULL coefficients.
    *
    * @return one row: (n, b0, b1, b2, det)
    */
  def ols2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val g = df.select(y.as("__y"), x1.as("__a"), x2.as("__b"))
      .filter(col("__y").isNotNull && col("__a").isNotNull &&
        col("__b").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(col("__a")).as("s1"), sum(col("__b")).as("s2"),
        sum(col("__a") * col("__a")).as("s11"),
        sum(col("__a") * col("__b")).as("s12"),
        sum(col("__b") * col("__b")).as("s22"),
        sum(col("__y")).as("sy"),
        sum(col("__a") * col("__y")).as("s1y"),
        sum(col("__b") * col("__y")).as("s2y"))
    def d(c: String) = col(c).cast("double")
    val det = d("n") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1") * d("s22") - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s12") - d("s11") * d("s2"))
    val det0 = d("sy") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1y") * d("s22") - d("s12") * d("s2y")) +
      d("s2") * (d("s1y") * d("s12") - d("s11") * d("s2y"))
    val det1 = d("n") * (d("s1y") * d("s22") - d("s12") * d("s2y")) -
      d("sy") * (d("s1") * d("s22") - d("s12") * d("s2")) +
      d("s2") * (d("s1") * d("s2y") - d("s1y") * d("s2"))
    val det2 = d("n") * (d("s11") * d("s2y") - d("s1y") * d("s12")) -
      d("s1") * (d("s1") * d("s2y") - d("s1y") * d("s2")) +
      d("sy") * (d("s1") * d("s12") - d("s11") * d("s2"))
    g.withColumn("det", det)
      .withColumn("b0", when(abs(col("det")) > 0, det0 / col("det")))
      .withColumn("b1", when(abs(col("det")) > 0, det1 / col("det")))
      .withColumn("b2", when(abs(col("det")) > 0, det2 / col("det")))
      .select(col("n"), col("b0"), col("b1"), col("b2"), col("det"))
  }

  /** DuckDB oracle for [[ols2]]: `innerSql` yields (y, a, b). */
  def ols2OracleSql(innerSql: String): String = {
    def dd(c: String) = s"CAST($c AS DOUBLE)"
    val det = s"${dd("n")} * (${dd("s11")} * ${dd("s22")} - ${dd("s12")} * ${dd("s12")}) - " +
      s"${dd("s1")} * (${dd("s1")} * ${dd("s22")} - ${dd("s12")} * ${dd("s2")}) + " +
      s"${dd("s2")} * (${dd("s1")} * ${dd("s12")} - ${dd("s11")} * ${dd("s2")})"
    val det0 = s"${dd("sy")} * (${dd("s11")} * ${dd("s22")} - ${dd("s12")} * ${dd("s12")}) - " +
      s"${dd("s1")} * (${dd("s1y")} * ${dd("s22")} - ${dd("s12")} * ${dd("s2y")}) + " +
      s"${dd("s2")} * (${dd("s1y")} * ${dd("s12")} - ${dd("s11")} * ${dd("s2y")})"
    val det1 = s"${dd("n")} * (${dd("s1y")} * ${dd("s22")} - ${dd("s12")} * ${dd("s2y")}) - " +
      s"${dd("sy")} * (${dd("s1")} * ${dd("s22")} - ${dd("s12")} * ${dd("s2")}) + " +
      s"${dd("s2")} * (${dd("s1")} * ${dd("s2y")} - ${dd("s1y")} * ${dd("s2")})"
    val det2 = s"${dd("n")} * (${dd("s11")} * ${dd("s2y")} - ${dd("s1y")} * ${dd("s12")}) - " +
      s"${dd("s1")} * (${dd("s1")} * ${dd("s2y")} - ${dd("s1y")} * ${dd("s2")}) + " +
      s"${dd("sy")} * (${dd("s1")} * ${dd("s12")} - ${dd("s11")} * ${dd("s2")})"
    s"""WITH g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(a) AS BIGINT) AS s1, CAST(sum(b) AS BIGINT) AS s2,
       |         CAST(sum(a * a) AS BIGINT) AS s11,
       |         CAST(sum(a * b) AS BIGINT) AS s12,
       |         CAST(sum(b * b) AS BIGINT) AS s22,
       |         CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(a * y) AS BIGINT) AS s1y,
       |         CAST(sum(b * y) AS BIGINT) AS s2y
       |  FROM ($innerSql)
       |  WHERE y IS NOT NULL AND a IS NOT NULL AND b IS NOT NULL
       |)
       |SELECT n,
       |       CASE WHEN abs($det) > 0 THEN ($det0) / ($det) END AS b0,
       |       CASE WHEN abs($det) > 0 THEN ($det1) / ($det) END AS b1,
       |       CASE WHEN abs($det) > 0 THEN ($det2) / ($det) END AS b2,
       |       $det AS det
       |FROM g""".stripMargin
  }

  /** EMPIRICAL-BAYES shrunk rates (Beta-binomial posterior mean with a
    * pseudo-count prior): per-key success rates pulled toward the
    * global rate by `α` pseudo-observations — the smoothed-CTR /
    * Bayesian target encoding that stops a 1-for-1 key from outranking
    * a 900-for-1000 one. The shrinkage companion to [[targetEncodeLoo]]
    * (LOO fixes self-leakage; this fixes small-n noise).
    *
    * Exact rational arithmetic: with global (G⁺, G) the shrunk rate
    * `(pos + α·G⁺/G)/(n + α)` multiplies out to the integer
    * `(pos·G + α·G⁺)·1e6 div ((n + α)·G)` — no float prior ever
    * materializes.
    *
    * OVERFLOW LEDGER (int64, non-ANSI Spark wraps silently where DuckDB
    * errors — stay inside the bound): pos·G·10⁶ must stay under 2⁶³,
    * i.e. pos·G < 9.2·10¹². At a corpus of G = 10⁹ observed rows that
    * caps per-key pos at ~9 200; beyond that, pre-scale the success
    * counts (e.g. per-mille instead of raw) or shard the encoding by a
    * coarse key split. Same convention as [[graft.ops.ABTest]] CUPED's
    * Σdq² bound.
    *
    * @return per key: (keyCol, n, pos, raw_micro, shrunk_micro) —
    *         raw_micro NULL-free (keys come from observed rows)
    */
  def shrunkRates(df: DataFrame, keyCol: String, success: Column,
      alpha: Long = 20L): DataFrame = {
    require(alpha >= 1)
    val per = df.select(col(keyCol), success.cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val g = per.agg(sum(col("n")).as("__gn"), sum(col("pos")).as("__gp"))
    per.crossJoin(broadcast(g))
      .withColumn("raw_micro", expr("(pos * 1000000) div n"))
      .withColumn("shrunk_micro",
        expr(s"((pos * __gn + $alpha * __gp) * 1000000)" +
          s" div ((n + $alpha) * __gn)"))
      .select(col(keyCol), col("n"), col("pos"), col("raw_micro"),
        col("shrunk_micro"))
  }

  /** DuckDB oracle for [[shrunkRates]]: `innerSql` yields
    * (`keyName`, y). */
  def shrunkRatesOracleSql(innerSql: String, keyName: String,
      alpha: Long = 20L): String =
    s"""WITH per AS (
       |  SELECT $keyName, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(y) AS BIGINT) AS pos
       |  FROM ($innerSql) WHERE y IS NOT NULL GROUP BY 1
       |), g AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS gn,
       |         CAST(sum(pos) AS BIGINT) AS gp
       |  FROM per
       |)
       |SELECT $keyName, n, pos,
       |       CAST((pos * 1000000) // n AS BIGINT) AS raw_micro,
       |       CAST(((pos * gn + $alpha * gp) * 1000000)
       |         // ((n + $alpha) * gn) AS BIGINT) AS shrunk_micro
       |FROM per CROSS JOIN g""".stripMargin

  /** ADJUSTED RAND INDEX between two partitions of the same items —
    * "did the clustering recover the known segmentation", chance-
    * corrected (ARI 0 = what random labels score, 1 = identical
    * partitions). Computes from the label-pair CONTINGENCY table and
    * its margins — Σ C(n,2) arithmetic, never item pairs — so cost is
    * bounded by |labels_a|·|labels_b|, not n².
    *
    * Exact longs end-to-end; the expected-index correction is the one
    * fixed IEEE sequence. Degenerate cases (single cluster on both
    * sides — max = expected) yield NULL.
    *
    * @return one row: (n, n_cells, pairs_both, pairs_a, pairs_b, ari)
    */
  def adjustedRandIndex(df: DataFrame, aCol: Column,
      bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("__a"), bCol.as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("nij"))
    // integer C(c,2): Column `/` is double division — `div` keeps the
    // pair counts (and the comparator dtype) in exact longs
    def c2(name: String) = expr(s"($name * ($name - 1)) div 2")
    val aM = cells.groupBy(col("__a")).agg(sum(col("nij")).as("ai"))
      .agg(sum(c2("ai")).as("pairs_a"))
    val bM = cells.groupBy(col("__b")).agg(sum(col("nij")).as("bj"))
      .agg(sum(c2("bj")).as("pairs_b"))
    val top = cells.agg(sum(col("nij")).as("n"),
      count(lit(1)).as("n_cells"),
      sum(c2("nij")).as("pairs_both"))
    val j = top.crossJoin(broadcast(aM)).crossJoin(broadcast(bM))
    val c2n = (col("n") * (col("n") - 1) / 2).cast("double")
    val expd = col("pairs_a").cast("double") * col("pairs_b") / c2n
    val mx = (col("pairs_a") + col("pairs_b")).cast("double") / 2.0
    j.withColumn("ari",
        when(abs(mx - expd) > 0,
          (col("pairs_both").cast("double") - expd) / (mx - expd)))
      .select(col("n"), col("n_cells"), col("pairs_both"),
        col("pairs_a"), col("pairs_b"), col("ari"))
  }

  /** DuckDB oracle for [[adjustedRandIndex]]: `innerSql` yields
    * (a, b). */
  def ariOracleSql(innerSql: String): String =
    s"""WITH cells AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS nij
       |  FROM ($innerSql) WHERE a IS NOT NULL AND b IS NOT NULL
       |  GROUP BY 1, 2
       |), am AS (
       |  SELECT CAST(sum(ai * (ai - 1) / 2) AS BIGINT) AS pairs_a
       |  FROM (SELECT CAST(sum(nij) AS BIGINT) AS ai
       |        FROM cells GROUP BY a)
       |), bm AS (
       |  SELECT CAST(sum(bj * (bj - 1) / 2) AS BIGINT) AS pairs_b
       |  FROM (SELECT CAST(sum(nij) AS BIGINT) AS bj
       |        FROM cells GROUP BY b)
       |), top AS (
       |  SELECT CAST(sum(nij) AS BIGINT) AS n,
       |         CAST(count(*) AS BIGINT) AS n_cells,
       |         CAST(sum(nij * (nij - 1) / 2) AS BIGINT) AS pairs_both
       |  FROM cells
       |)
       |SELECT n, n_cells, pairs_both, pairs_a, pairs_b,
       |  CASE WHEN abs(CAST(pairs_a + pairs_b AS DOUBLE) / 2.0
       |      - CAST(pairs_a AS DOUBLE) * pairs_b
       |        / CAST(n * (n - 1) / 2 AS DOUBLE)) > 0 THEN
       |    (CAST(pairs_both AS DOUBLE)
       |      - CAST(pairs_a AS DOUBLE) * pairs_b
       |        / CAST(n * (n - 1) / 2 AS DOUBLE))
       |    / (CAST(pairs_a + pairs_b AS DOUBLE) / 2.0
       |      - CAST(pairs_a AS DOUBLE) * pairs_b
       |        / CAST(n * (n - 1) / 2 AS DOUBLE))
       |  END AS ari
       |FROM top CROSS JOIN am CROSS JOIN bm""".stripMargin

  /** EXACT Spearman rank correlation with ties — rank-2 device: the
    * tie-averaged rank is generally fractional, but TWICE it
    * (`2·cum_before + n_at + 1` per distinct value) is always an
    * integer, and Pearson is scale-invariant — so Spearman computes as
    * [[Exact.corrFromSums]] over integer doubled ranks, bit-portable
    * with zero interpolation. The monotone-association answer where
    * q85's Pearson only sees linearity.
    *
    * Scale shape: two value-histogram rank maps (cumulative windows
    * over DISTINCT values per group) joined back on the value, one
    * 6-sum fold per group.
    *
    * @return per group: (grpCols..., n, rho)
    */
  def spearman(df: DataFrame, grpCols: Seq[String], x: Column,
      y: Column): DataFrame = {
    val base = df.select(grpCols.map(col) :+ x.as("__x") :+ y.as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def rank2(vCol: String, out: String) = {
      val h = base.groupBy(grpCols.map(col) :+ col(vCol): _*)
        .agg(count(lit(1)).as("__c"))
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(grpCols.map(col): _*).orderBy(col(vCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      h.withColumn(out,
        lit(2L) * coalesce(sum(col("__c")).over(wPrev), lit(0L)) +
          col("__c") + 1L)
        .select(grpCols.map(col) :+ col(vCol) :+ col(out): _*)
    }
    val withRanks = base
      .join(rank2("__x", "__rx"), grpCols :+ "__x")
      .join(rank2("__y", "__ry"), grpCols :+ "__y")
    withRanks.groupBy(grpCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).as("sx"), sum(col("__ry")).as("sy"),
        sum(col("__rx") * col("__rx")).as("sxx"),
        sum(col("__ry") * col("__ry")).as("syy"),
        sum(col("__rx") * col("__ry")).as("sxy"))
      .select(grpCols.map(col) :+ col("n") :+
        Exact.corrFromSums(col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy")).as("rho"): _*)
  }

  /** Borda RANK FUSION of K integer metrics — the ensemble device for
    * quality signals that live on incomparable scales (a learned score,
    * a bits-per-token, a repetition fraction): each metric contributes
    * its tie-averaged DOUBLED rank (the [[spearman]] integer device;
    * direction-normalized so bigger borda2 = better on every metric),
    * and the fused score is their exact integer sum — no min-max
    * normalization constants to disagree about, no float weights.
    *
    * Scale shape: per metric, one value-histogram rank map (cumulative
    * window over DISTINCT values — bounded by value cardinality, the
    * spearman contract) joined back on the value. K broadcast-sized
    * rank maps, zero row-level sorts.
    *
    * @param metrics (column name, higherIsBetter)
    * @return input id + per-metric `r2_<name>` doubled ranks + `borda2`
    */
  def bordaFusion(df: DataFrame, idCol: String,
      metrics: Seq[(String, Boolean)]): DataFrame = {
    require(metrics.nonEmpty)
    val W = org.apache.spark.sql.expressions.Window
    // CACHING CONTRACT (the minhashLshPipeline convention): the metric
    // frame feeds K histogram branches plus the join spine — without
    // the persist barrier every branch re-runs the (possibly expensive)
    // upstream metric pipelines, and the q322 lesson applies: broadcast
    // the value-cardinality-bounded rank maps EXPLICITLY rather than
    // trusting post-cache AQE stats. Caller (or the harness's
    // clearCache between queries) releases the pin.
    val base = df.select(col(idCol) +:
      metrics.map { case (m, _) => col(m).cast("long").as(m) }: _*)
      .persist()
    val ranked = metrics.foldLeft(base) { case (acc, (m, hib)) =>
      val h = base.groupBy(col(m)).agg(count(lit(1)).as("__c"))
      val ord = if (hib) col(m).asc else col(m).desc
      val rankMap = h.withColumn(s"r2_$m",
        lit(2L) * coalesce(sum(col("__c")).over(W.orderBy(ord)
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)) +
          col("__c") + 1L)
        .select(col(m), col(s"r2_$m"))
      acc.join(broadcast(rankMap), Seq(m))
    }
    ranked.withColumn("borda2",
      metrics.map { case (m, _) => col(s"r2_$m") }.reduce(_ + _))
  }

  /** DuckDB oracle for [[bordaFusion]]: `innerSql` yields
    * (idName, metric columns). */
  def bordaFusionOracleSql(innerSql: String, idName: String,
      metrics: Seq[(String, Boolean)]): String = {
    val rankCtes = metrics.map { case (m, hib) =>
      val ord = if (hib) m else s"$m DESC"
      s"""r_$m AS (
         |  SELECT $m,
         |    2 * CAST(coalesce(sum(c) OVER (ORDER BY $ord
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) + c + 1 AS r2_$m
         |  FROM (SELECT $m, CAST(count(*) AS BIGINT) AS c
         |        FROM b GROUP BY 1)
         |)""".stripMargin
    }
    val joins = metrics.map { case (m, _) => s"JOIN r_$m USING ($m)" }
      .mkString(" ")
    s"""WITH b AS ($innerSql),
       |${rankCtes.mkString(",\n")}
       |SELECT $idName, ${metrics.map(_._1).mkString(", ")},
       |       ${metrics.map(m => s"r2_${m._1}").mkString(", ")},
       |       ${metrics.map(m => s"r2_${m._1}").mkString(" + ")} AS borda2
       |FROM b $joins""".stripMargin
  }

  /** Kendall τ-b — the PAIR-concordance rank association beside
    * [[spearman]]'s rank-Pearson: τ-b = (C−D)/√((n₀−n₁)(n₀−n₂)) with
    * C/D the concordant/discordant pair masses and n₁/n₂ the
    * tied-pair masses per margin. Everything is computed from the
    * per-group JOINT VALUE HISTOGRAM — C and D by a cell×cell join on
    * `a.x < b.x` (each unordered pair of distinct-x cells once), tie
    * masses from the marginal histograms, never a row-level pair join.
    *
    * SCALE CONTRACT (the markov-channel convention): the cell join is
    * O(|cells|²) per group, so inputs must be BOUNDED-DOMAIN integers —
    * decile bins, small counts, grades. Corpus scale grows cell
    * COUNTS, never the cell set; pass continuous values through
    * [[Quantiles.binByCuts]] first. Pair masses multiply counts, so
    * products run in DECIMAL(38,0) (the q360 device) and surface as
    * doubles through one fixed cast chain — identical, not exact,
    * past 2⁵³ (test scales are exact).
    *
    * @return per group: (grpCols..., n, n_cells, conc, disc, tau_b) —
    *         tau_b NULL when a margin is constant (denominator 0) */
  def kendallTauB(df: DataFrame, grpCols: Seq[String], x: Column,
      y: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val keys = grpCols.map(col)
    val base = df
      .select(keys :+ x.cast("long").as("__x") :+
        y.cast("long").as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val cells = base.groupBy(keys :+ col("__x") :+ col("__y"): _*)
      .agg(count(lit(1)).as("__c"))
    def tieMass(vCol: String, out: String) = cells
      .groupBy(keys :+ col(vCol): _*).agg(sum(col("__c")).as("__m"))
      .groupBy(keys: _*)
      .agg(sum(col("__m").cast(dec) * (col("__m") - 1).cast(dec) / 2)
        .cast(dec).as(out))
    val a = cells.select(keys.map(k => k.as(k.toString)) :+
      col("__x").as("__ax") :+ col("__y").as("__ay") :+
      col("__c").as("__ac"): _*)
    val b = cells.select(grpCols.map(g => col(g).as(s"__b_$g")) :+
      col("__x").as("__bx") :+ col("__y").as("__by") :+
      col("__c").as("__bc"): _*)
    val joinCond = grpCols.map(g => col(g) === col(s"__b_$g"))
      .reduce(_ && _) && col("__ax") < col("__bx")
    val cd = a.join(b, joinCond)
      .groupBy(keys: _*)
      .agg(
        sum(when(col("__ay") < col("__by"),
          col("__ac").cast(dec) * col("__bc").cast(dec))
          .otherwise(lit(0).cast(dec))).as("__conc"),
        sum(when(col("__ay") > col("__by"),
          col("__ac").cast(dec) * col("__bc").cast(dec))
          .otherwise(lit(0).cast(dec))).as("__disc"))
    val tot = base.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"))
    val nCells = cells.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_cells"))
    val out = tot
      .join(nCells, grpCols)
      .join(tieMass("__x", "__n1"), grpCols)
      .join(tieMass("__y", "__n2"), grpCols)
      .join(cd, grpCols, "left")
      .withColumn("__conc", coalesce(col("__conc"), lit(0).cast(dec)))
      .withColumn("__disc", coalesce(col("__disc"), lit(0).cast(dec)))
      .withColumn("__n0",
        (col("n").cast(dec) * (col("n") - 1).cast(dec) / 2).cast(dec))
    val d1 = (col("__n0") - col("__n1")).cast("double")
    val d2 = (col("__n0") - col("__n2")).cast("double")
    out
      .withColumn("conc", col("__conc").cast("double"))
      .withColumn("disc", col("__disc").cast("double"))
      .withColumn("tau_b",
        when(d1 * d2 > 0.0,
          (col("conc") - col("disc")) / sqrt(d1 * d2)))
      .select(keys :+ col("n") :+ col("n_cells") :+ col("conc") :+
        col("disc") :+ col("tau_b"): _*)
  }

  /** DuckDB oracle for [[kendallTauB]]: `innerSql` yields
    * (grpCols..., x, y). */
  def kendallTauBOracleSql(innerSql: String, grpCols: Seq[String])
      : String = {
    val keys = grpCols.mkString(", ")
    val aKeys = grpCols.map(g => s"a.$g").mkString(", ")
    val onKeys = grpCols.map(g => s"a.$g = b.$g").mkString(" AND ")
    s"""WITH src AS (
       |  SELECT $keys, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
       |  FROM ($innerSql) WHERE x IS NOT NULL AND y IS NOT NULL
       |), cells AS (
       |  SELECT $keys, x, y, CAST(count(*) AS BIGINT) AS c
       |  FROM src GROUP BY ALL
       |), t1 AS (
       |  SELECT $keys, sum(CAST(m AS HUGEINT) * (m - 1) / 2) AS n1
       |  FROM (SELECT $keys, x, CAST(sum(c) AS BIGINT) AS m
       |        FROM cells GROUP BY ALL) GROUP BY ALL
       |), t2 AS (
       |  SELECT $keys, sum(CAST(m AS HUGEINT) * (m - 1) / 2) AS n2
       |  FROM (SELECT $keys, y, CAST(sum(c) AS BIGINT) AS m
       |        FROM cells GROUP BY ALL) GROUP BY ALL
       |), cd AS (
       |  SELECT $aKeys,
       |    sum(CASE WHEN a.y < b.y THEN CAST(a.c AS HUGEINT) * b.c
       |        ELSE 0 END) AS conc,
       |    sum(CASE WHEN a.y > b.y THEN CAST(a.c AS HUGEINT) * b.c
       |        ELSE 0 END) AS disc
       |  FROM cells a JOIN cells b ON $onKeys AND a.x < b.x
       |  GROUP BY ALL
       |), tot AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(count(*) AS HUGEINT)
       |           * (count(*) - 1) / 2 AS n0
       |  FROM src GROUP BY ALL
       |), nc AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n_cells
       |  FROM cells GROUP BY ALL
       |)
       |SELECT $keys, n, n_cells,
       |       CAST(coalesce(conc, 0) AS DOUBLE) AS conc,
       |       CAST(coalesce(disc, 0) AS DOUBLE) AS disc,
       |       CASE WHEN CAST(n0 - n1 AS DOUBLE)
       |                 * CAST(n0 - n2 AS DOUBLE) > 0.0
       |            THEN (CAST(coalesce(conc, 0) AS DOUBLE)
       |                  - CAST(coalesce(disc, 0) AS DOUBLE))
       |                 / sqrt(CAST(n0 - n1 AS DOUBLE)
       |                        * CAST(n0 - n2 AS DOUBLE))
       |       END AS tau_b
       |FROM tot
       |JOIN nc USING ($keys) JOIN t1 USING ($keys) JOIN t2 USING ($keys)
       |LEFT JOIN cd USING ($keys)""".stripMargin
  }

  /** DuckDB oracle for [[spearman]]: `innerSql` yields
    * (grpCols..., x, y). */
  def spearmanOracleSql(innerSql: String, grpCols: Seq[String]): String = {
    val keys = grpCols.mkString(", ")
    def rankCte(v: String, cte: String, out: String) =
      s"""$cte AS (
         |  SELECT $keys, $v,
         |    2 * CAST(coalesce(sum(c) OVER (PARTITION BY $keys
         |      ORDER BY $v ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND 1 PRECEDING), 0) AS BIGINT) + c + 1 AS $out
         |  FROM (SELECT $keys, $v, CAST(count(*) AS BIGINT) AS c
         |        FROM b GROUP BY ${(1 to grpCols.length + 1).mkString(", ")})
         |)""".stripMargin
    s"""WITH b AS (
       |  SELECT $keys, x, y FROM ($innerSql)
       |  WHERE x IS NOT NULL AND y IS NOT NULL
       |), ${rankCte("x", "rx", "r2x")}, ${rankCte("y", "ry", "r2y")},
       |j AS (
       |  SELECT b.*, rx.r2x, ry.r2y
       |  FROM b JOIN rx USING ($keys, x) JOIN ry USING ($keys, y)
       |), s AS (
       |  SELECT $keys, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(r2x) AS BIGINT) AS sx,
       |         CAST(sum(r2y) AS BIGINT) AS sy,
       |         CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
       |         CAST(sum(r2y * r2y) AS BIGINT) AS syy,
       |         CAST(sum(r2x * r2y) AS BIGINT) AS sxy
       |  FROM j GROUP BY $keys
       |)
       |SELECT $keys, n, ${Exact.corrFromSumsSql("n", "sx", "sy", "sxx",
        "syy", "sxy")} AS rho
       |FROM s""".stripMargin
  }

  /** Mutual-information feature ranking: score each candidate
    * categorical feature by its MI with the label, in the q181/q130
    * integer bit-length-log device — `blog(x) = ⌊log2 x⌋ + 1`, so each
    * cell term `n_xy·(blog(n_xy·N) − blog(n_x·n_y))` is an exact long
    * ("bits, staircase-coarsened") and the ranking is deterministic
    * across engines and partition orders. Coarse in absolute value,
    * faithful in ORDER — which is all feature selection consumes; the
    * chi-square test (q204) answers "dependent at all", this ranks HOW
    * dependent, comparably across features.
    *
    * Scale shape, per feature: one contingency aggregation + two
    * margin re-aggregations joined back on the feature/label keys
    * (aggregate-sized frames), one N broadcast. Features evaluated
    * independently and unioned.
    *
    * @param features (name, expression) per candidate feature
    * @return (feature, n_cells, mi_q, mi_bits) — mi_bits = mi_q/N */
  def miRanking(df: DataFrame, label: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty)
    val blog = (x: Column) => length(bin(x)).cast("long")
    val scored = features.map { case (name, f) =>
      val cells = df.select(f.as("__f"), label.as("__l"))
        .filter(col("__f").isNotNull && col("__l").isNotNull)
        .groupBy(col("__f"), col("__l")).agg(count(lit(1)).as("nxy"))
      val fMargin = cells.groupBy(col("__f")).agg(sum(col("nxy")).as("nx"))
      val lMargin = cells.groupBy(col("__l")).agg(sum(col("nxy")).as("ny"))
      val nRow = cells.agg(sum(col("nxy")).as("N"))
      cells.join(fMargin, "__f").join(lMargin, "__l")
        .crossJoin(broadcast(nRow))
        .select((col("nxy") *
          (blog(col("nxy") * col("N")) - blog(col("nx") * col("ny"))))
          .as("term"), col("N"))
        .agg(count(lit(1)).as("n_cells"), sum(col("term")).as("mi_q"),
          max(col("N")).as("__N"))
        .select(lit(name).as("feature"), col("n_cells"), col("mi_q"),
          (col("mi_q").cast("double") / col("__N")).as("mi_bits"))
    }
    scored.reduce(_ unionAll _)
  }

  /** DuckDB oracle for [[miRanking]]: each feature a (name, SQL expr)
    * over `table`; `labelSql` is the label expression. */
  def miRankingOracleSql(table: String, labelSql: String,
      features: Seq[(String, String)]): String = {
    val legs = features.map { case (name, fSql) =>
      s"""SELECT '$name' AS feature, n_cells, mi_q,
         |       CAST(mi_q AS DOUBLE) / nn AS mi_bits FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |         CAST(sum(nxy * (length(bin(nxy * nn))
         |           - length(bin(nx * ny)))) AS BIGINT) AS mi_q,
         |         max(nn) AS nn
         |  FROM (
         |    SELECT c.nxy, fm.nx, lm.ny, tot.nn
         |    FROM (SELECT $fSql AS f, $labelSql AS l,
         |            CAST(count(*) AS BIGINT) AS nxy
         |          FROM $table
         |          WHERE $fSql IS NOT NULL AND $labelSql IS NOT NULL
         |          GROUP BY 1, 2) c
         |    JOIN (SELECT $fSql AS f, CAST(count(*) AS BIGINT) AS nx
         |          FROM $table
         |          WHERE $fSql IS NOT NULL AND $labelSql IS NOT NULL
         |          GROUP BY 1) fm ON c.f = fm.f
         |    JOIN (SELECT $labelSql AS l, CAST(count(*) AS BIGINT) AS ny
         |          FROM $table
         |          WHERE $fSql IS NOT NULL AND $labelSql IS NOT NULL
         |          GROUP BY 1) lm ON c.l = lm.l
         |    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS nn
         |                FROM $table
         |                WHERE $fSql IS NOT NULL
         |                  AND $labelSql IS NOT NULL) tot
         |  )
         |)""".stripMargin
    }
    legs.mkString("", "\nUNION ALL\n", "")
  }

  /** DuckDB oracle for [[targetEncodeLoo]]: `innerSql` yields
    * (`idName`, `catName`, y). */
  def targetEncodeLooOracleSql(innerSql: String, catName: String,
      idName: String): String =
    s"""WITH b AS (
       |  SELECT $idName, $catName, y FROM ($innerSql) WHERE y IS NOT NULL
       |), g AS (
       |  SELECT $catName, CAST(sum(y) AS BIGINT) AS s,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM b GROUP BY 1
       |)
       |SELECT $idName, $catName, y,
       |       CASE WHEN c > 1
       |         THEN CAST(s - y AS DOUBLE) / (c - 1) END AS loo_mean
       |FROM b JOIN g USING ($catName)""".stripMargin
}
