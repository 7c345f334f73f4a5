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
