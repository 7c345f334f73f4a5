package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling: per-column quality statistics (null count/fraction,
  * exact distinct cardinality, min/max) in ONE aggregation pass — the
  * summary a pipeline owner checks before trusting a new drop of data.
  *
  * Scale shape: a single `agg` computes every statistic for every column
  * (the multiple exact `count_distinct`s plan as one Expand + aggregate —
  * rows × #columns intermediate, all map-side combinable; swap in
  * `approx_count_distinct` for trillion-row profiles), and the wide
  * one-row result is exploded driver-free into the long (column, stats)
  * form. min/max are computed in the column's native type and THEN cast
  * to string for the uniform output schema — numeric semantics, not
  * lexicographic.
  */
object Profiling {

  /** Profile `cols` of `df`.
    *
    * @return (column, n_rows, n_nulls, null_frac, n_distinct, min_val,
    *         max_val) — one row per profiled column
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(s"__nulls_$c"),
      count_distinct(col(c)).as(s"__distinct_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(
      lit(c).as("column"),
      col(s"__nulls_$c").as("n_nulls"),
      col(s"__distinct_$c").as("n_distinct"),
      col(s"__min_$c").as("min_val"),
      col(s"__max_$c").as("max_val")))
    one.select(col("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("n_rows"), col("p.n_nulls"),
        (col("p.n_nulls").cast("double") / col("n_rows")).as("null_frac"),
        col("p.n_distinct"), col("p.min_val"), col("p.max_val"))
  }

  /** Data-quality gate: evaluate row-level expectations in ONE aggregation
    * pass and emit a verdict row per check — the dbt-test/CHECK-constraint
    * step a pipeline runs before publishing a table. NULL follows SQL
    * CHECK semantics: only an explicit `false` is a violation, so an
    * expectation over a nullable column states its own null policy
    * (`isNotNull && …` vs plain `…`).
    *
    * @param checks (name, boolean expectation) pairs
    * @return (check, n_rows, n_violations, pass) — one row per check
    */
  def expectations(df: DataFrame, checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one expectation")
    val aggs = count(lit(1)).as("n_rows") +: checks.zipWithIndex.map {
      case ((_, c), i) =>
        sum(when(c === false, lit(1L)).otherwise(lit(0L))).as(s"__v$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("check"), col(s"__v$i").as("n_violations"))
    }
    one.select(col("n_rows"), explode(array(entries: _*)).as("e"))
      .select(col("e.check"), col("n_rows"), col("e.n_violations"),
        (col("e.n_violations") === 0L).as("pass"))
  }

  /** DuckDB oracle for [[expectations]]: same one-pass aggregation over
    * `(name, sqlPredicate)` pairs mirroring the Spark checks. */
  def expectationsOracleSql(table: String,
      checks: Seq[(String, String)]): String = {
    val aggs = checks.zipWithIndex.map { case ((_, p), i) =>
      s"sum(CASE WHEN ($p) = false THEN 1 ELSE 0 END) AS __v$i" }
      .mkString(", ")
    val arms = checks.zipWithIndex.map { case ((n, _), i) =>
      s"""SELECT '$n' AS "check", n_rows, CAST(__v$i AS BIGINT) AS n_violations,
         |       __v$i = 0 AS pass FROM agg""".stripMargin }
    s"""WITH agg AS (SELECT count(*) AS n_rows, $aggs FROM $table)
      |${arms.mkString("\n UNION ALL\n")}""".stripMargin
  }

  /** DuckDB oracle for [[profile]], generated from the same column list. */
  def profileOracleSql(table: String, cols: Seq[String]): String = {
    val aggs = cols.flatMap(c => Seq(
      s"sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS __nulls_$c",
      s"count(DISTINCT $c) AS __distinct_$c",
      s"CAST(min($c) AS VARCHAR) AS __min_$c",
      s"CAST(max($c) AS VARCHAR) AS __max_$c")).mkString(", ")
    val arms = cols.map(c =>
      s"""SELECT '$c' AS "column", n_rows,
         |       CAST(__nulls_$c AS BIGINT) AS n_nulls,
         |       CAST(__nulls_$c AS DOUBLE) / n_rows AS null_frac,
         |       __distinct_$c AS n_distinct,
         |       __min_$c AS min_val, __max_$c AS max_val FROM agg""".stripMargin)
    s"""WITH agg AS (SELECT count(*) AS n_rows, $aggs FROM $table)
      |${arms.mkString("\n UNION ALL\n")}""".stripMargin
  }

  /** Per-group min-max feature scaling of an integer column to [0, 1]:
    * `(v − min) / (max − min)` with the min/max aggregated exactly as
    * integers and ONE double division at the end (identical IEEE op on
    * both engines — the [[graft.ops.Exact]] recipe applied to scaling).
    * Constant groups pin to 0.5: a 0/0 NaN would rank above every
    * double downstream (the zscore lesson). The per-group stats frame is
    * group-cardinality-sized and broadcast — no window over the rows. */
  def minMaxNormalize(df: DataFrame, grpCol: String, v: Column,
      outCol: String): DataFrame = {
    val stats = df.groupBy(col(grpCol))
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    df.join(broadcast(stats), grpCol)
      .withColumn(outCol,
        when(col("__mx") > col("__mn"),
          (v - col("__mn")).cast("double") /
            (col("__mx") - col("__mn")).cast("double"))
          .otherwise(lit(0.5)))
      .drop("__mn", "__mx")
  }

  /** Per-group PERCENT-RANK normalization — [[minMaxNormalize]]'s
    * outlier-immune sibling: a value maps to its rank position
    * (rank−1)/(n−1) ∈ [0,1] within its group, so one extreme value
    * can't compress everyone else into a sliver of the range (min-max's
    * failure mode) and the output distribution is uniform by
    * construction — the feature-scaling contract rank-based models and
    * mixture dashboards want. Ties break by `tieCol` (row_number, not
    * SQL percent_rank's shared ranks), making the map total,
    * deterministic, and engine-portable. Singleton groups have no
    * spread and read NULL.
    *
    * One window per group partition + the derived double from one
    * integer division pair.
    *
    * @return df + (outCol) */
  def percentRankNormalize(df: DataFrame, grpCol: String, v: Column,
      tieCol: Column, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(grpCol)).orderBy(v, tieCol)
    df.withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1))
        .over(Window.partitionBy(col(grpCol))))
      .withColumn(outCol, when(col("__n") > 1,
        (col("__rk") - 1L).cast("double") /
          (col("__n") - 1L).cast("double")))
      .drop("__rk", "__n")
  }

  /** Column-profile DRIFT between two snapshots of the same table — the
    * data-drift monitor an ingestion pipeline runs per batch: null-rate
    * shifts, distinct-cardinality blowups/collapses, and min/max range
    * escapes, per column, from ONE [[profile]] pass per side joined on
    * the (cols-cardinality) profile rows. Doubles derive from exact
    * integers with identical operation order on both engines, so even
    * the deltas hash-match.
    *
    * Flag semantics: |null_frac_cur − null_frac_ref| > maxNullDelta, or
    * distinct cardinality changed by more than maxDistinctRatio in
    * either direction (a reference cardinality of 0 flags iff the
    * current one is nonzero), or the stringified min/max moved
    * (null-safe — an all-NULL column's NULL extremes compare equal).
    *
    * @return (column, n_rows_ref, n_rows_cur, null_frac_ref,
    *         null_frac_cur, null_frac_delta, n_distinct_ref,
    *         n_distinct_cur, extremes_moved, drift) */
  def profileDrift(ref: DataFrame, cur: DataFrame, cols: Seq[String],
      maxNullDelta: Double, maxDistinctRatio: Double): DataFrame = {
    require(maxNullDelta >= 0 && maxDistinctRatio >= 1.0)
    def side(df: DataFrame, s: String) = profile(df, cols).select(
      col("column"), col("n_rows").as(s"n_rows_$s"),
      col("null_frac").as(s"null_frac_$s"),
      col("n_distinct").as(s"n_distinct_$s"),
      col("min_val").as(s"__min_$s"), col("max_val").as(s"__max_$s"))
    val j = side(ref, "ref").join(side(cur, "cur"), "column")
    val extremesMoved =
      (!(col("__min_ref") <=> col("__min_cur")) ||
        !(col("__max_ref") <=> col("__max_cur"))).cast("long")
    val ratioDrift = when(col("n_distinct_ref") > 0,
      col("n_distinct_cur").cast("double") >
          col("n_distinct_ref").cast("double") * maxDistinctRatio ||
        col("n_distinct_cur").cast("double") * maxDistinctRatio <
          col("n_distinct_ref").cast("double"))
      .otherwise(col("n_distinct_cur") > 0)
    j.select(col("column"), col("n_rows_ref"), col("n_rows_cur"),
        col("null_frac_ref"), col("null_frac_cur"),
        (col("null_frac_cur") - col("null_frac_ref")).as("null_frac_delta"),
        col("n_distinct_ref"), col("n_distinct_cur"),
        extremesMoved.as("extremes_moved"),
        (abs(col("null_frac_cur") - col("null_frac_ref")) > maxNullDelta ||
          ratioDrift || extremesMoved === 1L).cast("long").as("drift"))
  }

  /** DuckDB oracle for [[profileDrift]]; `refSql`/`curSql` are table
    * names or parenthesized subqueries for the two snapshots. */
  def profileDriftOracleSql(refSql: String, curSql: String,
      cols: Seq[String], maxNullDelta: Double,
      maxDistinctRatio: Double): String = {
    val ratioDrift =
      s"""CASE WHEN n_distinct_ref > 0
         |  THEN CAST(n_distinct_cur AS DOUBLE) >
         |         CAST(n_distinct_ref AS DOUBLE) * $maxDistinctRatio
         |    OR CAST(n_distinct_cur AS DOUBLE) * $maxDistinctRatio <
         |         CAST(n_distinct_ref AS DOUBLE)
         |  ELSE n_distinct_cur > 0 END""".stripMargin
    val extremes =
      """(__min_ref IS DISTINCT FROM __min_cur
        | OR __max_ref IS DISTINCT FROM __max_cur)""".stripMargin
    s"""WITH pr AS (${profileOracleSql(refSql, cols)}),
      |pc AS (${profileOracleSql(curSql, cols)}),
      |j AS (
      |  SELECT pr."column", pr.n_rows AS n_rows_ref, pc.n_rows AS n_rows_cur,
      |         pr.null_frac AS null_frac_ref, pc.null_frac AS null_frac_cur,
      |         pr.n_distinct AS n_distinct_ref, pc.n_distinct AS n_distinct_cur,
      |         pr.min_val AS __min_ref, pc.min_val AS __min_cur,
      |         pr.max_val AS __max_ref, pc.max_val AS __max_cur
      |  FROM pr JOIN pc USING ("column")
      |)
      |SELECT "column", n_rows_ref, n_rows_cur, null_frac_ref, null_frac_cur,
      |       null_frac_cur - null_frac_ref AS null_frac_delta,
      |       n_distinct_ref, n_distinct_cur,
      |       CAST($extremes AS BIGINT) AS extremes_moved,
      |       CAST(abs(null_frac_cur - null_frac_ref) > $maxNullDelta
      |            OR ($ratioDrift) OR $extremes AS BIGINT) AS drift
      |FROM j""".stripMargin
  }

  /** Two-sample Kolmogorov–Smirnov test — the binning-free drift
    * verdict next to PSI (`psiDrift` needs reference deciles and reads
    * in "drift units"; KS needs NOTHING and reads as reject/accept):
    * D = max |F̂_a(v) − F̂_b(v)| over the pooled observed values.
    *
    * Exactness: both ECDFs advance only at observed values, so the max
    * runs over the pooled distinct-value histogram; the comparison is
    * the cross-multiplied integer `|cumA·n_b − cumB·n_a|` — D and its
    * argmax value are exact; D itself and the α = 0.05 threshold
    * `1.358·√((n_a+n_b)/(n_a·n_b))` are fixed IEEE readouts (1.358 is
    * a literal on both engines).
    *
    * Scale shape: one value-keyed histogram aggregation, one cumulative
    * window over distinct values, one global max fold. No row sorts.
    *
    * @return one row: (n_a, n_b, d_num, d, d_at, crit_05, reject_05) —
    *         d_num = (n_a·n_b)·D; d_at = smallest value achieving D
    */
  def ksTest(a: DataFrame, b: DataFrame, v: Column): DataFrame = {
    val ha = a.select(v.as("__v")).filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("ca"))
    val hb = b.select(v.as("__v")).filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("cb"))
    val merged = ha.join(hb, Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = merged
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .withColumn("diff",
        abs(col("cumA") * col("nb") - col("cumB") * col("na")))
    val top = cum
      .withColumn("__mx",
        max(col("diff")).over(wAll))
      .filter(col("diff") === col("__mx"))
      .groupBy(col("na"), col("nb"), col("diff").as("d_num"))
      .agg(min(col("__v")).as("d_at"))
    val d = col("d_num").cast("double") /
      (col("na").cast("double") * col("nb"))
    val crit = lit(1.358) * sqrt(
      (col("na") + col("nb")).cast("double") /
        (col("na").cast("double") * col("nb")))
    top.select(col("na").as("n_a"), col("nb").as("n_b"), col("d_num"),
      d.as("d"), col("d_at"), crit.as("crit_05"),
      (d > crit).as("reject_05"))
  }

  /** DuckDB oracle for [[ksTest]]: `aSql`/`bSql` yield one `v`. */
  def ksTestOracleSql(aSql: String, bSql: String): String =
    s"""WITH ha AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS ca FROM ($aSql)
       |  WHERE v IS NOT NULL GROUP BY 1
       |), hb AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS cb FROM ($bSql)
       |  WHERE v IS NOT NULL GROUP BY 1
       |), m AS (
       |  SELECT coalesce(ha.v, hb.v) AS v, coalesce(ca, 0) AS ca,
       |         coalesce(cb, 0) AS cb
       |  FROM ha FULL OUTER JOIN hb ON ha.v = hb.v
       |), c AS (
       |  SELECT v,
       |    CAST(sum(ca) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cumA,
       |    CAST(sum(cb) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cumB,
       |    CAST(sum(ca) OVER () AS BIGINT) AS na,
       |    CAST(sum(cb) OVER () AS BIGINT) AS nb
       |  FROM m
       |), dd AS (
       |  SELECT *, abs(cumA * nb - cumB * na) AS diff,
       |         max(abs(cumA * nb - cumB * na)) OVER () AS mx
       |  FROM c
       |), top AS (
       |  SELECT na, nb, diff AS d_num, min(v) AS d_at
       |  FROM dd WHERE diff = mx GROUP BY 1, 2, 3
       |)
       |SELECT na AS n_a, nb AS n_b, d_num,
       |       CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * nb) AS d,
       |       d_at,
       |       1.358 * sqrt(CAST(na + nb AS DOUBLE)
       |         / (CAST(na AS DOUBLE) * nb)) AS crit_05,
       |       CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * nb)
       |         > 1.358 * sqrt(CAST(na + nb AS DOUBLE)
       |             / (CAST(na AS DOUBLE) * nb)) AS reject_05
       |FROM top""".stripMargin

  /** Per-COLUMN entropy profile: each audited column's value-
    * distribution entropy via the integer identity
    * `h_q = n·blog(n) − Σ k·blog(k)` (the q176 character-entropy device
    * lifted to column values) — the key-ness/compressibility ranking a
    * bare NDV count muddles (NDV 2 at 50/50 and NDV 2 at 99/1 read very
    * differently here). NULL counts as a value. Staircase caveat: blog
    * jumps at powers of two, so NEAR-TIED distributions straddling a
    * 2^k boundary can swap order — the profile separates coarse
    * classes (constant / skewed / balanced / key-like), it is not a
    * precision entropy meter.
    *
    * One frequency aggregation per column, unioned — column count is
    * the fan-out, each leg map-side-combinable.
    *
    * @return per column: (column, n, n_distinct, entropy_q,
    *         entropy_bits) — entropy_bits = h_q/n, staircase-coarse
    *         bits per value
    */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val blog = (x: Column) => length(bin(x)).cast("long")
    val legs = cols.map { c =>
      df.groupBy(col(c)).agg(count(lit(1)).as("__k"))
        .agg(sum(col("__k")).as("n"), count(lit(1)).as("n_distinct"),
          sum(col("__k") * blog(col("__k"))).as("__skb"))
        .select(lit(c).as("column"), col("n"), col("n_distinct"),
          (col("n") * blog(col("n")) - col("__skb")).as("entropy_q"))
        .withColumn("entropy_bits",
          col("entropy_q").cast("double") / col("n"))
    }
    legs.reduce(_ unionAll _)
  }

  /** DuckDB oracle for [[columnEntropy]] over `table`. */
  def columnEntropyOracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", n, n_distinct,
         |       CAST(n * length(bin(n)) - skb AS BIGINT) AS entropy_q,
         |       CAST(n * length(bin(n)) - skb AS DOUBLE) / n
         |         AS entropy_bits
         |FROM (
         |  SELECT CAST(sum(k) AS BIGINT) AS n,
         |         CAST(count(*) AS BIGINT) AS n_distinct,
         |         CAST(sum(k * length(bin(k))) AS BIGINT) AS skb
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS k
         |        FROM $table GROUP BY $c)
         |)""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** COHEN'S KAPPA — chance-corrected agreement between two labelers
    * (declared vs detected language, two annotators, model vs rule):
    * `κ = (p_o − p_e)/(1 − p_e)` from the agreement diagonal and the
    * margin products — the one-number summary of the q249 confusion
    * matrix, honest about imbalance where raw accuracy flatters the
    * majority class.
    *
    * Exact integer diagonal/margins; κ in one fixed IEEE sequence,
    * NULL when p_e = 1 (both sides constant — agreement is vacuous).
    *
    * @return one row: (n, n_agree, po, pe, kappa)
    */
  def cohensKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("__a"), bCol.as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("nij"))
    val margins = cells.groupBy(col("__a")).agg(sum(col("nij")).as("ai"))
      .join(cells.groupBy(col("__b")).agg(sum(col("nij")).as("bj")),
        col("__a") === col("__b"), "full_outer")
      .select(coalesce(col("ai"), lit(0L)).as("ai"),
        coalesce(col("bj"), lit(0L)).as("bj"))
      .agg(sum(col("ai") * col("bj")).as("pe_num"))
    val top = cells.agg(sum(col("nij")).as("n"),
      sum(when(col("__a") === col("__b"), col("nij")).otherwise(0L))
        .as("n_agree"))
    val j = top.crossJoin(broadcast(margins))
    val po = col("n_agree").cast("double") / col("n")
    val pe = col("pe_num").cast("double") /
      (col("n").cast("double") * col("n"))
    j.select(col("n"), col("n_agree"), po.as("po"), pe.as("pe"),
      when(abs(lit(1.0) - pe) > 0, (po - pe) / (lit(1.0) - pe))
        .as("kappa"))
  }

  /** DuckDB oracle for [[cohensKappa]]: `innerSql` yields (a, b). */
  def cohensKappaOracleSql(innerSql: String): String =
    s"""WITH cells AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS nij
       |  FROM ($innerSql) WHERE a IS NOT NULL AND b IS NOT NULL
       |  GROUP BY 1, 2
       |), am AS (SELECT a AS lab, CAST(sum(nij) AS BIGINT) AS ai
       |          FROM cells GROUP BY 1),
       |bm AS (SELECT b AS lab, CAST(sum(nij) AS BIGINT) AS bj
       |       FROM cells GROUP BY 1),
       |mg AS (
       |  SELECT CAST(sum(coalesce(ai, 0) * coalesce(bj, 0)) AS BIGINT)
       |    AS pe_num
       |  FROM am FULL OUTER JOIN bm USING (lab)
       |), top AS (
       |  SELECT CAST(sum(nij) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN a = b THEN nij ELSE 0 END) AS BIGINT)
       |           AS n_agree
       |  FROM cells
       |)
       |SELECT n, n_agree,
       |       CAST(n_agree AS DOUBLE) / n AS po,
       |       CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS pe,
       |       CASE WHEN abs(1.0 - CAST(pe_num AS DOUBLE)
       |           / (CAST(n AS DOUBLE) * n)) > 0 THEN
       |         (CAST(n_agree AS DOUBLE) / n - CAST(pe_num AS DOUBLE)
       |           / (CAST(n AS DOUBLE) * n))
       |         / (1.0 - CAST(pe_num AS DOUBLE)
       |           / (CAST(n AS DOUBLE) * n))
       |       END AS kappa
       |FROM top CROSS JOIN mg""".stripMargin

  /** Per-row SURPRISAL score: Σ over audited columns of the value's
    * information content `blog(N) − blog(n_value)` — "how unusual is
    * this row", the multi-column outlier triage that single-column
    * z-scores (q07) and pure-numeric Mahalanobis (q199) both miss
    * (it reads categoricals natively, NULL included as a value). The
    * bit-length log keeps every term an exact long (the q130/q238
    * device: staircase-coarse in value, faithful in ORDER — and
    * ranking is all a triage queue consumes).
    *
    * Scale shape: one frequency aggregation per column (aggregate-
    * sized, broadcast back on a NULL-safe key), one row-wise sum, the
    * fused global top-k.
    *
    * @return top `k` rows: (idCol, surprisal_q) by (score desc, id)
    */
  def rowSurprisal(df: DataFrame, idCol: String, cols: Seq[String],
      k: Int = 50): DataFrame = {
    require(cols.nonEmpty && k >= 1)
    val blog = (x: Column) => length(bin(x)).cast("long")
    val base = df.select((col(idCol) +: cols.map(col)): _*)
    val nRow = base.agg(count(lit(1)).as("__N"))
    val withTerms = cols.zipWithIndex.foldLeft(
      base.crossJoin(broadcast(nRow))) { case (acc, (c, i)) =>
      val freq = base.groupBy(col(c)).agg(count(lit(1)).as(s"__n$i"))
      acc.join(broadcast(freq.withColumnRenamed(c, s"__v$i")),
        col(c) <=> col(s"__v$i"))
        .withColumn(s"__t$i", blog(col("__N")) - blog(col(s"__n$i")))
    }
    withTerms
      .withColumn("surprisal_q",
        cols.indices.map(i => col(s"__t$i")).reduce(_ + _))
      .select(col(idCol), col("surprisal_q"))
      .orderBy(col("surprisal_q").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB oracle for [[rowSurprisal]]: `innerSql` yields
    * (`idName`, cols...). */
  def rowSurprisalOracleSql(innerSql: String, idName: String,
      cols: Seq[String], k: Int = 50): String = {
    val freqs = cols.zipWithIndex.map { case (c, i) =>
      s"""f$i AS (
         |  SELECT $c AS v$i, CAST(count(*) AS BIGINT) AS n$i
         |  FROM b GROUP BY 1
         |)""".stripMargin
    }.mkString(", ")
    val joins = cols.zipWithIndex.map { case (c, i) =>
      s"JOIN f$i ON b.$c IS NOT DISTINCT FROM f$i.v$i"
    }.mkString("\n|")
    val terms = cols.indices.map(i =>
      "(length(bin((SELECT count(*) FROM b))) - length(bin(n" + i + ")))")
      .mkString(" + ")
    s"""WITH b AS ($innerSql), $freqs
       |SELECT $idName, CAST($terms AS BIGINT) AS surprisal_q
       |FROM b
       |$joins
       |ORDER BY surprisal_q DESC, $idName LIMIT $k""".stripMargin
  }

  /** 1-D Wasserstein (earth-mover) distance between two samples — the
    * MAGNITUDE companion to [[ksTest]]'s max-gap verdict: how much
    * probability mass moved how far, in the metric's own units
    * (W₁ = ∫|F̂_a − F̂_b|). KS barely moves when a whole distribution
    * shifts slightly; W₁ is exactly that shift.
    *
    * Exact: over the pooled distinct values, W₁·(n_a·n_b) =
    * Σ |cumA·n_b − cumB·n_a| · (v_{i+1} − v_i) is an exact integer fold
    * (the KS histogram with a gap-width weight); one IEEE division
    * reads it out.
    *
    * @return one row: (n_a, n_b, w1_num, w1) — w1 in value units
    */
  def wasserstein1(a: DataFrame, b: DataFrame, v: Column): DataFrame = {
    val ha = a.select(v.as("__v")).filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("ca"))
    val hb = b.select(v.as("__v")).filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("cb"))
    val merged = ha.join(hb, Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
    val wCum = wOrd.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    merged
      .withColumn("cumA", sum(col("ca")).over(wCum))
      .withColumn("cumB", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .withColumn("gap", lead(col("__v"), 1).over(wOrd) - col("__v"))
      .filter(col("gap").isNotNull)
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(abs(col("cumA") * col("nb") - col("cumB") * col("na")) *
          col("gap")).as("w1_num"))
      .withColumn("w1",
        col("w1_num").cast("double") /
          (col("n_a").cast("double") * col("n_b")))
  }

  /** DuckDB oracle for [[wasserstein1]]: `aSql`/`bSql` yield one `v`. */
  def wasserstein1OracleSql(aSql: String, bSql: String): String =
    s"""WITH ha AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS ca FROM ($aSql)
       |  WHERE v IS NOT NULL GROUP BY 1
       |), hb AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS cb FROM ($bSql)
       |  WHERE v IS NOT NULL GROUP BY 1
       |), m AS (
       |  SELECT coalesce(ha.v, hb.v) AS v, coalesce(ca, 0) AS ca,
       |         coalesce(cb, 0) AS cb
       |  FROM ha FULL OUTER JOIN hb ON ha.v = hb.v
       |), c AS (
       |  SELECT v,
       |    CAST(sum(ca) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cumA,
       |    CAST(sum(cb) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cumB,
       |    CAST(sum(ca) OVER () AS BIGINT) AS na,
       |    CAST(sum(cb) OVER () AS BIGINT) AS nb,
       |    lead(v) OVER (ORDER BY v) - v AS gap
       |  FROM m
       |), s AS (
       |  SELECT max(na) AS n_a, max(nb) AS n_b,
       |         CAST(sum(abs(cumA * nb - cumB * na) * gap) AS BIGINT)
       |           AS w1_num
       |  FROM c WHERE gap IS NOT NULL
       |)
       |SELECT n_a, n_b, w1_num,
       |       CAST(w1_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b) AS w1
       |FROM s""".stripMargin

  /** Order-invariant TABLE DIGEST: one 60-bit XOR fold of per-row
    * portable hashes — "are these two tables row-identical" as a single
    * number, without sorting or comparing anything (migration
    * verification, incremental-view equality, cross-engine parity —
    * exactly what this repo's own oracle gate does, as a composable
    * operator). XOR is commutative/associative, so the digest is
    * independent of partitioning and row order; a multiset caveat
    * applies (two identical rows cancel — include a unique key among
    * `cols` to make rows distinct, which real tables have).
    *
    * @param cols columns rendered `CAST(col AS STRING)` and joined with
    *             `'|'` — long/string/date columns render identically on
    *             both engines (avoid raw doubles; quantize first)
    * @return one row: (n_rows, digest)
    */
  def tableDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    // per-column coalesce BEFORE concat_ws: bare concat_ws SKIPS null
    // columns (separator and all), which would both collide NULL with
    // absent and diverge from the oracle's coalesce rendering
    val rendered = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    df.select(graft.functions.Hash64.hash60(rendered).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(bit_xor(col("__h")), lit(0L)).as("digest"))
  }

  /** DuckDB oracle for [[tableDigest]]: `innerSql` yields the columns;
    * `cols` render as in Spark (NULLs become empty via concat_ws
    * semantics — mirrored with coalesce). */
  def tableDigestOracleSql(innerSql: String, cols: Seq[String]): String = {
    val rendered = cols.map(c => s"coalesce(CAST($c AS VARCHAR), '')")
      .mkString(" || '|' || ")
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(coalesce(bit_xor(${graft.functions.Hash64.duckSql(
          s"($rendered)")}), 0) AS BIGINT) AS digest
       |FROM ($innerSql)""".stripMargin
  }

  /** Chapman capture–recapture estimate: the true population size
    * inferred from TWO independent incomplete samples and their
    * overlap, `N̂ = (n_a+1)(n_b+1)/(m+1) − 1` — the ecology estimator
    * that answers corpus questions no single scan can ("how many
    * distinct users/dups exist INCLUDING the ones neither sample
    * caught"). Exact integer division for the point estimate (the
    * bias-corrected Chapman form), double readout alongside.
    *
    * @return one row: (n_a, n_b, m_overlap, n_hat, n_hat_d) — NULL
    *         estimate when the overlap is empty (independence broken
    *         or samples too small; no finite estimate exists)
    */
  def chapmanEstimate(a: DataFrame, b: DataFrame, keyCols: Seq[String])
      : DataFrame = {
    val da = a.select(keyCols.map(col): _*).distinct()
    val db = b.select(keyCols.map(col): _*).distinct()
    val na = da.agg(count(lit(1)).as("n_a"))
    val nb = db.agg(count(lit(1)).as("n_b"))
    val m = da.join(db, keyCols).agg(count(lit(1)).as("m_overlap"))
    na.crossJoin(broadcast(nb)).crossJoin(broadcast(m))
      .withColumn("n_hat",
        when(col("m_overlap") > 0,
          expr("(n_a + 1) * (n_b + 1) div (m_overlap + 1) - 1")))
      .withColumn("n_hat_d",
        when(col("m_overlap") > 0,
          (col("n_a") + 1).cast("double") * (col("n_b") + 1) /
            (col("m_overlap") + 1) - 1.0))
  }

  /** DuckDB oracle for [[chapmanEstimate]]: `aSql`/`bSql` yield the
    * key columns. */
  def chapmanOracleSql(aSql: String, bSql: String,
      keyCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    s"""WITH da AS (SELECT DISTINCT $keys FROM ($aSql)),
       |db AS (SELECT DISTINCT $keys FROM ($bSql)),
       |s AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM da) AS n_a,
       |         (SELECT CAST(count(*) AS BIGINT) FROM db) AS n_b,
       |         (SELECT CAST(count(*) AS BIGINT)
       |          FROM da JOIN db USING ($keys)) AS m_overlap
       |)
       |SELECT n_a, n_b, m_overlap,
       |       CASE WHEN m_overlap > 0 THEN
       |         CAST((n_a + 1) * (n_b + 1) // (m_overlap + 1) - 1
       |           AS BIGINT) END AS n_hat,
       |       CASE WHEN m_overlap > 0 THEN
       |         CAST(n_a + 1 AS DOUBLE) * (n_b + 1) / (m_overlap + 1)
       |           - 1.0 END AS n_hat_d
       |FROM s""".stripMargin
  }

  /** Benford first-significant-digit audit of a positive exact-integer
    * metric column: observed digit frequencies against the Benford
    * expectation log10(1 + 1/d) — the classic fabricated-data /
    * truncated-distribution screen for financial-style metrics spanning
    * several orders of magnitude.
    *
    * Exactness: digit counts are integers; the observed fraction and
    * deviation are derived with one fixed IEEE sequence
    * (`n/total − expected`) from integer counts and LITERAL expected
    * constants, so both engines produce bit-equal doubles (log10 itself
    * is not correctly-rounded portable — the literals are).
    *
    * Scale shape: one map-side-combinable digit aggregation (9 groups),
    * total re-derived by summing the 9-row digit frame and broadcast back
    * (the sanctioned one-row stat-broadcast idiom — never a collect).
    *
    * @param cents positive exact-integer column (zero/negative rows are
    *              excluded — they have no first significant digit)
    */
  def benfordAudit(df: DataFrame, cents: Column): DataFrame = {
    val digits = df.filter(cents > 0)
      .groupBy(substring(cents.cast("string"), 1, 1).as("digit"))
      .agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("total"))
    val expected = benfordExpected.tail.zipWithIndex.foldLeft(
      when(col("digit") === "1", lit(benfordExpected.head))) {
        case (acc, (e, i)) => acc.when(col("digit") === (i + 2).toString, lit(e))
      }
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("total")).as("obs_frac"),
        expected.as("expected"))
      .withColumn("deviation", abs(col("obs_frac") - col("expected")))
  }

  /** Population Stability Index between a reference and a current batch
    * of an integer metric, over equal-frequency bins derived from the
    * REFERENCE distribution ([[Quantiles.histogramCuts]] — the bins are
    * the baseline's coordinates, which is what makes PSI comparable
    * release-over-release). THE standard ML-monitoring drift number:
    * < 0.1 stable, 0.1–0.25 shifting, > 0.25 retrain.
    *
    * Exact integer formulation: per-bin counts Laplace-smoothed (+1, so
    * empty bins never hit a log singularity — standard PSI practice),
    * converted to micro-probabilities by integer division, and each
    * bin's `(P−Q)·ln(P/Q)` term quantized as `(P−Q)·(blog(P)−blog(Q))`
    * with the bit-length log (blog = ⌊log2⌋+1 — order-preserving, so
    * every term keeps PSI's non-negativity). `term_q` sums to the
    * quantized PSI in micro-log2 units; ÷1e6 ≈ log2-PSI.
    *
    * Scale shape: cut derivation is value-cardinality-bounded (the q84
    * machinery), both batches then take one bin aggregation each, and
    * the comparison frame is |bins| rows.
    *
    * @return (bin, ref_n, cur_n, p_ref_micro, p_cur_micro, term_q) —
    *         one row per bin present in either batch
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, v: Column,
      qs: Seq[(Int, Int)]): DataFrame = {
    val blog = (x: Column) => length(bin(x)).cast("long")
    val cuts = Quantiles.histogramCuts(ref, v, qs)
    def binCounts(df: DataFrame, cname: String): DataFrame =
      Quantiles.binByCuts(df.select(v.as("__v")), col("__v"), cuts)
        .filter(col("bin").isNotNull)
        .groupBy(col("bin")).agg(count(lit(1)).as(cname))
    val joined = binCounts(ref, "ref_n")
      .join(binCounts(cur, "cur_n"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val nBins = qs.size + 1
    val withP = joined
      .withColumn("__tr", sum("ref_n").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__tc", sum("cur_n").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("p_ref_micro",
        expr(s"((ref_n + 1) * 1000000) div (__tr + $nBins)"))
      .withColumn("p_cur_micro",
        expr(s"((cur_n + 1) * 1000000) div (__tc + $nBins)"))
    withP
      .withColumn("term_q",
        (col("p_cur_micro") - col("p_ref_micro")) *
          (blog(col("p_cur_micro")) - blog(col("p_ref_micro"))))
      .drop("__tr", "__tc")
  }

  /** PSI TIME SERIES — [[psiDrift]] per period: every period binned in
    * the SAME fixed reference-decile coordinates, one PSI per period —
    * the drift MONITOR (a single ref-vs-now PSI says "drifted"; the
    * series says WHEN it started and whether it is still moving).
    * Laplace-smoothed integer micro-probabilities and bit-length-log
    * terms per the q196 contract; a period distributed like the
    * reference reads exactly 0.
    *
    * @return per period: (period, n, psi_q, psi_bits) — psi_bits =
    *         psi_q/1e12-ish display scale matching q196's convention
    *         (psi_q/1e6/1e6... the raw summed quantized terms over 1e12)
    */
  def psiSeries(ref: DataFrame, cur: DataFrame, v: Column,
      periodCol: Column, qs: Seq[(Int, Int)]): DataFrame = {
    val blog = (x: Column) => length(bin(x)).cast("long")
    val cuts = Quantiles.histogramCuts(ref, v, qs)
    val nBins = qs.size + 1
    val refBins = Quantiles.binByCuts(ref.select(v.as("__v")),
        col("__v"), cuts)
      .filter(col("bin").isNotNull)
      .groupBy(col("bin")).agg(count(lit(1)).as("ref_n"))
      .withColumn("__tr", sum("ref_n").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("p_ref_micro",
        expr(s"((ref_n + 1) * 1000000) div (__tr + $nBins)"))
      .select(col("bin"), col("p_ref_micro"))
    val curBins = Quantiles.binByCuts(
        cur.select(periodCol.as("__w"), v.as("__v")), col("__v"), cuts)
      .filter(col("bin").isNotNull && col("__w").isNotNull)
      .groupBy(col("__w"), col("bin")).agg(count(lit(1)).as("cur_n"))
    // densify over (period × observed ref bins) so empty bins carry
    // the smoothed floor instead of silently vanishing
    val periods = curBins.select(col("__w")).distinct()
    val dense = periods.crossJoin(broadcast(refBins))
      .join(curBins, Seq("__w", "bin"), "left")
      .select(col("__w"), col("bin"), col("p_ref_micro"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val wPer = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__w"))
    dense
      .withColumn("__tc", sum(col("cur_n")).over(wPer))
      .withColumn("p_cur_micro",
        expr(s"((cur_n + 1) * 1000000) div (__tc + $nBins)"))
      .withColumn("term_q",
        (col("p_cur_micro") - col("p_ref_micro")) *
          (blog(col("p_cur_micro")) - blog(col("p_ref_micro"))))
      .groupBy(col("__w").as("period"))
      .agg(sum(col("cur_n")).as("n"), sum(col("term_q")).as("psi_q"))
      .withColumn("psi_bits",
        col("psi_q").cast("double") / lit(1000000.0) / lit(1000000.0))
  }

  /** DuckDB oracle for [[psiSeries]]: `refSql` yields one `v`,
    * `curSql` yields (w, v). */
  def psiSeriesOracleSql(refSql: String, curSql: String,
      qs: Seq[(Int, Int)]): String = {
    val cutSel = qs.map { case (num, den) =>
      s"min(CASE WHEN cum * $den >= n * $num THEN val END)" +
        s" AS c${num * 100 / den}"
    }.mkString(", ")
    val binSum = qs.map { case (num, den) =>
      s"(CASE WHEN v > c${num * 100 / den} THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    val nBins = qs.size + 1
    s"""WITH refv AS (SELECT v FROM ($refSql) WHERE v IS NOT NULL),
       |h AS (
       |  SELECT v AS val, CAST(count(*) AS BIGINT) AS c
       |  FROM refv GROUP BY 1
       |), cum0 AS (
       |  SELECT val,
       |    CAST(sum(c) OVER (ORDER BY val
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum,
       |    CAST(sum(c) OVER () AS BIGINT) AS n
       |  FROM h
       |), cuts AS (SELECT $cutSel FROM cum0),
       |rb AS (
       |  SELECT CAST($binSum AS BIGINT) AS bin,
       |         CAST(count(*) AS BIGINT) AS ref_n
       |  FROM refv CROSS JOIN cuts GROUP BY 1
       |), rp AS (
       |  SELECT bin,
       |    CAST(((ref_n + 1) * 1000000)
       |      // ((SELECT sum(ref_n) FROM rb) + $nBins) AS BIGINT)
       |      AS p_ref_micro
       |  FROM rb
       |), cb AS (
       |  SELECT w, CAST($binSum AS BIGINT) AS bin,
       |         CAST(count(*) AS BIGINT) AS cur_n
       |  FROM ($curSql) CROSS JOIN cuts
       |  WHERE v IS NOT NULL AND w IS NOT NULL GROUP BY 1, 2
       |), dense AS (
       |  SELECT p.w, rp.bin, rp.p_ref_micro,
       |         coalesce(cb.cur_n, 0) AS cur_n
       |  FROM (SELECT DISTINCT w FROM cb) p
       |  CROSS JOIN rp
       |  LEFT JOIN cb ON cb.w = p.w AND cb.bin = rp.bin
       |), wp AS (
       |  SELECT *, CAST(sum(cur_n) OVER (PARTITION BY w) AS BIGINT)
       |    AS tc
       |  FROM dense
       |), terms AS (
       |  SELECT w, cur_n,
       |    (CAST(((cur_n + 1) * 1000000) // (tc + $nBins) AS BIGINT)
       |      - p_ref_micro)
       |    * (length(bin(((cur_n + 1) * 1000000) // (tc + $nBins)))
       |      - length(bin(p_ref_micro))) AS term_q
       |  FROM wp
       |)
       |SELECT w AS period, CAST(sum(cur_n) AS BIGINT) AS n,
       |       CAST(sum(term_q) AS BIGINT) AS psi_q,
       |       CAST(sum(term_q) AS DOUBLE) / 1000000.0 / 1000000.0
       |         AS psi_bits
       |FROM terms GROUP BY 1""".stripMargin
  }

  /** STANDARDIZED MEAN DIFFERENCE balance audit: per numeric column,
    * `SMD = (μ_a − μ_b) / √((σ²_a + σ²_b)/2)` between two slices — the
    * covariate-balance diagnostic (|SMD| < 0.1 ≈ balanced) that
    * decides whether a sample represents its population or a matched
    * control group actually matches. Exact integer sums per column,
    * fixed IEEE readout; NULL on zero-variance columns.
    *
    * @param cols integer-valued columns (quantize upstream)
    * @return per column: (column, n_a, n_b, mean_a, mean_b, smd)
    */
  def smdAudit(a: DataFrame, b: DataFrame, cols: Seq[String])
      : DataFrame = {
    require(cols.nonEmpty)
    def stats(df: DataFrame, sfx: String, c: String) = df
      .select(col(c).as("__v")).filter(col("__v").isNotNull)
      .agg(count(lit(1)).as(s"n_$sfx"), sum(col("__v")).as(s"s_$sfx"),
        sum(col("__v") * col("__v")).as(s"ss_$sfx"))
    val legs = cols.map { c =>
      def mu(s: String, n: String) = col(s).cast("double") / col(n)
      def vr(s: String, ss: String, n: String) =
        (col(ss).cast("double") -
          col(s).cast("double") * col(s).cast("double") / col(n)) /
          (col(n) - 1)
      val va = vr("s_a", "ss_a", "n_a")
      val vb = vr("s_b", "ss_b", "n_b")
      stats(a, "a", c).crossJoin(broadcast(stats(b, "b", c)))
        .select(lit(c).as("column"), col("n_a"), col("n_b"),
          mu("s_a", "n_a").as("mean_a"), mu("s_b", "n_b").as("mean_b"),
          when((va + vb) / 2.0 > 0,
            (mu("s_a", "n_a") - mu("s_b", "n_b")) /
              sqrt((va + vb) / 2.0)).as("smd"))
    }
    legs.reduce(_ unionAll _)
  }

  /** DuckDB oracle for [[smdAudit]]: `aSql`/`bSql` yield the columns. */
  def smdAuditOracleSql(aSql: String, bSql: String,
      cols: Seq[String]): String =
    cols.map { c =>
      def stats(src: String, sfx: String) =
        s"""SELECT CAST(count(*) AS BIGINT) AS n_$sfx,
           |       CAST(sum(__v) AS BIGINT) AS s_$sfx,
           |       CAST(sum(__v * __v) AS BIGINT) AS ss_$sfx
           |FROM (SELECT $c AS __v FROM ($src) WHERE $c IS NOT NULL)"""
          .stripMargin
      def mu(s: String, n: String) = s"CAST($s AS DOUBLE) / $n"
      def vr(s: String, ss: String, n: String) =
        s"(CAST($ss AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE)" +
          s" / $n) / ($n - 1)"
      val va = vr("s_a", "ss_a", "n_a")
      val vb = vr("s_b", "ss_b", "n_b")
      s"""SELECT '$c' AS "column", n_a, n_b,
         |       ${mu("s_a", "n_a")} AS mean_a,
         |       ${mu("s_b", "n_b")} AS mean_b,
         |       CASE WHEN (($va) + ($vb)) / 2.0 > 0 THEN
         |         (${mu("s_a", "n_a")} - ${mu("s_b", "n_b")})
         |           / sqrt((($va) + ($vb)) / 2.0)
         |       END AS smd
         |FROM (${stats(aSql, "a")}) CROSS JOIN (${stats(bSql, "b")})"""
        .stripMargin
    }.mkString("\nUNION ALL\n")

  /** NEW-CATEGORY drift detector: values of a column appearing in the
    * CURRENT slice that the reference slice never saw — the
    * enum/allowlist break (new country code, renamed event type,
    * upstream schema change) that distribution tests blur into "some
    * drift". One anti-join per column over aggregate-sized value sets.
    *
    * @return per novel value: (column, value, n_cur) — value rendered
    *         as string
    */
  def newCategories(ref: DataFrame, cur: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val legs = cols.map { c =>
      val refVals = ref.select(col(c).cast("string").as("value"))
        .filter(col("value").isNotNull).distinct()
      cur.select(col(c).cast("string").as("value"))
        .filter(col("value").isNotNull)
        .groupBy(col("value")).agg(count(lit(1)).as("n_cur"))
        .join(refVals, Seq("value"), "left_anti")
        .select(lit(c).as("column"), col("value"), col("n_cur"))
    }
    legs.reduce(_ unionAll _)
  }

  /** DuckDB oracle for [[newCategories]]: `refSql`/`curSql` yield the
    * columns. */
  def newCategoriesOracleSql(refSql: String, curSql: String,
      cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", CAST($c AS VARCHAR) AS value,
         |       CAST(count(*) AS BIGINT) AS n_cur
         |FROM ($curSql) WHERE $c IS NOT NULL
         |  AND CAST($c AS VARCHAR) NOT IN (
         |    SELECT DISTINCT CAST($c AS VARCHAR) FROM ($refSql)
         |    WHERE $c IS NOT NULL)
         |GROUP BY 2""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** DuckDB oracle for [[psiDrift]]: `refSql`/`curSql` must each yield
    * a single integer column `v`; cut/bin fragments mirror the q84
    * oracle recipe. */
  def psiDriftOracleSql(refSql: String, curSql: String,
      qs: Seq[(Int, Int)]): String = {
    val cutSel = qs.map { case (num, den) =>
      s"min(CASE WHEN cum * $den >= n * $num THEN val END) AS c${num * 100 / den}"
    }.mkString(", ")
    val binSum = qs.map { case (num, den) =>
      s"(CASE WHEN v > c${num * 100 / den} THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    val nBins = qs.size + 1
    s"""WITH refv AS ($refSql), curv AS ($curSql),
       |cuts AS (
       |  SELECT $cutSel FROM (
       |    SELECT val, CAST(sum(k) OVER (ORDER BY val) AS BIGINT) AS cum
       |    FROM (SELECT v AS val, count(*) AS k FROM refv
       |          WHERE v IS NOT NULL GROUP BY 1)
       |  ), (SELECT CAST(count(*) AS BIGINT) AS n FROM refv
       |      WHERE v IS NOT NULL)
       |), rb AS (
       |  SELECT CAST($binSum AS BIGINT) AS bin,
       |         CAST(count(*) AS BIGINT) AS ref_n
       |  FROM refv, cuts WHERE v IS NOT NULL GROUP BY 1
       |), cb AS (
       |  SELECT CAST($binSum AS BIGINT) AS bin,
       |         CAST(count(*) AS BIGINT) AS cur_n
       |  FROM curv, cuts WHERE v IS NOT NULL GROUP BY 1
       |), j AS (
       |  SELECT coalesce(rb.bin, cb.bin) AS bin,
       |         coalesce(ref_n, 0) AS ref_n, coalesce(cur_n, 0) AS cur_n
       |  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin
       |), t AS (
       |  SELECT *, CAST(sum(ref_n) OVER () AS BIGINT) AS tr,
       |         CAST(sum(cur_n) OVER () AS BIGINT) AS tc
       |  FROM j
       |), p AS (
       |  SELECT bin, ref_n, cur_n,
       |         CAST((ref_n + 1) * 1000000 // (tr + $nBins) AS BIGINT)
       |           AS p_ref_micro,
       |         CAST((cur_n + 1) * 1000000 // (tc + $nBins) AS BIGINT)
       |           AS p_cur_micro
       |  FROM t
       |)
       |SELECT bin, ref_n, cur_n, p_ref_micro, p_cur_micro,
       |       CAST((p_cur_micro - p_ref_micro)
       |         * (length(bin(p_cur_micro)) - length(bin(p_ref_micro)))
       |         AS BIGINT) AS term_q
       |FROM p""".stripMargin
  }

  /** Benford expected fractions log10(1+1/d), d = 1..9, as fixed literals
    * (17 significant digits — both engines parse to the identical double). */
  val benfordExpected: Seq[Double] = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** DuckDB oracle for [[benfordAudit]] over `table.centsExpr`. */
  def benfordOracleSql(table: String, centsExpr: String): String = {
    val values = benfordExpected.zipWithIndex
      .map { case (e, i) => s"('${i + 1}', $e)" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT substr(CAST($centsExpr AS VARCHAR), 1, 1) AS digit,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM $table WHERE $centsExpr > 0 GROUP BY 1
       |), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d),
       |e(digit, expected) AS (VALUES $values)
       |SELECT d.digit, d.n, CAST(d.n AS DOUBLE) / t.total AS obs_frac,
       |       e.expected,
       |       abs(CAST(d.n AS DOUBLE) / t.total - e.expected) AS deviation
       |FROM d CROSS JOIN t JOIN e ON e.digit = d.digit""".stripMargin
  }
}
