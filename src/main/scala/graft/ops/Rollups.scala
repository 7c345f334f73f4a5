package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucketed and dimensional rollups.
  *
  * A3 hourly rollup (`/root/reference/spark_apps/advanced_analytics.py:236-248`
  * — the reference buckets by `date_format(ts, "yyyy-MM-dd HH")` string
  * truncation, P12), A4 map-difficulty (`:254-263`), A6/§2.8 the Grafana
  * read-side tumbling-window aggregates, O4 time-ordered limit.
  *
  * Scale notes:
  *  - rollups are partial+final hash aggregations; the shuffle carries one
  *    row per (bucket, dims) per mapper.
  *  - `countDistinct` is exact as the reference's is
  *    (`advanced_analytics.py:241`); it adds an Expand + second aggregation.
  *    At 100 TB prefer `approx_count_distinct` (HLL) unless exactness is
  *    contractual.
  *  - O4 `orderBy().limit(k)` plans as TakeOrderedAndProject: per-partition
  *    heaps, k-row merge at the driver — no global sort shuffle.
  */
object Rollups {

  /** Shared rollup body — exact and sketch forms differ only in the
    * unique-users aggregate, so the shape lives once. */
  private def rollupWith(df: DataFrame, ts: Column, dims: Seq[Column],
      uniqueUsers: Column): DataFrame =
    df.withColumn("hour", date_format(ts, "yyyy-MM-dd HH"))
      .groupBy(col("hour") +: dims: _*)
      .agg(
        count(lit(1)).as("total_events"),
        uniqueUsers.as("unique_users"),
        sum(col("__cents")).as("sum_cents"))
      .withColumn("avg_value", Exact.avgFromCents(col("sum_cents"), col("total_events")))
      .drop("sum_cents")

  /** A3/P12: reference-shaped hourly rollup keyed by a string hour bucket
    * plus dimension columns. Metric averages derive from exact cents sums. */
  def hourlyRollup(df: DataFrame, ts: Column, dims: Seq[Column], userId: Column,
      valueCents: Column): DataFrame =
    rollupWith(df.withColumn("__cents", valueCents), ts, dims, countDistinct(userId))

  /** A3 at scale: [[hourlyRollup]] with the exact distinct count replaced
    * by the HLL++ sketch. Exact `countDistinct` plans an Expand + second
    * aggregation — every (bucket, user) pair crosses the shuffle; the
    * sketch is a fixed-size mergeable buffer per group, combined map-side,
    * with relative error ≤ `rsd`. Sketch internals differ per engine so
    * there is no DuckDB oracle; RollupsSpec bounds it against the exact
    * count instead. */
  def hourlyRollupApprox(df: DataFrame, ts: Column, dims: Seq[Column],
      userId: Column, valueCents: Column, rsd: Double = 0.02): DataFrame =
    rollupWith(df.withColumn("__cents", valueCents), ts, dims,
      approx_count_distinct(userId, rsd))

  /** A6/§2.8: tumbling event-time window aggregate (the engine-native form
    * the reference approximates with string truncation). `last` semantics
    * are made deterministic via `max_by` on a unique sequence column. */
  def windowAgg(df: DataFrame, ts: Column, width: String, dims: Seq[Column],
      valueCol: Column, valueCents: Column, seqCol: Column): DataFrame =
    df.groupBy(window(ts, width) +: dims: _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(valueCents).as("sum_cents"),
        max_by(valueCol, seqCol).as("last_value"))
      .withColumn("avg_value", Exact.avgFromCents(col("sum_cents"), col("n_events")))
      .select(col("window.start").as("window_start") +: dims :+
        col("n_events") :+ col("avg_value") :+ col("last_value"): _*)

  /** A6 + dense buckets: [[windowAgg]] left-joined onto a generated time
    * spine so EMPTY buckets surface as null-metric rows — the engine form
    * of the reference dashboards' `GROUP BY time(1h) fill(null)`
    * (`monitoring/grafana/provisioning/dashboards/advanced_analytics_dashboard.json:55,103,217,426`),
    * which every round-2 rollup silently dropped.
    *
    * Scale shape: the spine derives from the ALREADY-AGGREGATED sparse
    * frame (min/max bucket → `sequence()` → explode), and the spine ×
    * distinct-dims product is dashboard-sized (buckets × dims), so both
    * sides of the final join are small; the raw corpus is touched once, by
    * the underlying [[windowAgg]]. fill(null) semantics: metrics of empty
    * buckets are null, not zero — a dashboard must distinguish "no events"
    * from "events averaging zero". */
  def denseWindowAgg(df: DataFrame, ts: Column, width: String, dims: Seq[Column],
      valueCol: Column, valueCents: Column, seqCol: Column): DataFrame =
    densify(windowAgg(df, ts, width, dims, valueCol, valueCents, seqCol), width)

  /** Densify an already-aggregated sparse rollup (shape of [[windowAgg]]:
    * window_start, dims..., 3 metric columns). CACHING CONTRACT: `sparse`
    * feeds three plan arms (spine bounds, dim values, join right side) and
    * column pruning makes the three subplans non-identical, so exchange
    * reuse can NOT unify them — an unpersisted frame re-scans its source
    * three times. When `sparse` derives from a large scan, persist it
    * first (it is aggregate-sized: buckets × dims rows) and unpersist
    * after materializing the result; [[denseWindowAgg]] is the one-call
    * convenience that accepts the re-scan. At dashboard scale, prefer an
    * explicit caller-known time range by filtering before densifying. */
  def densify(sparse: DataFrame, width: String): DataFrame = {
    val dimNames = sparse.columns.drop(1).dropRight(3).toSeq
    val spine = sparse
      .agg(min(col("window_start")).as("lo"), max(col("window_start")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr(s"INTERVAL $width")))
        .as("window_start"))
    val dimValues = sparse.select(dimNames.map(col): _*).distinct()
    spine.crossJoin(dimValues)
      .join(sparse, "window_start" +: dimNames, "left")
  }

  /** Forward-fill (last-observation-carried-forward) over a dense time
    * spine: each GAUGE column's null buckets take the most recent non-null
    * value within their dim partition; the `filled` flag marks carried
    * rows so downstream consumers can distinguish observation from
    * imputation. COUNTER columns are a different contract — a missing
    * bucket means zero events, not "same as before" — so callers 0-fill
    * those with `na.fill` and pass only gauges here.
    *
    * Plan: ONE window per dim partition ordered by the spine column,
    * unbounded-preceding `last(ignoreNulls)` frames for every gauge in
    * the same pass (Catalyst fuses same-window functions into one
    * WindowExec). Partition = the dim combination, which is
    * dashboard-cardinality; the spine is bucket-count long, so no
    * mega-partition risk at any corpus size.
    *
    * @param probeCol a column that is null exactly on spine-only rows
    *                 (any aggregate output column pre-fill) */
  def forwardFill(dense: DataFrame, dims: Seq[String], orderCol: String,
      gauges: Seq[String], probeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(dims.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = dense.withColumn("filled", col(probeCol).isNull)
    gauges.foldLeft(marked)((acc, g) =>
      acc.withColumn(g, last(col(g), ignoreNulls = true).over(w)))
  }

  /** LASPEYRES price index per period: Σ p_t·q₀ / Σ p₀·q₀ over items
    * present in both the period and the BASE period — "how much would
    * the base period's basket cost now", the inflation-style series a
    * raw average price muddles whenever the mix shifts (the index holds
    * quantities fixed; mean price doesn't).
    *
    * Exact: per (period, item) unit prices are integer milli-cents
    * (`Σext·1000 div Σqty`); the index numerator/denominator are exact
    * integer basket sums and the readout one division. Items absent
    * from a period simply leave the basket (documented — chained
    * indices handle entry/exit; this is the fixed-base form).
    *
    * @return per period: (period, n_items, num, den, index) — index
    *         1.0 at the base period by construction
    */
  def priceIndex(df: DataFrame, periodCol: Column, itemCol: Column,
      qty: Column, extCents: Column): DataFrame = {
    val per = df.select(periodCol.as("__p"), itemCol.as("__i"),
        qty.as("__q"), extCents.as("__e"))
      .groupBy(col("__p"), col("__i"))
      .agg(sum(col("__q")).as("__sq"), sum(col("__e")).as("__se"))
      .withColumn("p_milli", expr("(__se * 1000) div __sq"))
    val baseP = per.agg(min(col("__p")).as("__bp"))
    val base = per.join(broadcast(baseP), col("__p") === col("__bp"))
      .select(col("__i"), col("__sq").as("q0"),
        col("p_milli").as("p0_milli"))
    per.join(base, "__i")
      .groupBy(col("__p").as("period"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("p_milli") * col("q0")).as("num"),
        sum(col("p0_milli") * col("q0")).as("den"))
      .withColumn("index",
        col("num").cast("double") / col("den"))
  }

  /** DuckDB oracle for [[priceIndex]]: `innerSql` yields
    * (p, i, q, e) as integers. */
  def priceIndexOracleSql(innerSql: String): String =
    s"""WITH per AS (
       |  SELECT p, i, CAST(sum(q) AS BIGINT) AS sq,
       |         CAST((sum(e) * 1000) // sum(q) AS BIGINT) AS p_milli
       |  FROM ($innerSql) GROUP BY 1, 2
       |), base AS (
       |  SELECT i, sq AS q0, p_milli AS p0_milli
       |  FROM per WHERE p = (SELECT min(p) FROM per)
       |)
       |SELECT per.p AS period, CAST(count(*) AS BIGINT) AS n_items,
       |       CAST(sum(per.p_milli * base.q0) AS BIGINT) AS num,
       |       CAST(sum(base.p0_milli * base.q0) AS BIGINT) AS den,
       |       CAST(sum(per.p_milli * base.q0) AS DOUBLE)
       |         / sum(base.p0_milli * base.q0) AS index
       |FROM per JOIN base ON per.i = base.i
       |GROUP BY 1""".stripMargin

  /** A4+O1: inverse-average difficulty score per dimension, ordered. */
  def difficulty(df: DataFrame, dim: Column, qtyCents: Column, priceCents: Column): DataFrame =
    df.groupBy(dim)
      .agg(
        count(lit(1)).as("n"),
        sum(qtyCents).as("sq"),
        sum(priceCents).as("sp"))
      .withColumn("avg_qty", Exact.avgFromCents(col("sq"), col("n")))
      .withColumn("avg_price", Exact.avgFromCents(col("sp"), col("n")))
      .withColumn("difficulty_score",
        lit(100.0) / (col("avg_qty") + lit(1.0)) / (col("avg_price") / lit(1000.0) + lit(1.0)))
      .drop("sq", "sp")
      .orderBy(col("difficulty_score").desc)

  /** Mergeable per-key aggregate state — the incremental-maintenance
    * layout: at 100 TB you do not rescan history to refresh a rollup,
    * you fold each arriving slice's state into the stored state. Every
    * statistic here is an exact MERGEABLE monoid (count/sum/min/max add
    * associatively; avg derives at read time from n+sum — storing avg
    * would make merging wrong). The HLL companion for distincts is
    * [[Sketches.hllRollup]]/`hllReRollup`, same contract sketched.
    *
    * @return one row per key: (keys…, n, sum_v, min_v, max_v) */
  def rollupState(df: DataFrame, keys: Seq[Column], v: Column): DataFrame =
    df.groupBy(keys: _*).agg(
      count(lit(1)).as("n"), sum(v).as("sum_v"),
      min(v).as("min_v"), max(v).as("max_v"))

  /** Fold a new slice's state into previous state: union + re-aggregate
    * with each statistic's own merge op. Associative and commutative —
    * slices can arrive in any order and grouping; `mergeStates(a, b) ≡`
    * recomputing [[rollupState]] over the concatenated inputs
    * (RollupsSpec asserts it, and q89's oracle IS the full recompute). */
  def mergeStates(prev: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame =
    prev.unionByName(delta).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
}
