package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.{Anomaly, AsOf, Exact, Quantiles, RangeJoin, Sampling}

/** Relational/OLAP surface beyond the reference: as-of join, bucketed
  * range join, exact+sketch quantiles, pivot, rollup grouping sets, and
  * deterministic sampling/splitting. Each operator exists because a user
  * of a complete analytics engine reaches for it weekly; each query here
  * is the oracle-checked witness of the scalable plan shape documented on
  * the operator.
  */
object Relational extends QueryModule {

  private val centsSql = "CAST(round(value * 100) AS BIGINT)"

  /** q43's sampling/splitting config — the oracle SQL is generated from
    * these same values (Sampling.rateThresholdSql/splitCaseSql) so the
    * two engines cannot drift. */
  private val docRates = Map("en" -> 0.5, "zh" -> 1.0)
  private val docDefaultRate = 0.25
  private val splitFracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** q57's profiled columns — oracle SQL generated from the same list. */
  private[queries] val profileCols = Seq("event_id", "user_id", "event_type", "props")

  /** q63: suppliers join the node space above every custkey. */
  private[queries] val supplierNodeOffset = 1000000L

  /** q246's field model — ONE definition feeds both the Spark plan and
    * the oracle SQL, so the micro-log2 weight literals agree. */
  private[queries] val fsFields = Seq(
    graft.ops.Linkage.FsField("name", m = 0.9, u = 0.001),
    graft.ops.Linkage.FsField("seg", m = 0.9, u = 0.2),
    graft.ops.Linkage.FsField("band", m = 0.8, u = 0.1))

  /** q84: decile cut positions as integer rationals (i/10). */
  private val decileQs: Seq[(Int, Int)] = (1 to 9).map(i => (i, 10))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: every event enriched with the user's most recent
    // purchase at or before it (union + running-last; one sort-merge-grade
    // shuffle, no theta join).
    "q38_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val snaps = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("snap_value"), max(col("event_id")).as("snap_id"))
      AsOf.join(
        ev.select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
        snaps, Seq("user_id"), "ts", "ts", Seq("snap_value", "snap_id"), "snap_id")
    }),

    // SCD2 TEMPORAL dimension join — the lookup side of q62's history
    // build: every event joined to the user-tier dimension version
    // valid AT ITS TIMESTAMP. Because SCD2 versions tile each key's
    // timeline gap-free, "valid_from <= ts < valid_to" degenerates to
    // the as-of join on valid_from — the composition that keeps the
    // plan the q38 union-window shape instead of a non-equi range join.
    // Events before a user's first version read NULL (LEFT semantics).
    "q374_scd2_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val pur = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(struct(col("event_id").as("dim_id"),
          expr("CAST(round(value * 100) AS LONG) div 10000").as("tier")))
          .as("__d"))
        .select(col("user_id"), col("ts"),
          col("__d.dim_id").as("dim_id"), col("__d.tier").as("tier"))
      val dim = graft.ops.Journey.scd2(pur, "user_id", "ts", "dim_id")
        .select(col("user_id"), col("valid_from"), col("dim_id"),
          col("tier"))
      AsOf.join(
        ev.select(col("event_id"), col("user_id"), col("ts")),
        dim, Seq("user_id"), "ts", "valid_from",
        Seq("tier", "dim_id"), "dim_id")
    }),

    // Range join: events counted into 1-hour incident windows opened by
    // high-value errors (bucketed equi-join, not BroadcastNestedLoop).
    "q39_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val incidents = ev
        .filter(col("event_type") === "error" && col("value") > 300)
        .select(col("event_id").as("incident_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      RangeJoin.pointInInterval(ev, incidents, "ts", "w_start", "w_end")
        .groupBy(col("incident_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(Exact.cents(col("value"))).as("sum_cents"))
        .withColumn("avg_value", Exact.avgFromCents(col("sum_cents"), col("n_events")))
        .drop("sum_cents")
    }),

    // Robust (median/MAD) outliers per event_type: the 50%-breakdown
    // sibling of q07's z-score — integer cents arithmetic end to end,
    // discrete rank-selected medians (q40's determinism).
    "q103_robust_outliers" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .withColumn("cents", Exact.cents(col("value")))
        .select(col("event_id"), col("event_type"), col("cents"))
      Anomaly.robustOutliers(ev, Seq("event_type"), "cents")
    }),

    // Exact discrete latency-style quantiles per event_type (rank
    // selection — cross-engine deterministic, unlike interpolation).
    "q40_quantiles" -> ((s, dir) => {
      val ev = Tables(s, dir).events.withColumn("cents", Exact.cents(col("value")))
      val q = Quantiles.exact(ev, Seq(col("event_type")), col("cents"),
        Seq(0.5, 0.95, 0.99))
      q.select(col("event_type"),
        (col("p50") / 100.0).as("p50"),
        (col("p95") / 100.0).as("p95"),
        (col("p99") / 100.0).as("p99"))
    }),

    // Robust means: 10%-per-side trimmed and winsorized averages of the
    // event metric — exact integer rank arithmetic, doubles only at the
    // two final divisions (q40's recipe applied to robust aggregation).
    "q128_trimmed_mean" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .withColumn("cents", Exact.cents(col("value")))
      Quantiles.trimmedStats(ev, Seq(col("event_type")), col("cents"),
          num = 1, den = 10)
        .select(col("event_type"), col("n"), col("n_kept"),
          (col("trimmed_mean") / 100.0).as("trimmed_mean"),
          (col("winsorized_mean") / 100.0).as("winsorized_mean"))
    }),

    // Pivot: per-user event-type counts as columns (explicit value list →
    // one hash aggregation, no per-value scans).
    "q41_pivot" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          col("click").as("n_click"), col("view").as("n_view"),
          col("purchase").as("n_purchase"), col("signup").as("n_signup"),
          col("error").as("n_error"))
    }),

    // Rollup grouping sets: (type, hour-of-day) with subtotal and grand-
    // total rows, grouping_id disambiguating aggregation levels.
    "q42_rollup" -> ((s, dir) => {
      Tables(s, dir).events
        .withColumn("hod", date_format(col("ts"), "HH"))
        .withColumn("cents", Exact.cents(col("value")))
        .rollup(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          grouping_id().cast("long").as("gid"))
        .withColumn("avg_value", Exact.avgFromCents(col("sum_cents"), col("n")))
        .drop("sum_cents")
    }),

    // Set operations: (clicked ∩ purchased) \ errored — INTERSECT/EXCEPT
    // plan as keyed aggregates/joins, not row-by-row driver logic.
    // (thresholds keep each set a strict subset so the result exercises
    // both operators — every user has every event type in this testdata)
    "q44_set_ops" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      def users(t: String, minV: Double) =
        ev.filter(col("event_type") === t && col("value") > minV)
          .select(col("user_id"))
      users("click", 150).intersect(users("purchase", 150))
        .except(users("error", 250))
    }),

    // SQL text surface: the same engine via spark.sql over registered
    // views — top-3 users per event type, ANSI-portable text.
    "q45_sql_api" -> ((s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events_v")
      s.sql(
        """SELECT event_type, user_id, n, rn FROM (
          |  SELECT event_type, user_id, count(*) AS n,
          |         CAST(row_number() OVER (PARTITION BY event_type
          |           ORDER BY count(*) DESC, user_id) AS BIGINT) AS rn
          |  FROM events_v GROUP BY event_type, user_id
          |) WHERE rn <= 3""".stripMargin)
    }),

    // Anti join: click counts for users who never purchased (left_anti —
    // a keyed shuffle; the driver-side "collect then filter" anti-pattern
    // never appears).
    "q46_anti_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
        .join(ev.filter(col("event_type") === "purchase" && col("value") > 180)
            .select(col("user_id")),
          Seq("user_id"), "left_anti")
    }),

    // Latest record per key via max_by on a unique (ts, event_id) ordering
    // struct: one hash aggregation — no window sort, no per-key shuffle
    // beyond the agg's own.
    "q47_latest_per_key" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("ts"), col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"))
        .select(col("user_id"), col("last.ts").as("ts"),
          col("last.event_id").as("event_id"),
          col("last.event_type").as("event_type"), col("last.value").as("value"))
    }),

    // Batch sessionization: Spark's native session_window (the same
    // operator the streaming path uses, minus the watermark) — sessions =
    // maximal event chains with consecutive gaps < 30 min. The oracle is
    // the classic gaps-and-islands rewrite, proving the two formulations
    // agree value-for-value.
    "q48_sessions" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
    }),

    // Star join: revenue by nation — the broadcast-the-dims shape every
    // warehouse query needs. nation (25 rows) broadcasts; orders⋈customer
    // shuffle on the fact keys. RelationalOpsSpec asserts the broadcast.
    // Incremental join maintenance: the delta a stored orders⋈lineitem
    // view gains when an orders batch (keys %10=0) and a lineitem batch
    // (linenumbers %3=0) land — three delta-sided joins, the base
    // result untouched (the materialized-view ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
    // rule); oracle is the multiset difference of the full joins.
    "q437_join_delta" -> ((s, dir) => {
      val t = Tables(s, dir)
      val aAll = t.orders.select(col("o_orderkey"), col("o_orderpriority"))
      val bAll = t.lineitem.select(col("l_orderkey").as("o_orderkey"),
        col("l_linenumber"), Exact.cents(col("l_extendedprice")).as("cents"))
      graft.ops.Merge.joinDelta(
        aAll.filter(col("o_orderkey") % 10 =!= 0),
        bAll.filter(col("l_linenumber") % 3 =!= 0),
        aAll.filter(col("o_orderkey") % 10 === 0),
        bAll.filter(col("l_linenumber") % 3 === 0),
        Seq("o_orderkey"))
    }),

    "q49_star_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(Exact.cents(col("o_totalprice"))).as("cents"))
        .select(col("n_name"), col("n_orders"),
          (col("cents").cast("double") / 100.0).as("revenue"))
    }),

    // Two-hop dim chain: supplier → nation → region, both dims broadcast
    // (completes coverage of every testdata table).
    "q51_region_suppliers" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(Exact.cents(col("s_acctbal"))).as("cents"))
        .select(col("r_name"), col("n_suppliers"),
          Exact.avgFromCents(col("cents"), col("n_suppliers")).as("avg_acctbal"))
    }),

    // Dimensional rollup over part: brand-level price/size stats.
    "q52_part_brand" -> ((s, dir) => {
      Tables(s, dir).part
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(Exact.cents(col("p_retailprice"))).as("cents"),
          max(col("p_size")).as("max_size"))
        .select(col("p_brand"), col("n_parts"),
          Exact.avgFromCents(col("cents"), col("n_parts")).as("avg_price"),
          col("max_size"))
    }),

    // Deterministic stratified sample + split: per-lang rates, then a
    // stable train/val/test assignment — rerun-identical, engine-identical.
    "q43_sample_split" -> ((s, dir) => {
      val docs = Tables(s, dir).documents
      val sampled = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
        docRates, docDefaultRate, salt = "smp")
      Sampling.assignSplit(sampled, col("doc_id"), "spl", splitFracs)
        .select(col("doc_id"), col("lang"), col("source"), col("split"))
    }),

    // shuffle carries only candidates. AQE's runtime filter as a
    // composable, engine-checkable operator.
    "q153_bloom_semi" -> ((s, dir) => {
      val t = Tables(s, dir)
      graft.ops.Bloom.semiJoinReduce(
        t.lineitem, "l_orderkey",
        t.orders.filter(col("o_orderpriority") === "1-URGENT"),
        "o_orderkey")
    }),

    // Z-order clustering key: Morton interleave as a native codegen'd
    // expression (the write path is Partitioned.writeZOrdered; this query
    // proves the key itself is engine-exact).
    "q64_zorder_key" -> ((s, dir) =>
      Tables(s, dir).events.select(col("event_id"), col("user_id"),
        graft.functions.Morton.morton(col("user_id"), col("event_id"))
          .as("zkey"))),

    // Hilbert-curve layout key next to q64's Z-order: consecutive
    // indices are ALWAYS grid-adjacent (no power-of-two jumps), so 2-D
    // range scans touch fewer extents; per-row bit fold, no UDF.
    // HilbertSpec measures the locality win over Morton directly.
    "q366_hilbert_key" -> ((s, dir) =>
      Tables(s, dir).events.select(col("event_id"), col("user_id"),
        graft.functions.Hilbert.hilbert(col("user_id"), col("event_id"))
          .as("hkey"))),

    // Key-distribution skew report over the event log's user key.
    "q65_skew_report" -> ((s, dir) =>
      graft.ops.Skew.skewReport(Tables(s, dir).events, "user_id")),

    // CUBE grouping sets (q42's rollup sibling): all 2^k flag/status
    // aggregates in one pass, gid disambiguating the grouping set.
    "q68_cube" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .withColumn("cents", Exact.cents(col("l_extendedprice")))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          grouping_id().cast("long").as("gid"))),

    // GROUPING SETS — the third of the multi-dimensional agg family
    // (q42 ROLLUP, q68 CUBE): exactly the named dimension combinations,
    // here the two one-dimension margins plus the grand total (what a
    // dashboard wants; CUBE would also pay for the full cross).
    "q132_grouping_sets" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .withColumn("cents", Exact.cents(col("l_extendedprice")))
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          grouping_id().cast("long").as("gid"))),

    // PIVOT: per-user event-type profile as wide columns (count + exact
    // cents per type). The pivot values are the DECLARED domain — never
    // the two-pass infer-distinct form, which at 100 TB adds a full scan
    // and makes the schema data-dependent. One hash aggregation; absent
    // (user, type) cells are count 0 / sum NULL on both engines.
    "q169_pivot" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .withColumn("cents", Exact.cents(col("value")))
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = ev.groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      types.foldLeft(wide)((d, t) =>
        d.withColumn(s"${t}_n", coalesce(col(s"${t}_n"), lit(0L))))
    }),

    // Left semi join: users who DID purchase big (q46's anti complement) —
    // keyed existence probe, no row multiplication from the build side.
    "q69_semi_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      ev.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
        .join(ev.filter(col("event_type") === "purchase" && col("value") > 180)
            .select(col("user_id")),
          Seq("user_id"), "left_semi")
    }),

    // Batch MERGE / CDC apply: a deterministic change set (updates,
    // deletes, inserts derived from the snapshot itself) folded into the
    // customer table in ONE full-outer key join (graft.ops.Merge).
    "q79_merge" -> ((s, dir) => {
      val cust = Tables(s, dir).customer
      val updates = cust
        .filter(col("c_custkey") % 3 === 0 && col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          (col("c_acctbal") + lit(100.0)).as("c_acctbal"),
          lit("UPDATED").as("c_mktsegment"), lit("upsert").as("op"))
      val deletes = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"), lit("delete").as("op"))
      val inserts = cust.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
          concat(lit("new_"), col("c_name")).as("c_name"),
          col("c_nationkey"), lit(0.0).as("c_acctbal"),
          lit("NEW").as("c_mktsegment"), lit("upsert").as("op"))
      graft.ops.Merge.applyChanges(cust,
        updates.unionByName(deletes).unionByName(inserts), Seq("c_custkey"))
    }),

    // Partition-scoped MERGE, full DISK round-trip (q79 is the
    // relational operator; this is its 100 TB deployment shape): write
    // a day-partitioned snapshot, merge a change batch (updates +
    // deletes + inserts confined to the early days) via
    // Partitioned.mergePartitioned — only touched day directories are
    // read or rewritten (untouched-files-byte-identical is
    // PartitionedSpec's assertion) — then read the snapshot back. The
    // oracle replays the same merge relationally, so the gate covers
    // layout, dynamic overwrite, and merge semantics end-to-end.
    "q311_partitioned_merge" -> ((s, dir) => {
      val ev = Tables(s, dir).events.select(
        col("event_id"),
        expr("CAST(CAST(ts AS DATE) AS STRING)").as("dt"),
        Exact.cents(col("value")).as("cents"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q311_").toString
      ev.repartition(col("dt")).write.mode("overwrite")
        .partitionBy("dt").parquet(tmp)
      val cut = lit("2024-01-15")
      val upserts = ev
        .filter(col("dt") <= cut && col("event_id") % 7 === 0 &&
          col("event_id") % 11 =!= 0)
        .withColumn("cents", col("cents") + 1000L)
        .withColumn("op", lit("upsert"))
      val deletes = ev
        .filter(col("dt") <= cut && col("event_id") % 11 === 0)
        .withColumn("cents", lit(null).cast("long"))
        .withColumn("op", lit("delete"))
      val inserts = ev
        .filter(col("dt") <= cut && col("event_id") % 13 === 0 &&
          col("event_id") % 7 =!= 0 && col("event_id") % 11 =!= 0)
        .withColumn("event_id", col("event_id") + 100000000L)
        .withColumn("cents", lit(4242L))
        .withColumn("op", lit("upsert"))
      graft.sources.Partitioned.mergePartitioned(s, tmp,
        upserts.unionByName(deletes).unionByName(inserts),
        Seq("event_id"), "dt", col("dt"))
      s.read.parquet(tmp)
        .groupBy(col("dt").cast("string").as("dt"))
        .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
    }),

    // Equal-frequency decile binning: exact global cut points from the
    // value HISTOGRAM (window over distinct values, bounded by value
    // cardinality — not a per-row global sort), broadcast back as one
    // row; bin assignment is a per-row expression on the scan.
    "q84_decile_bin" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("event_id"), Exact.cents(col("value")).as("cents"))
      Quantiles.binByCuts(ev, col("cents"),
        Quantiles.histogramCuts(ev, col("cents"), decileQs))
    }),

    // UNPIVOT / melt (q41's inverse): wide metric columns to long
    // (id, metric, value) rows — Dataset.unpivot plans a Generate
    // (Expand) projection, zero shuffles.
    "q86_unpivot" -> ((s, dir) =>
      Tables(s, dir).lineitem.unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")),

    // Lag-delta time series: hour-over-hour change per event type (the
    // derivative every monitoring dashboard plots). One agg shuffle +
    // one per-type window; first hour's delta is NULL, honestly.
    "q87_hourly_delta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables(s, dir).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("delta",
          col("n") - lag(col("n"), 1).over(
            Window.partitionBy(col("event_type")).orderBy(col("hour"))))
    }),

    // Grouped ntile quartiles: equal-count buckets per event type under
    // a TOTAL order (cents, event_id) — ntile over a tied order is
    // engine-dependent; over a total order it is exact arithmetic.
    "q88_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables(s, dir).events
        .select(col("event_id"), col("event_type"),
          Exact.cents(col("value")).as("cents"))
        .withColumn("quartile",
          ntile(4).over(Window.partitionBy(col("event_type"))
            .orderBy(col("cents"), col("event_id"))).cast("long"))
    }),

    // Grouped Pearson correlation from exact integer sums (the
    // oracle-able corr(x, y) — built-in float accumulation can never
    // hash-match another engine). One map-side-combined aggregation.
    "q85_correlation" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem.select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        Exact.cents(col("l_extendedprice")).as("c"))
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).as("sx"), sum(col("c")).as("sy"),
          sum(col("q") * col("q")).as("sxx"),
          sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("syy"),
          sum(col("c").cast(DecimalType(38, 0)) * col("q")).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          Exact.corrFromSums(col("n"), col("sx"), col("sy"),
            col("sxx"), col("syy"), col("sxy")).as("corr_qty_price"))
    }),

  )

  def oracleSql: Map[String, String] = Map(
    "q38_asof_join" ->
      """WITH snaps AS (
        |  SELECT user_id, ts, max(value) AS snap_value, max(event_id) AS snap_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT e.event_id, e.user_id, e.ts, e.event_type, s.snap_value, s.snap_id
        |FROM events e ASOF LEFT JOIN snaps s
        |  ON e.user_id = s.user_id AND e.ts >= s.ts""".stripMargin,

    "q374_scd2_join" ->
      """WITH pur AS (
        |  SELECT user_id, ts, event_id AS dim_id,
        |         CAST(round(value * 100) AS BIGINT) // 10000 AS tier,
        |         row_number() OVER (PARTITION BY user_id, ts
        |           ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'
        |), dim AS (
        |  SELECT user_id, ts AS valid_from, dim_id, tier
        |  FROM pur WHERE rn = 1
        |)
        |SELECT e.event_id, e.user_id, e.ts, d.tier, d.dim_id
        |FROM events e ASOF LEFT JOIN dim d
        |  ON e.user_id = d.user_id AND e.ts >= d.valid_from""".stripMargin,

    "q39_range_join" ->
      s"""WITH incidents AS (
        |  SELECT event_id AS incident_id, ts AS w_start, ts + INTERVAL 1 HOUR AS w_end
        |  FROM events WHERE event_type = 'error' AND value > 300
        |)
        |SELECT i.incident_id, count(*) AS n_events,
        |       CAST(sum($centsSql) AS DOUBLE) / count(*) / 100.0 AS avg_value
        |FROM events e JOIN incidents i
        |  ON e.ts >= i.w_start AND e.ts < i.w_end
        |GROUP BY 1""".stripMargin,

    "q103_robust_outliers" ->
      s"""WITH e AS (
        |  SELECT event_id, event_type, $centsSql AS cents FROM events
        |), r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM e
        |), med AS (
        |  SELECT event_type, max(CASE WHEN rn = ceil(0.5 * n) THEN cents END) AS med
        |  FROM r1 GROUP BY 1
        |), d AS (
        |  SELECT e.event_id, e.event_type, e.cents, med.med,
        |         abs(e.cents - med.med) AS dev
        |  FROM e JOIN med USING (event_type)
        |), r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM d
        |), mad AS (
        |  SELECT event_type, max(CASE WHEN rn = ceil(0.5 * n) THEN dev END) AS mad
        |  FROM r2 GROUP BY 1
        |)
        |SELECT d.event_id, d.event_type, d.cents, d.med, mad.mad,
        |       (d.dev > 3 * mad.mad) AS is_outlier
        |FROM d JOIN mad USING (event_type)""".stripMargin,

    "q40_quantiles" ->
      s"""WITH ranked AS (
        |  SELECT event_type, $centsSql AS cents,
        |         row_number() OVER (PARTITION BY event_type ORDER BY $centsSql) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |)
        |SELECT event_type,
        |       max(CASE WHEN rn = ceil(0.5 * n)  THEN cents END) / 100.0 AS p50,
        |       max(CASE WHEN rn = ceil(0.95 * n) THEN cents END) / 100.0 AS p95,
        |       max(CASE WHEN rn = ceil(0.99 * n) THEN cents END) / 100.0 AS p99
        |FROM ranked GROUP BY 1""".stripMargin,

    "q128_trimmed_mean" ->
      s"""WITH r AS (
        |  SELECT event_type, $centsSql AS cents,
        |         row_number() OVER (PARTITION BY event_type ORDER BY $centsSql) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |), kd AS (
        |  SELECT *, (1 * n) // 10 AS k FROM r
        |), a AS (
        |  SELECT event_type,
        |         max(n) AS n,
        |         CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |         sum(CASE WHEN rn > k AND rn <= n - k THEN cents END) AS tsum,
        |         min(CASE WHEN rn > k AND rn <= n - k THEN cents END) AS vlo,
        |         max(CASE WHEN rn > k AND rn <= n - k THEN cents END) AS vhi,
        |         max(k) AS kk
        |  FROM kd GROUP BY 1
        |)
        |SELECT event_type, n, n_kept,
        |       CAST(tsum AS DOUBLE) / CAST(n_kept AS DOUBLE) / 100.0 AS trimmed_mean,
        |       CAST(tsum + kk * (vlo + vhi) AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
        |         AS winsorized_mean
        |FROM a""".stripMargin,

    // null (not 0) for absent combos, matching Spark's pivot cells; CAST
    // because DuckDB widens sum(int) to HUGEINT.
    "q41_pivot" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS n_click,
        |       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS n_view,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS n_signup,
        |       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS n_error
        |FROM events GROUP BY 1""".stripMargin,

    "q42_rollup" ->
      s"""SELECT event_type, strftime(ts, '%H') AS hod,
        |       count(*) AS n,
        |       CAST(GROUPING_ID(event_type, strftime(ts, '%H')) AS BIGINT) AS gid,
        |       CAST(sum($centsSql) AS DOUBLE) / count(*) / 100.0 AS avg_value
        |FROM events
        |GROUP BY ROLLUP(event_type, strftime(ts, '%H'))""".stripMargin,

    "q44_set_ops" ->
      """SELECT user_id FROM events WHERE event_type = 'click' AND value > 150
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 250""".stripMargin,

    "q45_sql_api" ->
      """SELECT event_type, user_id, n, rn FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY count(*) DESC, user_id) AS BIGINT) AS rn
        |  FROM events GROUP BY event_type, user_id
        |) WHERE rn <= 3""".stripMargin,

    "q46_anti_join" ->
      """SELECT user_id, count(*) AS n_clicks
        |FROM events e WHERE event_type = 'click'
        |  AND NOT EXISTS (SELECT 1 FROM events p
        |                  WHERE p.event_type = 'purchase' AND p.value > 180
        |                    AND p.user_id = e.user_id)
        |GROUP BY 1""".stripMargin,

    "q47_latest_per_key" ->
      """SELECT user_id, ts, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    // gaps-and-islands; break on gap STRICTLY > 30 min — session_window
    // merges an exactly-gap-later event (inclusive bound, pinned by the
    // RelationalOpsSpec boundary test)
    "q48_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q437_join_delta" -> graft.ops.Merge.joinDeltaOracleSql(
      "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 10 <> 0",
      """SELECT l_orderkey AS o_orderkey, l_linenumber,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |FROM lineitem WHERE l_linenumber % 3 <> 0""".stripMargin,
      "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 10 = 0",
      """SELECT l_orderkey AS o_orderkey, l_linenumber,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |FROM lineitem WHERE l_linenumber % 3 = 0""".stripMargin,
      Seq("o_orderkey"),
      Seq("a.o_orderkey AS o_orderkey", "a.o_orderpriority",
        "b.l_linenumber", "b.cents")),

    "q49_star_join" ->
      """SELECT n_name, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q51_region_suppliers" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |       CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,

    "q52_part_brand" ->
      """SELECT p_brand, count(*) AS n_parts,
        |       CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_price,
        |       max(p_size) AS max_size
        |FROM part GROUP BY 1""".stripMargin,

    "q43_sample_split" ->
      s"""SELECT doc_id, lang, source,
        |       ${Sampling.splitCaseSql("doc_id", "spl", splitFracs)} AS split
        |FROM documents
        |WHERE ${Sampling.hashBucketSql("doc_id", "smp")}
        |    < ${Sampling.rateThresholdSql("lang", docRates, docDefaultRate)}""".stripMargin,

    // the exact semi join, which is what the oracle states.
    "q153_bloom_semi" ->
      """SELECT * FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    "q64_zorder_key" ->
      s"""SELECT event_id, user_id,
         |       ${graft.functions.Morton.duckSql("user_id", "event_id")} AS zkey
         |FROM events""".stripMargin,

    "q366_hilbert_key" -> graft.functions.Hilbert.duckOracleSql(
      "SELECT event_id, user_id, user_id AS x0, event_id AS y0 FROM events",
      Seq("event_id", "user_id")),

    "q68_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

    "q132_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

    "q169_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.map(t =>
        s"""CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS ${t}_n,
           |       CAST(sum(cents) FILTER (WHERE event_type = '$t') AS BIGINT) AS ${t}_cents""".stripMargin)
        .mkString(",\n       ")
      s"""SELECT user_id,
         |       $cols
         |FROM (SELECT user_id, event_type,
         |             CAST(round(value * 100) AS BIGINT) AS cents
         |      FROM events)
         |GROUP BY 1""".stripMargin
    },

    "q69_semi_join" ->
      """SELECT user_id, count(*) AS n_clicks
        |FROM events e WHERE event_type = 'click'
        |  AND EXISTS (SELECT 1 FROM events p
        |              WHERE p.event_type = 'purchase' AND p.value > 180
        |                AND p.user_id = e.user_id)
        |GROUP BY 1""".stripMargin,

    "q65_skew_report" ->
      """WITH counts AS (
        |  SELECT user_id AS key, count(*) AS c FROM events GROUP BY 1
        |), totals AS (
        |  SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows FROM counts
        |), top AS (
        |  SELECT c AS max_c, key AS top_key FROM counts
        |  ORDER BY c DESC, key LIMIT 1
        |), cum AS (
        |  SELECT c, sum(k) OVER (ORDER BY c) AS cum
        |  FROM (SELECT c, count(*) AS k FROM counts GROUP BY 1)
        |), qs AS (
        |  SELECT min(CASE WHEN cum >= (1 * n_keys + 1) // 2 THEN c END) AS p50_c,
        |         min(CASE WHEN cum >= (9 * n_keys + 9) // 10 THEN c END) AS p90_c
        |  FROM cum, totals
        |)
        |SELECT n_keys, n_rows, max_c, top_key, p50_c, p90_c,
        |       CAST(max_c AS DOUBLE) * n_keys / n_rows AS skew
        |FROM totals, top, qs""".stripMargin,

    "q79_merge" ->
      """WITH ch AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         c_acctbal + 100.0 AS c_acctbal,
        |         'UPDATED' AS c_mktsegment, 'upsert' AS op
        |  FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 10 <> 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
        |         'delete'
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new_' || c_name, c_nationkey,
        |         CAST(0.0 AS DOUBLE), 'NEW', 'upsert'
        |  FROM customer WHERE c_custkey % 7 = 0
        |)
        |SELECT coalesce(ch.c_custkey, t.c_custkey) AS c_custkey,
        |       CASE WHEN ch.op IS NOT NULL THEN ch.c_name ELSE t.c_name END AS c_name,
        |       CASE WHEN ch.op IS NOT NULL THEN ch.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        |       CASE WHEN ch.op IS NOT NULL THEN ch.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |       CASE WHEN ch.op IS NOT NULL THEN ch.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM customer t FULL OUTER JOIN ch ON t.c_custkey = ch.c_custkey
        |WHERE ch.op IS NULL OR ch.op <> 'delete'""".stripMargin,

    "q311_partitioned_merge" ->
      """WITH base AS (
        |  SELECT event_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), merged AS (
        |  SELECT event_id, dt, cents FROM base
        |  WHERE NOT (dt <= '2024-01-15'
        |             AND (event_id % 11 = 0 OR event_id % 7 = 0))
        |  UNION ALL
        |  SELECT event_id, dt, cents + 1000 FROM base
        |  WHERE dt <= '2024-01-15'
        |    AND event_id % 7 = 0 AND event_id % 11 <> 0
        |  UNION ALL
        |  SELECT event_id + 100000000, dt, 4242 FROM base
        |  WHERE dt <= '2024-01-15' AND event_id % 13 = 0
        |    AND event_id % 7 <> 0 AND event_id % 11 <> 0
        |)
        |SELECT dt, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM merged GROUP BY 1""".stripMargin,

    // Cut selection in pure integer arithmetic: cum·den >= n·num avoids
    // both the divide and the ceil(p·n)-in-doubles trap. CASE/min lists
    // generated from the same decileQs the Spark plan uses.
    "q84_decile_bin" -> {
      val cuts = decileQs.map { case (num, den) =>
        s"min(CASE WHEN cum * $den >= n * $num THEN val END) AS c${num * 100 / den}"
      }.mkString(",\n|         ")
      val binSum = decileQs.map { case (num, den) =>
        s"(CASE WHEN cents > c${num * 100 / den} THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH c AS (
        |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), h AS (SELECT cents AS val, count(*) AS k FROM c
        |         WHERE cents IS NOT NULL GROUP BY 1),
        |m AS (SELECT val, CAST(sum(k) OVER (ORDER BY val) AS BIGINT) AS cum FROM h),
        |t AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM h),
        |q AS (
        |  SELECT $cuts
        |  FROM m, t)
        |SELECT event_id, cents,
        |       CAST(CASE WHEN cents IS NULL THEN NULL
        |                 ELSE $binSum END AS BIGINT) AS bin
        |FROM c, q""".stripMargin
    },

    // Same double-op sequence as Exact.corrFromSums; HUGEINT sums route
    // through VARCHAR (q07's ss lesson: DuckDB HUGEINT→DOUBLE is not
    // correctly rounded above 2^64; the string parse is).
    "q85_correlation" -> {
      val sxxD = "CAST(sxx AS DOUBLE)"
      val syyD = "CAST(CAST(syy AS VARCHAR) AS DOUBLE)"
      val sxyD = "CAST(CAST(sxy AS VARCHAR) AS DOUBLE)"
      val (sxD, syD) = ("CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)")
      val vx = s"($sxxD - $sxD * $sxD / n)"
      val vy = s"($syyD - $syD * $syD / n)"
      s"""WITH c AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cv
        |  FROM lineitem
        |), s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         CAST(sum(q) AS BIGINT) AS sx, CAST(sum(cv) AS BIGINT) AS sy,
        |         CAST(sum(q * q) AS BIGINT) AS sxx,
        |         sum(CAST(cv AS HUGEINT) * cv) AS syy,
        |         sum(CAST(cv AS HUGEINT) * q) AS sxy
        |  FROM c GROUP BY 1)
        |SELECT l_returnflag, n,
        |       CASE WHEN $vx > 0 AND $vy > 0
        |         THEN ($sxyD - $sxD * $syD / n) / (sqrt($vx) * sqrt($vy))
        |       END AS corr_qty_price
        |FROM s""".stripMargin
    },

    // UNION ALL form rather than DuckDB's UNPIVOT syntax: identical
    // semantics, no dialect surprises in the gate.
    "q86_unpivot" -> {
      val arms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(c =>
          s"SELECT l_orderkey, l_linenumber, '$c' AS metric, $c AS value FROM lineitem")
        .mkString("\n|UNION ALL\n|")
      s"""$arms""".stripMargin
    },

    "q87_hourly_delta" ->
      """WITH h AS (
        |  SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT hour, event_type, n,
        |       n - lag(n, 1) OVER (PARTITION BY event_type ORDER BY hour) AS delta
        |FROM h""".stripMargin,

    "q88_ntile" ->
      """SELECT event_id, event_type,
        |       CAST(round(value * 100) AS BIGINT) AS cents,
        |       CAST(ntile(4) OVER (PARTITION BY event_type
        |         ORDER BY CAST(round(value * 100) AS BIGINT), event_id) AS BIGINT) AS quartile
        |FROM events""".stripMargin,

  )
}
