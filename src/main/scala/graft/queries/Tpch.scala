package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Exact

/** The classic TPC-H decision-support suite, adapted to the synthetic
  * star schema's column subset (no partsupp table, no
  * commit/receipt dates or ship modes — Q2/Q4/Q11/Q12/Q16/Q20/Q21
  * are out of reach by schema; the ten below survive with their join
  * and aggregation shapes intact, filters re-anchored to this data's
  * 1995–2001 date range and single-word part types).
  *
  * Exactness: money stays integer — `rev_cp` is cents·percent
  * (extendedprice cents × (100 − discount%)), `charge_cpp` adds the
  * tax factor (cents·%²); doubles only as a final single division,
  * identical on both engines. Dates ship as 'yyyy-MM-dd' strings (a
  * DATE column would land as different dtypes in the driver's pandas
  * compare).
  *
  * Scale shapes: every dimension (region, nation, customer, supplier,
  * part) joins BROADCAST into the lineitem/orders scan; aggregations
  * are single keyed hash-aggs; every top-k is the post-agg
  * sort-limit over a group-cardinality frame. No fact-fact shuffle
  * join anywhere except Q3/Q10/Q18's orders⋈lineitem (key-partitioned
  * by orderkey — the shape AQE handles at 100 TB).
  */
object Tpch extends QueryModule {

  /** cents·percent revenue unit: extendedprice·(1−discount), exact. */
  private def revCp: Column =
    Exact.cents(col("l_extendedprice")) *
      (lit(100L) - expr("CAST(round(l_discount * 100) AS LONG)"))

  private def shipDate: Column = expr("CAST(l_shipdate AS DATE)")
  private def orderDate: Column = expr("CAST(o_orderdate AS DATE)")

  private val revCpSql =
    """CAST(round(l_extendedprice * 100) AS BIGINT)
      |  * (100 - CAST(round(l_discount * 100) AS BIGINT))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 pricing summary: one hash-agg over the date-filtered scan;
    // disc/charge in exact integer cent·% / cent·%² units, averages as
    // single divisions. Overflow contract (the Densest/tClosenessAudit
    // convention): __charge ≈ 1e11 per row, so a (returnflag,
    // linestatus) group's sum_charge_cpp needs Σ < 2⁶³ — safe below
    // ~9·10⁷ lineitem rows PER GROUP (~SF 100 with 3×2 groups); past
    // that, sum __charge/__disc as DECIMAL(38,0) on BOTH engines (a
    // two-line cast; kept LONG here because the driver's pandas
    // comparator routes DECIMAL through float64, surrendering the very
    // exactness the integer units buy).
    "q424_tpch_q1" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .filter(shipDate <= lit("2000-12-01").cast("date"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("__q"),
          Exact.cents(col("l_extendedprice")).as("__base"),
          expr("CAST(round(l_discount * 100) AS LONG)").as("__d"),
          expr("CAST(round(l_tax * 100) AS LONG)").as("__t"))
        .withColumn("__disc", col("__base") * (lit(100L) - col("__d")))
        .withColumn("__charge",
          col("__base") * (lit(100L) - col("__d")) *
            (lit(100L) + col("__t")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("__q")).as("sum_qty"),
          sum(col("__base")).as("sum_base_cents"),
          sum(col("__disc")).as("sum_disc_cp"),
          sum(col("__charge")).as("sum_charge_cpp"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty",
          col("sum_qty").cast("double") / col("count_order"))
        .withColumn("avg_price_cents",
          col("sum_base_cents").cast("double") / col("count_order"))),

    // Q3 shipping priority: the two-fact join keyed on orderkey, then
    // a 10-row post-agg sort-limit.
    "q425_tpch_q3" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      t.orders.filter(orderDate < lit("1998-03-15").cast("date"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(t.lineitem.filter(shipDate > lit("1998-03-15").cast("date")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(orderDate, "yyyy-MM-dd").as("o_orderdate"))
        .agg(sum(revCp).as("revenue_cp"))
        .orderBy(col("revenue_cp").desc, col("o_orderdate"),
          col("l_orderkey"))
        .limit(10)
    }),

    // Q5 local-supplier volume: every dimension broadcasts; the only
    // shuffle is the orderkey fact join + the 25-row nation agg.
    "q426_tpch_q5" -> ((s, dir) => {
      val t = Tables(s, dir)
      val asia = t.nation.join(broadcast(t.region
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      t.orders
        .filter(orderDate >= lit("1996-01-01").cast("date") &&
          orderDate < lit("1997-01-01").cast("date"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier.select(col("s_suppkey"),
          col("s_nationkey"))), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(revCp).as("revenue_cp"))
    }),

    // Q6 forecasting revenue change: pure scan-side predicate (pushed
    // to parquet) + one global sum. discount band exact in percent.
    "q427_tpch_q6" -> ((s, dir) =>
      Tables(s, dir).lineitem
        .filter(shipDate >= lit("1997-01-01").cast("date") &&
          shipDate < lit("1998-01-01").cast("date") &&
          expr("CAST(round(l_discount * 100) AS LONG)").between(5, 7) &&
          col("l_quantity") < 24)
        .agg(sum(Exact.cents(col("l_extendedprice")) *
          expr("CAST(round(l_discount * 100) AS LONG)")).as("revenue_cd"),
          count(lit(1)).as("n"))),

    // Q7 volume shipping between two nations, by direction and year.
    "q428_tpch_q7" -> ((s, dir) => {
      val t = Tables(s, dir)
      val n1 = "NATION_18"; val n2 = "NATION_19"
      t.lineitem
        .filter(shipDate >= lit("1996-01-01").cast("date") &&
          shipDate < lit("1998-01-01").cast("date"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.supplier.select(col("s_suppkey"),
          col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("__sn"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("__sn"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("__cn"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("__cn"))
        .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
          (col("supp_nation") === n2 && col("cust_nation") === n1))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(shipDate).cast("long").as("l_year"))
        .agg(sum(revCp).as("revenue_cp"))
    }),

    // Q8 national market share: NATION_3's share of AMERICA-region
    // PROMO-part revenue by order year — two integer sums, one
    // division.
    "q429_tpch_q8" -> ((s, dir) => {
      val t = Tables(s, dir)
      val america = t.nation.join(broadcast(t.region
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(orderDate >= lit("1996-01-01").cast("date") &&
          orderDate < lit("1998-01-01").cast("date"))
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(america),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.supplier.select(col("s_suppkey"),
          col("s_nationkey").as("__sn"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("__nk"),
          col("n_name").as("supp_nation"))), col("__sn") === col("__nk"))
        .groupBy(year(orderDate).cast("long").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", revCp)
          .otherwise(lit(0L))).as("nation_cp"),
          sum(revCp).as("total_cp"))
        .withColumn("mkt_share",
          col("nation_cp").cast("double") / col("total_cp").cast("double"))
    }),

    // Q10 returned-item reporting: lost revenue per customer in one
    // quarter, top 20 — the orderkey fact join plus broadcast dims,
    // 20-row post-agg sort-limit.
    "q430_tpch_q10" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .filter(orderDate >= lit("1996-10-01").cast("date") &&
          orderDate < lit("1997-01-01").cast("date"))
        .join(t.lineitem.filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          Exact.cents(col("c_acctbal")).as("c_acctbal_cents"),
          col("n_name"))
        .agg(sum(revCp).as("revenue_cp"))
        .orderBy(col("revenue_cp").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14 promo revenue share for one ship-month: conditional vs total
    // integer sums off one broadcast-part scan, one division.
    "q431_tpch_q14" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(shipDate >= lit("1997-09-01").cast("date") &&
          shipDate < lit("1997-10-01").cast("date"))
        .join(broadcast(t.part.select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", revCp)
          .otherwise(lit(0L))).as("promo_cp"),
          sum(revCp).as("total_cp"))
        .withColumn("promo_share",
          col("promo_cp").cast("double") / col("total_cp").cast("double"))
    }),

    // Q15 top supplier: quarterly revenue per supplier, the max joined
    // back (ties all surface, the spec's semantics) — both frames are
    // supplier-cardinality.
    "q432_tpch_q15" -> ((s, dir) => {
      val t = Tables(s, dir)
      val rev = t.lineitem
        .filter(shipDate >= lit("1997-01-01").cast("date") &&
          shipDate < lit("1997-04-01").cast("date"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revCp).as("total_revenue_cp"))
      val top = rev.agg(max(col("total_revenue_cp")).as("__mx"))
      rev.join(broadcast(top),
          col("total_revenue_cp") === col("__mx"))
        .join(broadcast(t.supplier.select(col("s_suppkey"),
          col("s_name"))), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_cp"))
    }),

    // Q9 product-type profit (sans supplycost — not in schema):
    // widget-part revenue by supplier nation and order year.
    "q438_tpch_q9" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(broadcast(t.part.filter(col("p_name").contains("widget"))
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier.select(col("s_suppkey"),
          col("s_nationkey"))), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(orderDate).cast("long").as("o_year"))
        .agg(sum(revCp).as("amount_cp"))
    }),

    // Q13 customer order-count distribution: the left-outer two-level
    // aggregation (zero-order customers kept) — count(o_orderkey)
    // ignores the null of the unmatched left rows by SQL semantics.
    "q439_tpch_q13" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.select(col("c_custkey"))
        .join(t.orders.select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q22 global-sales opportunity: customers above the positive-
    // balance average with NO URGENT orders, by nation — the anti-join
    // + one-row-stat gate (the threshold comparison is the exact
    // integer cross-product cents·n > Σcents, never a float average).
    // Adapted: this synthetic data gives EVERY customer orders, so the
    // spec's "no orders at all" anti-join is structurally empty; the
    // urgency cut keeps the plan shape with a non-degenerate result.
    "q440_tpch_q22" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cust = t.customer.select(col("c_custkey"), col("c_nationkey"),
        Exact.cents(col("c_acctbal")).as("__cents"))
      val stats = broadcast(cust.filter(col("__cents") > 0)
        .agg(count(lit(1)).as("__n"), sum(col("__cents")).as("__s")))
      cust.crossJoin(stats)
        .filter(col("__cents") * col("__n") > col("__s"))
        .join(t.orders.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("__cents")).as("totacctbal_cents"))
    }),

    // Q18 large-volume customers: the HAVING-subquery shape — qty
    // rollup per order first (the fact collapses before any join),
    // then orders+customer broadcast in, top 100.
    "q433_tpch_q18" -> ((s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      t.orders.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_name"))), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(orderDate, "yyyy-MM-dd").as("o_orderdate"),
          Exact.cents(col("o_totalprice")).as("o_totalprice_cents"),
          col("sum_qty"))
        .orderBy(col("o_totalprice_cents").desc, col("o_orderkey"))
        .limit(100)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q424_tpch_q1" ->
      s"""WITH b AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(l_quantity AS BIGINT) AS q,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS base,
        |         CAST(round(l_discount * 100) AS BIGINT) AS d,
        |         CAST(round(l_tax * 100) AS BIGINT) AS t
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
        |)
        |SELECT l_returnflag, l_linestatus,
        |       CAST(sum(q) AS BIGINT) AS sum_qty,
        |       CAST(sum(base) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(base * (100 - d)) AS BIGINT) AS sum_disc_cp,
        |       CAST(sum(base * (100 - d) * (100 + t)) AS BIGINT)
        |         AS sum_charge_cpp,
        |       CAST(count(*) AS BIGINT) AS count_order,
        |       CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*)
        |         AS avg_qty,
        |       CAST(CAST(sum(base) AS BIGINT) AS DOUBLE) / count(*)
        |         AS avg_price_cents
        |FROM b GROUP BY 1, 2""".stripMargin,

    "q425_tpch_q3" ->
      s"""SELECT l_orderkey,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |         AS o_orderdate,
        |       CAST(sum($revCpSql) AS BIGINT) AS revenue_cp
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
        |  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
        |GROUP BY 1, 2
        |ORDER BY revenue_cp DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,

    "q426_tpch_q5" ->
      s"""SELECT n_name, CAST(sum($revCpSql) AS BIGINT) AS revenue_cp
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "q427_tpch_q6" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |         * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cd,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,

    "q428_tpch_q7" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
        |       CAST(sum($revCpSql) AS BIGINT) AS revenue_cp
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        |  AND ((sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19') OR
        |       (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "q429_tpch_q8" ->
      s"""WITH v AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)
        |           AS o_year,
        |         $revCpSql AS rev,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation an ON c_nationkey = an.n_nationkey
        |  JOIN region ON an.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        |    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        |)
        |SELECT o_year,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
        |                     ELSE 0 END) AS BIGINT) AS nation_cp,
        |       CAST(sum(rev) AS BIGINT) AS total_cp,
        |       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
        |                          ELSE 0 END) AS BIGINT) AS DOUBLE)
        |         / CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE) AS mkt_share
        |FROM v GROUP BY 1""".stripMargin,

    "q430_tpch_q10" ->
      s"""SELECT c_custkey, c_name,
        |       CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents,
        |       n_name,
        |       CAST(sum($revCpSql) AS BIGINT) AS revenue_cp
        |FROM orders
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_cp DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q431_tpch_q14" ->
      s"""SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revCpSql
        |                ELSE 0 END) AS BIGINT) AS promo_cp,
        |       CAST(sum($revCpSql) AS BIGINT) AS total_cp,
        |       CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revCpSql
        |                     ELSE 0 END) AS BIGINT) AS DOUBLE)
        |         / CAST(CAST(sum($revCpSql) AS BIGINT) AS DOUBLE)
        |         AS promo_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'""".stripMargin,

    "q432_tpch_q15" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum($revCpSql) AS BIGINT) AS total_revenue_cp
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
        |  GROUP BY 1
        |)
        |SELECT s_suppkey, s_name, total_revenue_cp
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_cp = (SELECT max(total_revenue_cp) FROM rev)
        |""".stripMargin,

    "q438_tpch_q9" ->
      s"""SELECT n_name AS nation,
        |       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
        |       CAST(sum($revCpSql) AS BIGINT) AS amount_cp
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2""".stripMargin,

    "q439_tpch_q13" ->
      """WITH cc AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1
        |)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM cc GROUP BY 1""".stripMargin,

    "q440_tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer
        |), s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(cents) AS BIGINT) AS t
        |  FROM c WHERE cents > 0
        |)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(cents) AS BIGINT) AS totacctbal_cents
        |FROM c CROSS JOIN s
        |WHERE cents * n > t
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q433_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT))
        |           AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 300
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        |         AS o_orderdate,
        |       CAST(round(o_totalprice * 100) AS BIGINT)
        |         AS o_totalprice_cents,
        |       sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,
  )
}
