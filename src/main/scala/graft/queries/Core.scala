package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._

/** Reference-surface core: projection/filter/CASE scalars (§2.2, §2.4),
  * the A1 career-stats aggregation and the A5+W1+F2 ranking flagship
  * (`/root/reference/spark_apps/advanced_analytics.py:105-135`).
  */
object Core extends QueryModule {

  /** Orders with the reference's binary flags (P8/P9, X5: `is_winner`,
    * `top10_finish` analogues over testdata). */
  private def orderFlags(t: Tables): DataFrame =
    t.orders
      .withColumn("is_big", when(col("o_totalprice") > 200000, 1).otherwise(0))
      .withColumn("is_urgent", when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))

  /** A1 career stats over orders keyed by customer (exact-cents averaging). */
  private def careerStats(t: Tables): DataFrame =
    orderFlags(t)
      .withColumn("price_cents", Exact.cents(col("o_totalprice")))
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("total_orders"),
        sum(col("price_cents")).as("sum_cents"),
        sum(col("is_big")).as("big_orders"),
        sum(col("is_urgent")).as("urgent_orders"))
      .select(
        col("o_custkey"), col("total_orders"),
        Exact.avgFromCents(col("sum_cents"), col("total_orders")).as("avg_price"),
        col("big_orders"), col("urgent_orders"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1,P4-P6,F1: projection + filter + scalar arithmetic; filter and the
    // 4-column projection push into the parquet scan.
    "q01_project_filter" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") < lit("2024-06-01").cast("timestamp") &&
          col("l_quantity") > 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("charge"),
          col("l_returnflag"))
    }),

    // P8/P9 + X5: when/otherwise binary flags.
    "q02_flags_case" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.select(
        col("o_orderkey"), col("o_custkey"),
        when(col("o_totalprice") > 200000, 1).otherwise(0).as("is_big"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("is_urgent"),
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("is_finished"))
    }),

    // A1: per-key career stats (count/avg/sum hash aggregation).
    "q03_career_stats" -> ((s, dir) => careerStats(Tables(s, dir))),

    // A1+A5+W1+F2 flagship: stats → weighted score → row_number rank → top-10.
    "q04_ranking_topk" -> ((s, dir) => {
      val scored = careerStats(Tables(s, dir)).withColumn("ranking_score",
        col("avg_price") / lit(100.0) + col("big_orders") * lit(100.0) +
          col("total_orders") * lit(10.0) + col("urgent_orders") * lit(50.0))
      Ranking.rankTopK(scored, "ranking_score", "o_custkey", 10)
    }),
  )

  /** Shared A1 oracle fragment (exact-cents averaging). */
  private val statsSql: String =
    """SELECT o_custkey,
      |       count(*) AS total_orders,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_price,
      |       CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS big_orders,
      |       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders
      |FROM orders GROUP BY o_custkey""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_project_filter" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
        |       l_returnflag
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2024-06-01' AND l_quantity > 10""".stripMargin,

    "q02_flags_case" ->
      """SELECT o_orderkey, o_custkey,
        |       CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END AS is_big,
        |       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent,
        |       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_finished
        |FROM orders""".stripMargin,

    "q03_career_stats" -> statsSql,

    "q04_ranking_topk" ->
      s"""WITH stats AS ($statsSql),
        |scored AS (
        |  SELECT *, avg_price / 100.0 + big_orders * 100.0
        |            + total_orders * 10.0 + urgent_orders * 50.0 AS ranking_score
        |  FROM stats
        |)
        |SELECT * FROM (
        |  SELECT *, row_number() OVER (ORDER BY ranking_score DESC, o_custkey) AS rank
        |  FROM scored
        |) WHERE rank <= 10""".stripMargin,
  )
}
