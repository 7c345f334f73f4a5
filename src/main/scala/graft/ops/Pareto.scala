package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) queries: the rows no other row dominates —
  * "best" under two criteria at once without collapsing them into one
  * weighted score (the q04 ranking approach, which silently bakes in a
  * trade-off rate the analyst never chose).
  *
  * Cited reference behavior: the reference's ranking surfaces
  * (`/root/reference/spark_apps/advanced_analytics.py` weighted top-k)
  * answer "best overall"; the skyline answers "not worse than anyone on
  * every axis", the multi-criteria shortlist question.
  */
object Pareto {

  /** 2-D maximal skyline over (x, y), both MAXIMIZED (negate a column
    * upstream to minimize it): the distinct (x, y) points for which no
    * other point has x' ≥ x AND y' ≥ y with strict inequality in at
    * least one coordinate.
    *
    * The dominance scan is the q84/q205 histogram argument twice over:
    * first collapse to distinct (x, y) with multiplicity, then per x
    * keep only the max y (anything below it is dominated at equal x),
    * then one running-max window over DISTINCT x descending — a point
    * survives iff its y strictly exceeds every y seen at larger x. The
    * global window therefore orders the per-x maxima, bounded by
    * distinct-x cardinality (value-histogram-sized), not by row count.
    *
    * @return (x, y, n_at) — frontier points with the number of input
    *         rows sitting exactly at that point, x/y under the input
    *         column names
    */
  def skylineMax(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pxy = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n_at"))
    val wPerX = org.apache.spark.sql.expressions.Window
      .partitionBy(col(xCol)).orderBy(col(yCol).desc)
    val px = pxy
      .withColumn("__rn", row_number().over(wPerX))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val wPrev = org.apache.spark.sql.expressions.Window
      .orderBy(col(xCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    px
      .withColumn("__prevMax", max(col(yCol)).over(wPrev))
      .filter(col("__prevMax").isNull || col(yCol) > col("__prevMax"))
      .drop("__prevMax")
  }

  /** DuckDB oracle for [[skylineMax]]: `innerSql` yields
    * (`xName`, `yName`) per input row. */
  def skylineMaxOracleSql(innerSql: String, xName: String,
      yName: String): String =
    s"""WITH b AS (
       |  SELECT $xName AS x, $yName AS y FROM ($innerSql)
       |  WHERE $xName IS NOT NULL AND $yName IS NOT NULL
       |), pxy AS (
       |  SELECT x, y, CAST(count(*) AS BIGINT) AS n_at FROM b GROUP BY 1, 2
       |), px AS (
       |  SELECT x, y, n_at FROM (
       |    SELECT *, row_number() OVER (PARTITION BY x ORDER BY y DESC)
       |      AS rn
       |    FROM pxy) WHERE rn = 1
       |), f AS (
       |  SELECT *, max(y) OVER (ORDER BY x DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM px
       |)
       |SELECT x AS $xName, y AS $yName, n_at FROM f
       |WHERE pm IS NULL OR y > pm""".stripMargin
}
