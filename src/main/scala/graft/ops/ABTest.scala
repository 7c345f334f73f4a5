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
}
