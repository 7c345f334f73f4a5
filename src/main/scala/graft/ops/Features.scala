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
