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
