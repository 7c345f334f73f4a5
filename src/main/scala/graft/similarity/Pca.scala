package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First principal component by fixed-round power iteration — PCA's
  * workhorse direction (dominant variance axis: the "topic" of an
  * embedding corpus, the axis whitening removes first) with every step
  * engine-exact, no linear-algebra library in sight.
  *
  * The trick chain: [[Covariance.covarianceMatrix]]'s `cov` doubles are
  * bit-identical cross-engine (fixed IEEE derivation from exact integer
  * sums — q191's green hash proves it), so `floor(cov·10⁹)` is a
  * PORTABLE INTEGER matrix. Power iteration then runs entirely in
  * integers: matvec sums are order-independent integer aggregations,
  * and the per-round renormalization (max-|component| → 512) is one
  * fixed double sequence whose trunc both engines replicate. R rounds
  * of a deterministic recurrence — the q63/q104/q121 unrolled-oracle
  * pattern, in matrix clothes.
  *
  * Magnitude ledger (the reason every constant here is what it is):
  * |Cq| ≤ 10⁹·|cov|; |v| ≤ 512 ⇒ |matvec| ≤ dim·|Cq|·512, and the
  * rescale multiplies by 512 before dividing — all < 2⁵³, so the double
  * arithmetic is exact where it must be and merely identical where it
  * need not be.
  *
  * Scale shape: the matrix is dim² rows (a constant), each round is a
  * broadcast join + 64-row aggregation; only the final projection
  * touches the corpus (one explode + one keyed sum). The iteration cost
  * does not grow with rows AT ALL — the corpus is read once for the
  * covariance and once for the projection.
  */
object Pca {

  /** Project every vector onto the power-iterated PC1 direction.
    *
    * @param rounds fixed iteration count (deterministic, unrolled in
    *               the oracle); 6 is plenty for a dominant eigengap
    * @return (idCol, pc1_q) — the integer projection Σ qᵢvᵢ in
    *         milli·(v-unit) space; ranking/binning-ready, sign shared
    *         by construction with the oracle
    */
  def pc1Projection(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, rounds: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 12)
    val spark = df.sparkSession
    val cov = Covariance.covarianceMatrix(df, vecCol, dim)
      .select(col("i"), col("j"),
        floor(col("cov") * lit(1e9)).cast("long").as("m"))
    val full = cov.unionAll(
      cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("m")))
      .localCheckpoint() // read every round — never recompute the corpus
    var v: DataFrame = spark.range(1, dim + 1)
      .select(col("id").as("j"), lit(512L).as("vj"))
    (1 to rounds).foreach { _ =>
      val w = full.join(broadcast(v), Seq("j"))
        .groupBy(col("i")).agg(sum(col("m") * col("vj")).as("wv"))
      val d = w.agg(max(abs(col("wv"))).as("d"))
      v = w.crossJoin(broadcast(d))
        .select(col("i").as("j"),
          when(col("d") > 0,
            (col("wv").cast("double") * lit(512.0) / col("d"))
              .cast("long"))
            .otherwise(lit(0L)).as("vj"))
    }
    val dims = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("j"),
        floor(col("x").cast("double") * lit(1000.0)).cast("long").as("q"))
    dims.join(broadcast(v), Seq("j"))
      .groupBy(col(idCol))
      .agg(sum(col("q") * col("vj")).as("pc1_q"))
  }

  /** DuckDB oracle for [[pc1Projection]]: the identical recurrence,
    * rounds unrolled as CTEs over [[Covariance.covarianceOracleSql]]. */
  def pc1OracleSql(table: String, idCol: String, vecCol: String,
      dim: Int, rounds: Int = 6): String = {
    val covSql = Covariance.covarianceOracleSql(table, vecCol, dim)
    val steps = (1 to rounds).map { r =>
      s"""w$r AS (
         |  SELECT m.i, CAST(sum(m.m * v.vj) AS BIGINT) AS wv
         |  FROM fm m JOIN v${r - 1} v ON v.j = m.j
         |  GROUP BY 1
         |), d$r AS (SELECT CAST(max(abs(wv)) AS BIGINT) AS d FROM w$r),
         |v$r AS (
         |  SELECT i AS j,
         |         CASE WHEN d > 0 THEN
         |           CAST(trunc(CAST(wv AS DOUBLE) * 512.0 / d) AS BIGINT)
         |         ELSE 0 END AS vj
         |  FROM w$r, d$r
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH covm AS ($covSql),
       |cq AS (
       |  SELECT i, j, CAST(floor(cov * 1000000000.0) AS BIGINT) AS m
       |  FROM covm
       |), fm AS (
       |  SELECT i, j, m FROM cq
       |  UNION ALL SELECT j AS i, i AS j, m FROM cq WHERE i <> j
       |), v0 AS (
       |  SELECT unnest(range(1, ${dim + 1})) AS j, CAST(512 AS BIGINT) AS vj
       |), $steps,
       |dims AS (
       |  SELECT $idCol, CAST(pr[2] AS BIGINT) + 1 AS j,
       |         CAST(floor(CAST(pr[1] AS DOUBLE) * 1000.0) AS BIGINT) AS q
       |  FROM (SELECT $idCol, unnest(list_zip($vecCol,
       |          range(0, len($vecCol)))) AS pr FROM $table)
       |)
       |SELECT $idCol, CAST(sum(q * vj) AS BIGINT) AS pc1_q
       |FROM dims JOIN v$rounds v ON v.j = dims.j
       |GROUP BY 1""".stripMargin
  }
}
