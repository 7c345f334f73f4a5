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
    val cov = Covariance.covarianceMatrix(df, vecCol, dim)
      .select(col("i"), col("j"),
        floor(col("cov") * lit(1e9)).cast("long").as("m"))
    val full = cov.unionAll(
      cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("m")))
      .localCheckpoint() // read every round — never recompute the corpus
    val v = iterate(full, dim, rounds)
    val dims = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("j"),
        floor(col("x").cast("double") * lit(1000.0)).cast("long").as("q"))
    dims.join(broadcast(v), Seq("j"))
      .groupBy(col(idCol))
      .agg(sum(col("q") * col("vj")).as("pc1_q"))
  }

  /** The shared power-iteration loop over a (i, j, m) matrix frame. */
  private def iterate(full: DataFrame, dim: Int, rounds: Int): DataFrame = {
    val spark = full.sparkSession
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
    v
  }

  /** SECOND principal component by DEFLATION: power-iterate to v1,
    * subtract its rank-1 variance slab
    * C' = C − (v1ᵀCv1/‖v1‖²)·v1v1ᵀ/‖v1‖², and power-iterate again —
    * eigen-depth with the same no-library, engine-exact machinery.
    *
    * Integer ledger for the deflation term: λ_num = Σ v1ᵢ·mᵢⱼ·v1ⱼ and
    * n2 = Σ v1ⱼ² are EXACT longs (≤ dim²·10⁹·512² < 2⁶³, ≤ dim·512²);
    * the per-cell subtraction trunc((λ_num·v1ᵢ)·v1ⱼ/(n2·n2)) would
    * overflow long, so it runs as ONE fixed double sequence (left-
    * assoc multiplies, one divide, trunc) — beyond 2⁵³ it is merely
    * IDENTICAL cross-engine rather than exact, which is all a
    * deflation residual needs (the q191/q198 doctrine).
    *
    * @return (idCol, pc2_q) — integer projection on the second axis;
    *         PcaSpec plants an exactly-diagonal covariance and checks
    *         pc2_q = q(y)·512 by hand */
  def pc2Projection(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, rounds: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 12)
    val cov = Covariance.covarianceMatrix(df, vecCol, dim)
      .select(col("i"), col("j"),
        floor(col("cov") * lit(1e9)).cast("long").as("m"))
    val full = cov.unionAll(
      cov.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("m")))
      .localCheckpoint()
    val v1 = iterate(full, dim, rounds).localCheckpoint()
    val lamNum = full
      .join(broadcast(v1.select(col("j").as("i"), col("vj").as("vi"))),
        Seq("i"))
      .join(broadcast(v1), Seq("j"))
      .agg(sum(col("m") * col("vi") * col("vj")).as("lam_num"))
    val n2 = v1.agg(sum(col("vj") * col("vj")).as("n2"))
    val deflated = full
      .join(broadcast(v1.select(col("j").as("i"), col("vj").as("vi"))),
        Seq("i"))
      .join(broadcast(v1), Seq("j"))
      .crossJoin(broadcast(lamNum)).crossJoin(broadcast(n2))
      .select(col("i"), col("j"),
        (col("m") -
          (col("lam_num").cast("double") * col("vi").cast("double") *
            col("vj").cast("double") /
            (col("n2").cast("double") * col("n2").cast("double")))
            .cast("long")).as("m"))
      .localCheckpoint()
    val v2 = iterate(deflated, dim, rounds)
    val dims = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("j"),
        floor(col("x").cast("double") * lit(1000.0)).cast("long").as("q"))
    dims.join(broadcast(v2), Seq("j"))
      .groupBy(col(idCol))
      .agg(sum(col("q") * col("vj")).as("pc2_q"))
  }

  /** DuckDB oracle for [[pc2Projection]] — both iteration chains and
    * the deflation, fully unrolled. */
  def pc2OracleSql(table: String, idCol: String, vecCol: String,
      dim: Int, rounds: Int = 6): String = {
    val covSql = Covariance.covarianceOracleSql(table, vecCol, dim)
    def chain(pfx: String, matCte: String): String =
      (1 to rounds).map { r =>
        s"""${pfx}w$r AS (
           |  SELECT m.i, CAST(sum(m.m * v.vj) AS BIGINT) AS wv
           |  FROM $matCte m JOIN ${pfx}v${r - 1} v ON v.j = m.j
           |  GROUP BY 1
           |), ${pfx}d$r AS (
           |  SELECT CAST(max(abs(wv)) AS BIGINT) AS d FROM ${pfx}w$r
           |), ${pfx}v$r AS MATERIALIZED (
           |  SELECT i AS j,
           |         CASE WHEN d > 0 THEN
           |           CAST(trunc(CAST(wv AS DOUBLE) * 512.0 / d) AS BIGINT)
           |         ELSE 0 END AS vj
           |  FROM ${pfx}w$r, ${pfx}d$r
           |)""".stripMargin
      }.mkString(", ")
    s"""WITH covm AS MATERIALIZED ($covSql),
       |cq AS MATERIALIZED (
       |  SELECT i, j, CAST(floor(cov * 1000000000.0) AS BIGINT) AS m
       |  FROM covm
       |), fm AS MATERIALIZED (
       |  SELECT i, j, m FROM cq
       |  UNION ALL SELECT j AS i, i AS j, m FROM cq WHERE i <> j
       |), av0 AS (
       |  SELECT unnest(range(1, ${dim + 1})) AS j, CAST(512 AS BIGINT) AS vj
       |), ${chain("a", "fm")},
       |lam AS (
       |  SELECT CAST(sum(m.m * vi.vj * vj.vj) AS BIGINT) AS lam_num
       |  FROM fm m
       |  JOIN av$rounds vi ON vi.j = m.i
       |  JOIN av$rounds vj ON vj.j = m.j
       |), nn AS (
       |  SELECT CAST(sum(vj * vj) AS BIGINT) AS n2 FROM av$rounds
       |), dm AS MATERIALIZED (
       |  SELECT m.i, m.j,
       |         m.m - CAST(trunc(
       |           CAST(lam_num AS DOUBLE) * CAST(vi.vj AS DOUBLE)
       |             * CAST(vj.vj AS DOUBLE)
       |             / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)))
       |           AS BIGINT) AS m
       |  FROM fm m
       |  JOIN av$rounds vi ON vi.j = m.i
       |  JOIN av$rounds vj ON vj.j = m.j
       |  CROSS JOIN lam CROSS JOIN nn
       |), bv0 AS (
       |  SELECT unnest(range(1, ${dim + 1})) AS j, CAST(512 AS BIGINT) AS vj
       |), ${chain("b", "dm")},
       |dims AS (
       |  SELECT $idCol, CAST(pr[2] AS BIGINT) + 1 AS j,
       |         CAST(floor(CAST(pr[1] AS DOUBLE) * 1000.0) AS BIGINT) AS q
       |  FROM (SELECT $idCol, unnest(list_zip($vecCol,
       |          range(0, len($vecCol)))) AS pr FROM $table)
       |)
       |SELECT $idCol, CAST(sum(q * vj) AS BIGINT) AS pc2_q
       |FROM dims JOIN bv$rounds v ON v.j = dims.j
       |GROUP BY 1""".stripMargin
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
