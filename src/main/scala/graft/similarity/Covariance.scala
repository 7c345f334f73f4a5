package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Exact

/** Second-moment statistics over an embedding column: the exact
  * covariance matrix (what PCA / whitening / Mahalanobis consume) and
  * per-dimension standardization (the classic StandardScaler). Both are
  * built on integer micro quantization so every aggregated sum is exact
  * and order-independent — the [[KMeans.exactMeanByKey]] recipe extended
  * to second moments.
  *
  * Scale shape: the covariance upper triangle is generated PER ROW by a
  * nested position explode (dim(dim+1)/2 product terms per vector — a
  * constant of the embedding width) feeding ONE map-side-combinable
  * aggregation: no self-join, no shuffle of vector pairs. The scaler is
  * one dim-keyed stats aggregation (64 rows, broadcast back) + a per-row
  * expression.
  *
  * Sum bounds: |q| ≤ scale·|x|; Gram sums hold exactly in int64 up to
  * n·(scale·|x|)² ≈ 9·10¹⁸ — with unit-scale embeddings at micro
  * quantization that is ~10⁷ rows; beyond that, drop `scale` a decade
  * per 100× rows (the report's resolution scales with it).
  */
object Covariance {

  /** Exact upper-triangle covariance matrix.
    *
    * @param dim embedding width (declared, not inferred — schema is a
    *            contract, and inferring it would cost a pass)
    * @return (i, j, n, gram, cov) for 1 ≤ i ≤ j ≤ dim — `gram` the exact
    *         integer Σ qᵢqⱼ in micro², `cov` the sample covariance in
    *         original units by one fixed IEEE sequence
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int,
      scale: Double = 1e6): DataFrame = {
    val q = (p: org.apache.spark.sql.Column) =>
      floor(element_at(col("__v"), p.cast("int")).cast("double") * scale)
        .cast("long")
    val prods = df.select(col(vecCol).as("__v"))
      .select(col("__v"), explode(sequence(lit(1), lit(dim))).as("i"))
      .select(col("__v"), col("i"),
        explode(sequence(col("i"), lit(dim))).as("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        (q(col("i")) * q(col("j"))).as("p"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("gram"))
    val sums = df.select(col(vecCol).as("__v"))
      .select(posexplode(col("__v")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("pos"),
        floor(col("x").cast("double") * scale).cast("long").as("q"))
      .groupBy(col("pos")).agg(sum(col("q")).as("s"))
    prods
      .join(broadcast(sums.select(col("pos").as("i"), col("s").as("__si"))),
        Seq("i"))
      .join(broadcast(sums.select(col("pos").as("j"), col("s").as("__sj"))),
        Seq("j"))
      .select(col("i"), col("j"), col("n"), col("gram"),
        ((col("gram").cast("double") -
          col("__si").cast("double") * col("__sj").cast("double") / col("n"))
          / (col("n") - lit(1)) / lit(scale) / lit(scale)).as("cov"))
  }

  /** DuckDB oracle for [[covarianceMatrix]]. */
  def covarianceOracleSql(table: String, vecCol: String, dim: Int,
      scale: Double = 1e6): String =
    s"""WITH prods AS (
       |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(floor(CAST($vecCol[CAST(i AS INTEGER)] AS DOUBLE)
       |                 * $scale) AS BIGINT)
       |               * CAST(floor(CAST($vecCol[CAST(j AS INTEGER)] AS DOUBLE)
       |                 * $scale) AS BIGINT)) AS BIGINT) AS gram
       |  FROM $table,
       |       (SELECT unnest(range(1, ${dim + 1})) AS i) ii,
       |       (SELECT unnest(range(1, ${dim + 1})) AS j) jj
       |  WHERE j >= i
       |  GROUP BY 1, 2
       |), sums AS (
       |  SELECT pos, CAST(sum(q) AS BIGINT) AS s
       |  FROM (
       |    SELECT CAST(pr[2] AS BIGINT) + 1 AS pos,
       |           CAST(floor(CAST(pr[1] AS DOUBLE) * $scale) AS BIGINT) AS q
       |    FROM (SELECT unnest(list_zip($vecCol,
       |            range(0, len($vecCol)))) AS pr FROM $table)
       |  ) GROUP BY 1
       |)
       |SELECT i, j, n, gram,
       |       (CAST(gram AS DOUBLE)
       |        - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE) / n)
       |       / (n - 1) / $scale / $scale AS cov
       |FROM prods
       |JOIN sums si ON si.pos = i
       |JOIN sums sj ON sj.pos = j""".stripMargin

  /** Per-dimension standardization (StandardScaler): z = (x − μᵢ)/σᵢ
    * with μ/σ from exact integer micro sums by one fixed IEEE sequence.
    * Long-form output (id, pos, z); constant dimensions (σ = 0) yield
    * NULL z — no verdict beats a fabricated 0.
    *
    * @return (idCol, pos, x, z), pos 1-based
    */
  def standardize(df: DataFrame, idCol: String, vecCol: String,
      scale: Double = 1e6): DataFrame = {
    val dims = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("x").cast("double").as("x"))
      .withColumn("__q", floor(col("x") * scale).cast("long"))
    val stats = dims.groupBy(col("pos"))
      .agg(count(lit(1)).as("__n"), sum(col("__q")).as("__s"),
        sum(col("__q") * col("__q")).as("__ss"))
      .withColumn("__mu",
        col("__s").cast("double") / col("__n") / lit(scale))
      .withColumn("__sigma",
        Exact.stddevFromSums(col("__s"), col("__ss"), col("__n"))
          / lit(scale))
      .select(col("pos"), col("__mu"), col("__sigma"))
    dims.join(broadcast(stats), Seq("pos"))
      .select(col(idCol), col("pos"), col("x"),
        when(col("__sigma") > 0,
          (col("x") - col("__mu")) / col("__sigma")).as("z"))
  }

  /** Diagonal-Mahalanobis outlier score: Σᵢ zᵢ² over [[standardize]]'s
    * per-dimension z-scores — the feature-space outlier detector
    * (corrupt vectors, wrong-model embeddings, unit mix-ups) that the
    * norm alone misses because a vector can be ordinary in length yet
    * extreme on one axis.
    *
    * Portability: z doubles are bit-identical cross-engine (fixed IEEE
    * from exact sums), so `trunc(z·1000)` is a portable integer;
    * squares then sum exactly in any order. Constant dimensions (NULL
    * z) contribute nothing and are counted out via `n_dims_scored`.
    *
    * @return (idCol, n_dims_scored, maha_q) — maha_q in milli² units;
    *         maha_q/1e6/n_dims_scored ≈ mean squared z
    */
  def mahalanobisDiag(df: DataFrame, idCol: String, vecCol: String,
      scale: Double = 1e6): DataFrame = {
    val z = standardize(df, idCol, vecCol, scale)
      .filter(col("z").isNotNull)
      .withColumn("__zq",
        (col("z") * lit(1000.0)).cast("long")) // trunc — both engines
    z.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dims_scored"),
        sum(col("__zq") * col("__zq")).as("maha_q"))
  }

  /** DuckDB oracle for [[mahalanobisDiag]]. */
  def mahalanobisDiagOracleSql(table: String, idCol: String,
      vecCol: String, scale: Double = 1e6): String =
    s"""WITH zz AS (${standardizeOracleSql(table, idCol, vecCol, scale)})
       |SELECT $idCol, CAST(count(*) AS BIGINT) AS n_dims_scored,
       |       CAST(sum(CAST(trunc(z * 1000.0) AS BIGINT)
       |         * CAST(trunc(z * 1000.0) AS BIGINT)) AS BIGINT) AS maha_q
       |FROM zz WHERE z IS NOT NULL GROUP BY 1""".stripMargin

  /** Embedding NORM AUDIT: are these vectors actually unit-normalized?
    * The one-row check in front of every cosine pipeline — a mixed
    * corpus (one encoder normalized, another not) silently turns cosine
    * rankings into magnitude rankings. Squared norms via the portable
    * left-fold dot, truncated to integer micros (exact cross-row
    * stats); `n_unit` counts vectors within `tolMicro` of 1.
    *
    * @return one row: (n, min_norm2_micro, max_norm2_micro,
    *         mean_norm2, n_unit, unit_frac)
    */
  def normAudit(df: DataFrame, vecCol: String,
      tolMicro: Long = 10000L): DataFrame = {
    val v = Similarity.toDouble(col(vecCol))
    val q = df.select(
      floor(Similarity.dot(v, v) * lit(1000000.0)).cast("long")
        .as("__q"))
    q.agg(count(lit(1)).as("n"),
        min(col("__q")).as("min_norm2_micro"),
        max(col("__q")).as("max_norm2_micro"),
        sum(col("__q")).as("__s"),
        sum(when(abs(col("__q") - 1000000L) <= tolMicro, 1L)
          .otherwise(0L)).as("n_unit"))
      .withColumn("mean_norm2",
        col("__s").cast("double") / col("n") / lit(1000000.0))
      .withColumn("unit_frac",
        col("n_unit").cast("double") / col("n"))
      .drop("__s")
  }

  /** DuckDB oracle for [[normAudit]]: `innerSql` yields one `v`
    * DOUBLE[] column. */
  def normAuditOracleSql(innerSql: String,
      tolMicro: Long = 10000L): String = {
    val dot =
      "list_reduce(list_transform(v, x -> x * x), (a, e) -> a + e)"
    s"""WITH q AS (
       |  SELECT CAST(floor($dot * 1000000.0) AS BIGINT) AS qq
       |  FROM ($innerSql)
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n,
       |       CAST(min(qq) AS BIGINT) AS min_norm2_micro,
       |       CAST(max(qq) AS BIGINT) AS max_norm2_micro,
       |       CAST(sum(qq) AS DOUBLE) / count(*) / 1000000.0
       |         AS mean_norm2,
       |       CAST(sum(CASE WHEN abs(qq - 1000000) <= $tolMicro
       |         THEN 1 ELSE 0 END) AS BIGINT) AS n_unit,
       |       CAST(sum(CASE WHEN abs(qq - 1000000) <= $tolMicro
       |         THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS unit_frac
       |FROM q""".stripMargin
  }

  /** Per-dimension embedding DRIFT between two corpus slices (model
    * version, time window, source): for every dimension, both slices'
    * exact-quantized means/variances and the two-sample z of the mean
    * shift — the embedding-space monitor that catches a silently
    * swapped encoder or preprocessing change long before downstream
    * retrieval metrics move. Top offending dims fall out by ordering
    * on |z|.
    *
    * Same micro-quantized ledger as [[standardize]]: components
    * `⌊x·scale⌋` sum exactly, readouts are fixed IEEE:
    * `z = (μ_b − μ_a) / √(σ²_a/n_a + σ²_b/n_b)`.
    *
    * @return per dim: (pos, n_a, n_b, mean_a, mean_b, z) — z NULL when
    *         either slice is constant on the dim
    */
  def dimDrift(a: DataFrame, b: DataFrame, vecCol: String,
      scale: Double = 1e6): DataFrame = {
    def stats(df: DataFrame, suffix: String) = df
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("pos"),
        floor(col("x").cast("double") * scale).cast("long").as("q"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as(s"n_$suffix"), sum(col("q")).as(s"s_$suffix"),
        sum(col("q") * col("q")).as(s"ss_$suffix"))
    def mu(s: String, n: String) =
      col(s).cast("double") / col(n) / lit(scale)
    def varr(s: String, ss: String, n: String) =
      (col(ss).cast("double") -
        col(s).cast("double") * col(s).cast("double") / col(n)) /
        (col(n) - 1) / lit(scale) / lit(scale)
    val joined = stats(a, "a").join(stats(b, "b"), "pos")
    val va = varr("s_a", "ss_a", "n_a")
    val vb = varr("s_b", "ss_b", "n_b")
    joined.select(col("pos"), col("n_a"), col("n_b"),
      mu("s_a", "n_a").as("mean_a"), mu("s_b", "n_b").as("mean_b"),
      when(va + vb > 0,
        (mu("s_b", "n_b") - mu("s_a", "n_a")) /
          sqrt(va / col("n_a") + vb / col("n_b"))).as("z"))
  }

  /** DuckDB oracle for [[dimDrift]]: `aSql`/`bSql` yield one `v`
    * embedding-list column. */
  def dimDriftOracleSql(aSql: String, bSql: String,
      scale: Double = 1e6): String = {
    def statsCte(src: String, sfx: String) =
      s"""SELECT CAST(pr[2] AS BIGINT) + 1 AS pos,
         |       CAST(count(*) AS BIGINT) AS n_$sfx,
         |       CAST(sum(CAST(floor(CAST(pr[1] AS DOUBLE) * $scale)
         |         AS BIGINT)) AS BIGINT) AS s_$sfx,
         |       CAST(sum(CAST(floor(CAST(pr[1] AS DOUBLE) * $scale)
         |         AS BIGINT) * CAST(floor(CAST(pr[1] AS DOUBLE) * $scale)
         |         AS BIGINT)) AS BIGINT) AS ss_$sfx
         |FROM (SELECT unnest(list_zip(v, range(0, len(v)))) AS pr
         |      FROM ($src))
         |GROUP BY 1""".stripMargin
    def mu(s: String, n: String) = s"CAST($s AS DOUBLE) / $n / $scale"
    def varr(s: String, ss: String, n: String) =
      s"""(CAST($ss AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE)
         | / $n) / ($n - 1) / $scale / $scale""".stripMargin
        .replace("\n", "")
    val va = varr("s_a", "ss_a", "n_a")
    val vb = varr("s_b", "ss_b", "n_b")
    s"""WITH sa AS (${statsCte(aSql, "a")}),
       |sb AS (${statsCte(bSql, "b")})
       |SELECT sa.pos, n_a, n_b,
       |       ${mu("s_a", "n_a")} AS mean_a,
       |       ${mu("s_b", "n_b")} AS mean_b,
       |       CASE WHEN $va + $vb > 0 THEN
       |         (${mu("s_b", "n_b")} - ${mu("s_a", "n_a")})
       |           / sqrt(($va) / n_a + ($vb) / n_b)
       |       END AS z
       |FROM sa JOIN sb ON sa.pos = sb.pos""".stripMargin
  }

  /** DuckDB oracle for [[standardize]]. */
  def standardizeOracleSql(table: String, idCol: String, vecCol: String,
      scale: Double = 1e6): String =
    s"""WITH dims AS (
       |  SELECT $idCol, CAST(pr[2] AS BIGINT) + 1 AS pos,
       |         CAST(pr[1] AS DOUBLE) AS x,
       |         CAST(floor(CAST(pr[1] AS DOUBLE) * $scale) AS BIGINT) AS q
       |  FROM (SELECT $idCol, unnest(list_zip($vecCol,
       |          range(0, len($vecCol)))) AS pr FROM $table)
       |), st AS (
       |  SELECT pos, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(q) AS BIGINT) AS s,
       |         CAST(sum(q * q) AS BIGINT) AS ss
       |  FROM dims GROUP BY 1
       |), ms AS (
       |  SELECT pos, CAST(s AS DOUBLE) / n / $scale AS mu,
       |         sqrt((CAST(ss AS DOUBLE)
       |           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
       |           / (n - 1)) / $scale AS sigma
       |  FROM st
       |)
       |SELECT $idCol, dims.pos, x,
       |       CASE WHEN sigma > 0 THEN (x - mu) / sigma END AS z
       |FROM dims JOIN ms ON ms.pos = dims.pos""".stripMargin
}
