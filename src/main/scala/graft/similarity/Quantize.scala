package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding int8 quantization: per-dimension affine calibration
  * (min/max → 255 levels), code assignment, and the reconstruction-error
  * report that tells you whether int8 serving is safe for this corpus —
  * the 4× memory/bandwidth lever every large vector deployment pulls
  * before touching PQ ([[PQ]] is the next compression stop at 8×+).
  *
  * Exactness: calibration min/max are aggregated floats (no accumulation
  * — portable); codes are `floor((x − min)·255/(max − min))` clamped to
  * [0, 255] — floor of one fixed IEEE expression, bit-equal cross-engine;
  * absolute reconstruction errors quantize to integer micros BEFORE the
  * sum, so the report aggregates exactly. Constant dimensions (max = min)
  * carry no information: code 0, reconstruction = min, zero error.
  *
  * Scale shape: calibration is one dim-keyed aggregation (output = dim
  * rows, broadcast back); everything after is a per-row expression. The
  * error report is one more map-side-combinable aggregation.
  */
object Quantize {

  /** Per-dimension (pos, min_x, max_x) calibration frame. */
  def calibrate(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos").cast("long").as("pos"))
      .agg(min(col("x").cast("double")).as("min_x"),
        max(col("x").cast("double")).as("max_x"))

  /** Quantize every vector against [[calibrate]]'s ranges and report
    * reconstruction error per `byCol` group.
    *
    * @return (byCol, n_values, n_saturated, sum_abs_err_micro,
    *         mean_abs_err) — n_saturated counts codes at the 0/255
    *         rails (a high rail share means outliers stole the range:
    *         re-calibrate on percentiles)
    */
  def quantizeError(df: DataFrame, byCol: String, vecCol: String)
      : DataFrame = {
    val calib = calibrate(df, vecCol)
    val dims = df
      .select(col(byCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(byCol), col("pos").cast("long").as("pos"),
        col("x").cast("double").as("x"))
      .join(broadcast(calib), Seq("pos"))
    val span = col("max_x") - col("min_x")
    val code = when(span > 0,
      greatest(lit(0L), least(lit(255L),
        floor((col("x") - col("min_x")) * lit(255.0) / span).cast("long"))))
      .otherwise(lit(0L))
    val recon = when(span > 0,
      col("min_x") + code.cast("double") * span / lit(255.0))
      .otherwise(col("min_x"))
    dims
      .withColumn("__code", code)
      .withColumn("__live", span > 0) // constant dims have no rails
      .withColumn("__err_micro",
        floor(abs(col("x") - recon) * lit(1000000.0)).cast("long"))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_values"),
        sum(when(col("__live") &&
            (col("__code") === 0L || col("__code") === 255L), 1L)
          .otherwise(0L)).as("n_saturated"),
        sum(col("__err_micro")).as("sum_abs_err_micro"))
      .withColumn("mean_abs_err",
        col("sum_abs_err_micro").cast("double") / col("n_values")
          / lit(1000000.0))
  }

  /** DuckDB oracle for [[quantizeError]] over `table(byCol, vecCol)`. */
  def quantizeErrorOracleSql(table: String, byCol: String, vecCol: String)
      : String =
    s"""WITH dims AS (
       |  SELECT $byCol, CAST(pr[2] AS BIGINT) AS pos,
       |         CAST(pr[1] AS DOUBLE) AS x
       |  FROM (SELECT $byCol, unnest(list_zip($vecCol,
       |          range(0, len($vecCol)))) AS pr FROM $table)
       |), calib AS (
       |  SELECT pos, min(x) AS min_x, max(x) AS max_x
       |  FROM dims GROUP BY 1
       |), coded AS (
       |  SELECT $byCol,
       |         CASE WHEN max_x - min_x > 0 THEN
       |           greatest(0, least(255, CAST(floor((x - min_x) * 255.0
       |             / (max_x - min_x)) AS BIGINT)))
       |         ELSE 0 END AS code,
       |         max_x - min_x > 0 AS live,
       |         x, min_x, max_x
       |  FROM dims JOIN calib USING (pos)
       |), err AS (
       |  SELECT $byCol, code, live,
       |         CAST(floor(abs(x - (CASE WHEN max_x - min_x > 0
       |           THEN min_x + CAST(code AS DOUBLE) * (max_x - min_x) / 255.0
       |           ELSE min_x END)) * 1000000.0) AS BIGINT) AS e
       |  FROM coded
       |)
       |SELECT $byCol, CAST(count(*) AS BIGINT) AS n_values,
       |       CAST(sum(CASE WHEN live AND (code = 0 OR code = 255)
       |         THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated,
       |       CAST(sum(e) AS BIGINT) AS sum_abs_err_micro,
       |       CAST(sum(e) AS DOUBLE) / count(*) / 1000000.0 AS mean_abs_err
       |FROM err GROUP BY 1""".stripMargin
}
