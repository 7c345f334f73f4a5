package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped quantiles, exact and sketched — the latency-percentile shape of
  * every telemetry dashboard.
  *
  * [[exact]] computes DISCRETE quantiles (the element at rank
  * `ceil(p·n)`), not interpolated ones: selecting a value BY RANK from the
  * sorted group is deterministic across engines and tie orders (equal
  * values are interchangeable under a value-only sort), so the result
  * hash-matches a DuckDB window recomputation (q40) — interpolation
  * formulas (`a + (b−a)·f` vs `(1−f)·a + f·b`) do NOT bit-match across
  * engines. Cost: one window sort per group — inherent to exactness; the
  * shuffle is keyed by group and the frame is running, so memory is
  * per-partition sort, not per-row rescan.
  *
  * [[approx]] is the 100 TB path: `approx_percentile` (KLL-style mergeable
  * sketch) — fixed-size buffers, map-side combined, rank error ≤ 1/accuracy.
  * Sketch internals are engine-specific (no SQL oracle); QuantilesSpec
  * bounds it against [[exact]], mirroring the HLL rollup pattern. */
object Quantiles {

  private def colName(p: Double): String =
    "p" + (p * 100).round.toString

  /** One row per group: `p<NN>` columns with the exact discrete quantile
    * values of `v` (long-typed, e.g. cents). */
  def exact(df: DataFrame, grp: Seq[Column], v: Column,
      ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(grp: _*).orderBy(v)
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
    val aggs = ps.map(p =>
      max(when(col("__rn") === ceil(lit(p) * col("__n")), v)).as(colName(p)))
    ranked.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketched form, same output shape. `accuracy` trades memory for rank
    * error (default 10000 ≈ 0.01% rank error). */
  def approx(df: DataFrame, grp: Seq[Column], v: Column, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map(p => approx_percentile(v, lit(p), lit(accuracy)).as(colName(p)))
    df.groupBy(grp: _*).agg(aggs.head, aggs.tail: _*)
  }
}
