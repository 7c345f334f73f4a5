package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine exact arithmetic helpers.
  *
  * The driver's correctness gate hash-compares Spark output against DuckDB.
  * Float aggregates are NOT portable: accumulation order differs, and even
  * `round(x, k)` diverges (Spark rounds `BigDecimal.valueOf(toString)`
  * HALF_UP; DuckDB rounds the binary value). The portable recipe:
  *
  *  1. convert 2-decimal metric doubles to exact integer cents
  *     (`round(x*100) → long` — inputs are exactly 2-decimal, so the
  *     product is within 1e-9 of an integer and never near a .5 boundary);
  *  2. aggregate the integers (exact in both engines);
  *  3. derive the floating result with an IDENTICAL double-op sequence on
  *     both sides (IEEE ops on equal inputs are bit-equal).
  */
object Exact {
  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** `sumCents / n / 100.0` — the canonical exact average. The oracle SQL
    * must spell the same sequence: `CAST(s AS DOUBLE) / n / 100.0`. */
  def avgFromCents(sumCents: Column, n: Column): Column =
    sumCents.cast("double") / n / lit(100.0)

  /** Sample standard deviation (in cents space) from exact integer sums:
    * `sqrt((ss - s*s/n) / (n-1))`, all in doubles. `ss` must be aggregated
    * exactly (DECIMAL(38,0) in Spark / HUGEINT in DuckDB when cents² sums
    * can exceed int64). */
  def stddevFromSums(s: Column, ss: Column, n: Column): Column =
    sqrt((ss.cast("double") - s.cast("double") * s.cast("double") / n) / (n - lit(1)))

  /** Pearson correlation from exact integer sums — the oracle-able form
    * of `corr(x, y)`: the built-in aggregate accumulates doubles in
    * partition order and can never hash-match another engine; integer
    * sums are order-independent, and this one fixed IEEE sequence on both
    * sides is bit-equal. `sxx`/`syy`/`sxy` must be aggregated exactly
    * (DECIMAL(38,0) / HUGEINT via the VARCHAR route when products can
    * exceed int64 — see q07's ss note). NULL (no verdict) when either
    * variance is 0 — a constant column has no correlation, and both
    * engines would otherwise emit a 0/0 NaN that ranks above every
    * double. Oracle spells the identical sequence:
    * `(sxy - sx*sy/n) / (sqrt(sxx - sx*sx/n) * sqrt(syy - sy*sy/n))`
    * with every sum `CAST ... AS DOUBLE` first. */
  def corrFromSums(n: Column, sx: Column, sy: Column,
      sxx: Column, syy: Column, sxy: Column): Column = {
    val cov = sxy.cast("double") - sx.cast("double") * sy.cast("double") / n
    val vx = sxx.cast("double") - sx.cast("double") * sx.cast("double") / n
    val vy = syy.cast("double") - sy.cast("double") * sy.cast("double") / n
    when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy)))
  }

  /** DuckDB rendering of [[corrFromSums]] — the identical IEEE
    * sequence, for oracle generators (the q161 formulation). */
  def corrFromSumsSql(n: String, sx: String, sy: String,
      sxx: String, syy: String, sxy: String): String = {
    val cov = s"CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE) / $n"
    val vx = s"CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE) / $n"
    val vy = s"CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE) / $n"
    s"""CASE WHEN $vx > 0 AND $vy > 0
       |  THEN ($cov) / (sqrt($vx) * sqrt($vy)) END""".stripMargin
  }
}
