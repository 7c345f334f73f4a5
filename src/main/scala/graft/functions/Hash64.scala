package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine 60-bit hash: the first 15 hex chars of md5, read as a
  * non-negative long (60 bits < 2^63, so no sign issues in either engine).
  *
  * Exists so the hash-family operators (MinHash signatures, SimHash bits,
  * LSH hyperplanes) are oracle-checkable: DuckDB computes the identical
  * value as `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`. Spark's
  * `xxhash64` would be ~3x faster per call but has no DuckDB equivalent,
  * which is why round 1's MinHash/SimHash had no correctness oracle.
  * `md5`/`conv`/`substring` are all codegen'd Catalyst expressions.
  */
object Hash64 {

  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Seeded variant (independent hash family member per seed): prefix the
    * payload with "seed:". */
  def seeded(seed: Int, s: Column): Column =
    hash60(concat(lit(s"$seed:"), s))

  /** DuckDB fragment computing the same value as [[hash60]]. */
  def duckSql(inner: String): String =
    s"CAST('0x' || substr(md5($inner), 1, 15) AS BIGINT)"

  /** DuckDB fragment computing the same value as [[seeded]]. */
  def duckSeededSql(seed: Int, inner: String): String =
    duckSql(s"'$seed:' || $inner")
}
