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

  /** Since round 3 this resolves to the native [[Hash60]] expression —
    * same value, computed from the digest bytes without materializing the
    * 32-char hex string or the base-16 re-parse (NearDupSpec asserts
    * bit-parity with the chain). The SQL chain in [[duckSql]] stays the
    * oracle formulation. */
  def hash60(s: Column): Column = Hash60.hash60(s)

  /** Production-mode 60-bit hash: `xxhash64` masked into the same
    * non-negative 60-bit domain as [[hash60]] (so [[mixed]] and every
    * downstream banding scheme work unchanged). ~3x cheaper per call than
    * the md5 path but has NO DuckDB equivalent — oracle-checked pipelines
    * keep [[hash60]]; production runs opt in per operator (e.g.
    * `NearDup.minhashSignatures(..., hash = Hash64.fast60)`). The bench's
    * x27 extra measures the headroom. */
  def fast60(s: Column): Column =
    xxhash64(s).bitwiseAND(lit((1L << 60) - 1))

  /** DuckDB fragment computing the same value as [[hash60]]. */
  def duckSql(inner: String): String =
    s"CAST('0x' || substr(md5($inner), 1, 15) AS BIGINT)"

  /** Deterministic 60-bit xor-key for hash family member i. */
  def mixKey(i: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"k:$i".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Rotation distance for family member i (coprime stride spreads the
    * members over the 60 bit positions). */
  def mixRot(i: Int): Int = (i * 7 + 5) % 60

  /** Hash family member i over a 60-bit base hash `h`: xor an md5-derived
    * key, then rotate within 60 bits. Rotation changes which bits dominate
    * the ordering, so the argmin element differs per member — the property
    * MinHash banding needs. (A linear `a*h+b mod p` family whose products
    * never exceed p stays order-correlated with `h`: every member picks
    * the same argmin and banding collapses — measured 45x candidate
    * blowup. A wrap-multiply mixer fixes that but ANSI mode rejects 64-bit
    * wrap.) All ops stay below 2^61 — overflow-free in both engines — and
    * the strong md5 hash runs once per element, not once per member. */
  def mixed(i: Int, h: Column): Column = {
    val r = mixRot(i)
    val x = h.bitwiseXOR(lit(mixKey(i)))
    if (r == 0) x
    else x.bitwiseAND(lit((1L << (60 - r)) - 1)) * lit(1L << r) + shiftright(x, 60 - r)
  }

  /** DuckDB fragment computing the same value as [[mixed]]. */
  def duckMixedSql(i: Int, hExpr: String): String = {
    val r = mixRot(i)
    val x = s"xor(($hExpr), ${mixKey(i)})"
    if (r == 0) x
    else s"(($x & ${(1L << (60 - r)) - 1}) * ${1L << r} + ($x >> ${60 - r}))"
  }
}
