package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Bloom-filter semi-join reduction — the shuffle shrinker for
  * "big fact ⋉ selective key set" joins.
  *
  * A plain `left_semi` shuffles the ENTIRE fact side to the join key;
  * at 100 TB that shuffle dominates the job even when 99% of rows will
  * be dropped. The bloom pattern moves the drop to the SCAN side: build
  * a bitset from the key set (aggregate-sized), embed it in the plan as
  * a literal, pre-filter fact rows with codegen'd bit probes, and let
  * the exact semi join confirm survivors — false positives (bounded by
  * the classic (1−e^{−kn/m})^k rate) are eliminated there, so the
  * RESULT is exactly the semi join while the shuffle carries only
  * candidates. This is the same trick AQE's runtime row-level filtering
  * plays, exposed as a composable operator with a deterministic,
  * engine-portable hash family ([[Hash64.mixed]] over the 60-bit md5
  * base) instead of an opaque internal one.
  *
  * Contract: the bitset is DIMENSION-sized — `mBits` is driver/plan
  * memory (default 2¹⁷ bits = 16 KB; 10⁶ keys at 1% FP want ~10⁷ bits
  * ≈ 1.2 MB, still fine). Beyond that, don't inflate `mBits`: fall back
  * to the plain semi join or AQE's broadcast runtime filter. The build
  * collect is the bounded stat-broadcast round-trip (exactly the IVF
  * centroid contract), never corpus-sized.
  */
object Bloom {

  /** Portable 60-bit base hash of any key column (stringified — engine
    * formatting of integers is identical). */
  def keyHash(key: Column): Column = Hash64.hash60(key.cast("string"))

  /** Build the bitset: k probe positions per key, one bit_or aggregation
    * into `mBits / 64` words. Distributed until the word-count-sized
    * collect. */
  def build(keys: DataFrame, keyCol: String, mBits: Int = 1 << 17,
      k: Int = 5): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0 && k >= 1)
    val h = keyHash(col(keyCol))
    val words = keys
      .select(explode(array((0 until k).map(i =>
        pmod(Hash64.mixed(i, h), lit(mBits.toLong))): _*)).as("pos"))
      .select(shiftright(col("pos"), 6).as("w"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(63L)).cast("int")).as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Array.tabulate(mBits / 64)(i => words.getOrElse(i, 0L))
  }

  /** Probe predicate: true iff every one of the k probe bits is set.
    * Pure codegen'd builtins over a literal array — stays inside
    * whole-stage codegen at the scan. */
  def mightContain(key: Column, words: Array[Long], k: Int = 5): Column = {
    require(words.nonEmpty, "words must be non-empty")
    val mBits = words.length * 64
    val arr = typedlit(words.toSeq)
    val h = keyHash(key)
    (0 until k).map { i =>
      val pos = pmod(Hash64.mixed(i, h), lit(mBits.toLong))
      val word = element_at(arr, (shiftright(pos, 6) + lit(1L)).cast("int"))
      call_function("shiftright", word,
        pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** The composed reduction: exact `big ⋉ small` with the big-side scan
    * pre-filtered by the bloom probe. Result is EXACTLY the semi join
    * (the confirm join removes false positives); the filter only shrinks
    * what the shuffle carries. */
  def semiJoinReduce(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, mBits: Int = 1 << 17, k: Int = 5): DataFrame = {
    val words = build(small.select(col(smallKey)).distinct(), smallKey,
      mBits, k)
    big.filter(mightContain(col(bigKey), words, k))
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }
}
