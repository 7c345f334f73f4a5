package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Near-duplicate detection: MinHash+LSH, SimHash, token-set Jaccard.
  *
  * Scale design (the whole point at 100 TB):
  *  - Candidate generation is always a KEYED SHUFFLE (band bucket / simhash
  *    band / blocking key), never an O(n²) cross join.
  *  - Verification (exact Jaccard / hamming) runs only on bucket-cograms,
  *    whose cardinality is controlled by band width.
  *  - Hashing uses `xxhash64` — a codegen'd Catalyst expression, no UDF.
  *  - Ultra-common tokens (document frequency ≈ corpus size) should be
  *    df-cut before the token join in [[tokenJaccardPairs]]; the testdata
  *    vocabulary is tiny so the cut is left to the caller's `maxDf`.
  */
object NearDup {

  /** w-word shingles of the token array, as space-joined strings. */
  def shingles(toks: Column, w: Int = 3): Column =
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))

  /** MinHash signature: for each of `k` seeded hash functions, the min
    * xxhash64 over the distinct shingles. Returns array<long> of length k. */
  def minhashSignature(shings: Column, k: Int = 16): Column = {
    val distinctSh = array_distinct(shings)
    array((0 until k).map { seed =>
      array_min(transform(distinctSh, sh => xxhash64(sh, lit(seed))))
    }: _*)
  }

  /** LSH banding: docs sharing any (band, bandHash) bucket become candidate
    * pairs; exact Jaccard is then verified on the candidates only.
    *
    * @param df        (idCol, sigCol: array<long>) frame
    * @param bands     number of bands (rows per band = k / bands)
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, sigCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val banded = df.select(
      col(idCol),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand))): _*)))
      .toDF(idCol, "band", "band_hash")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .distinct()
  }

  /** Exact token-set Jaccard for all pairs sharing a blocking key — the
    * verify stage of LSH, or standalone blocked near-dup. One shuffle keyed
    * by token (+block); no cross join. */
  def tokenJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, minJaccard: Double): DataFrame = {
    val tok = docs.select(
      col(idCol), col(blockCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("token"))
    val sizes = tok.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val pairs = tok.as("a").join(tok.as("b"),
        col("a.token") === col("b.token") &&
          col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes).as("s1"), col("d1") === col(s"s1.$idCol"))
      .join(broadcast(sizes).as("s2"), col("d2") === col(s"s2.$idCol"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("s1.n") + col("s2.n") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("d1"), col("d2"), col("inter"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens: per bit, the sign of Σ(±1) across token
    * hashes. Computed as 64 codegen'd conditional sums after an explode —
    * one shuffle keyed by doc id. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(lit(1L << i)) =!= 0, 1).otherwise(-1)).as(s"b$i")
    }
    tok.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup candidates: block on 4×16-bit bands (a pair within
    * hamming ≤ 3 of band count shares at least one exact band), verify with
    * `bit_count(xor)`. */
  def simhashPairs(sigs: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val banded = sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF(idCol, "simhash", "band", "band_bits")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_bits") === col("b.band_bits") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
