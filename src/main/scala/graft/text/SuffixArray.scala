package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling (the
  * Manber–Myers recurrence in its data-parallel form, the algorithm
  * behind large-scale exact-substring dedup à la Lee et al. 2022 —
  * [[Spans]] approximates that pipeline with w-grams; the suffix array
  * is the exact structure): after round r, suffixes are ranked by their
  * first 2^r characters; each round re-ranks by the pair
  * (rank[i], rank[i + 2^r]) using ONE window lead and ONE dense_rank —
  * no string comparison ever exceeds the initial single-character
  * round, which is what makes the construction scale to texts far
  * longer than any comparison-sort-of-suffixes could.
  *
  * Per-document form: every window is keyed by the document, so
  * construction is embarrassingly parallel across docs and the round
  * count is ⌈log2(max doc length)⌉ — bounded by the length CAP, not
  * the corpus. The corpus-global array (one virtual text with document
  * sentinels — what cross-document substring dedup needs) is the same
  * recurrence with the per-doc windows replaced by the
  * [[graft.ops.Ranking]] globalOrdinals device (per-shard offsets, no
  * single-partition sort); per-doc is the committed oracle surface.
  *
  * `localCheckpoint` per round truncates the doubling lineage (the
  * CC/k-core discipline). Rank invariant: rank values are dense in
  * [1, len] per document; when every rank is unique the array is final
  * (rounds after convergence are identity re-ranks — a fixed round
  * count keeps the plan deterministic, matching the house oracle
  * doctrine).
  *
  * The committed readout orders by BINARY string comparison on both
  * engines (ASCII harness corpus; the [[Scrub]] normalization ops are
  * the upstream for anything else — documented seam shared with the
  * tokenizer family's ASCII contract).
  */
object SuffixArray {

  /** Suffix ranks per document: one row per suffix position.
    *
    * @param maxLenLog2 doubling rounds; correct for docs up to
    *                   2^maxLenLog2 chars (docs longer are truncated
    *                   to that prefix for ranking purposes — callers
    *                   pick the cap, the harness query uses 12/4096)
    * @return (idCol, pos, sa_rank) — sa_rank ∈ [1, len]: the position's
    *         suffix is the sa_rank-th smallest suffix of its document */
  def perDocRanks(docs: DataFrame, idCol: String, textCol: String,
      maxLenLog2: Int = 12): DataFrame = {
    require(maxLenLog2 >= 1 && maxLenLog2 <= 20)
    val W = org.apache.spark.sql.expressions.Window
    val byPos = W.partitionBy(col(idCol)).orderBy(col("pos"))
    // 1-row corpus statistic (the BPE argmax idiom: contract-bounded
    // driver round-trip) — rounds adapt to the actual longest document,
    // so a short-doc corpus never pays the cap's worth of windows.
    val maxLen = docs.agg(max(length(col(textCol)))).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.toString.toLong))
      .getOrElse(1L)
    val rounds = math.min(maxLenLog2,
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, maxLen - 1))))
    // Round 0: rank by first character (dense over the doc's chars).
    var fr = docs
      .select(col(idCol), col(textCol).as("__t"))
      .filter(length(col("__t")) >= 1)
      .select(col(idCol),
        posexplode(split(col("__t"), "")).as(Seq("__p0", "__c")))
      .filter(col("__c") =!= "")
      .select(col(idCol), (col("__p0") + 1).cast("long").as("pos"),
        col("__c"))
      .withColumn("rank",
        dense_rank().over(W.partitionBy(col(idCol)).orderBy(col("__c")))
          .cast("long"))
      .drop("__c")
      .localCheckpoint()
    (0 until rounds).foreach { r =>
      val k = 1L << r
      fr = fr
        .withColumn("__r2",
          coalesce(lead(col("rank"), k.toInt).over(byPos), lit(0L)))
        .withColumn("rank",
          dense_rank().over(W.partitionBy(col(idCol))
            .orderBy(col("rank"), col("__r2"))).cast("long"))
        .drop("__r2")
        .localCheckpoint()
    }
    fr.select(col(idCol), col("pos"), col("rank").as("sa_rank"))
  }

  /** DuckDB oracle for [[perDocRanks]]: the definitional form — rank
    * suffixes by direct binary comparison of the suffix strings
    * (exactly what prefix doubling converges to; document suffixes are
    * pairwise distinct, so the order is total and `row_number` = the
    * dense rank). `innerSql` yields (`idName`, text). */
  def perDocOracleSql(innerSql: String, idName: String): String =
    s"""WITH d AS (
       |  SELECT $idName, text FROM ($innerSql) WHERE length(text) >= 1
       |), p AS (
       |  SELECT $idName, text,
       |         unnest(generate_series(1, length(text))) AS pos
       |  FROM d
       |)
       |SELECT $idName, CAST(pos AS BIGINT) AS pos,
       |       CAST(row_number() OVER (PARTITION BY $idName
       |         ORDER BY substr(text, CAST(pos AS INTEGER))) AS BIGINT)
       |         AS sa_rank
       |FROM p""".stripMargin
}
