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
    // Early exit once every rank is unique (the array is final and
    // further rounds are identity re-ranks): one small aggregation per
    // round over the just-checkpointed generation. English-like text
    // converges at ~log2(longest repeat), well before the length bound.
    var done = false
    (0 until rounds).foreach { r =>
      if (!done) {
        val k = 1L << r
        fr = fr
          .withColumn("__r2",
            coalesce(lead(col("rank"), k.toInt).over(byPos), lit(0L)))
          .withColumn("rank",
            dense_rank().over(W.partitionBy(col(idCol))
              .orderBy(col("rank"), col("__r2"))).cast("long"))
          .drop("__r2")
          .localCheckpoint()
        done = fr.groupBy(col(idCol), col("rank"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).isEmpty
      }
    }
    fr.select(col(idCol), col("pos"), col("rank").as("sa_rank"))
  }

  /** Longest repeated substring per document — the suffix array's
    * classic readout (the exact within-doc boilerplate/template
    * detector; [[Spans]] sees repeats only at w-gram granularity, this
    * sees EVERY repeat): the longest substring occurring ≥ 2 times in
    * a doc is always the longest common prefix of two suffixes ADJACENT
    * in suffix-array order, so one keyed lag over the ranks plus an LCP
    * per adjacent pair answers it exactly.
    *
    * The LCP is a 12-step binary search on prefix equality (prefix
    * equality is monotone in length, and 2^12 covers the
    * [[perDocRanks]] length cap) — O(log len) substring comparisons
    * per pair instead of the O(len) character walk, each a
    * codegen-friendly substr-equality. The oracle states the
    * definitional max-equal-prefix instead (result-equal, the house
    * oracle doctrine).
    *
    * @return (idCol, lrs_len, lrs_pos, lrs) — the longest repeat, a
    *         canonical occurrence position (the smaller position of the
    *         winning adjacent pair; ties break longest-first then
    *         smallest-position), and the substring itself. Docs with ≥ 2
    *         chars but no repeated substring read (0, 0, ""); docs with
    *         < 2 suffixes have no adjacent pair and are absent. */
  def longestRepeat(docs: DataFrame, idCol: String, textCol: String,
      maxLenLog2: Int = 12): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ranks = perDocRanks(docs, idCol, textCol, maxLenLog2)
    val byRank = W.partitionBy(col(idCol)).orderBy(col("sa_rank"))
    val t = col("__t")
    val pairs = ranks
      .withColumn("pos2", lag(col("pos"), 1).over(byRank))
      .filter(col("pos2").isNotNull)
      .join(docs.select(col(idCol), col(textCol).as("__t")), idCol)
      .withColumn("__max",
        least(length(t) - col("pos") + 1, length(t) - col("pos2") + 1))
    val lcp = aggregate(
      sequence(lit(1), lit(maxLenLog2)),
      struct(lit(0L).as("lo"), col("__max").cast("long").as("hi")),
      (acc, _) => {
        val (lo, hi) = (acc.getField("lo"), acc.getField("hi"))
        val mid = ((lo + hi + 1) / 2).cast("long")
        when(lo < hi,
          when(t.substr(col("pos"), mid.cast("int")) ===
            t.substr(col("pos2"), mid.cast("int")),
            struct(mid.as("lo"), hi.as("hi")))
            .otherwise(struct(lo.as("lo"), (mid - 1).as("hi"))))
          .otherwise(acc)
      }).getField("lo")
    pairs
      .withColumn("__lcp", lcp)
      .withColumn("__p", least(col("pos"), col("pos2")))
      .groupBy(col(idCol))
      .agg(max(struct(col("__lcp").as("l"), (-col("__p")).as("np"),
        col("__t").as("t"))).as("__b"))
      .select(col(idCol),
        col("__b.l").as("lrs_len"),
        when(col("__b.l") > 0, -col("__b.np")).otherwise(lit(0L))
          .as("lrs_pos"),
        when(col("__b.l") > 0,
          col("__b.t").substr((-col("__b.np")).cast("int"),
            col("__b.l").cast("int"))).otherwise(lit(""))
          .as("lrs"))
  }

  /** DuckDB oracle for [[longestRepeat]]: definitional — SA by suffix
    * sort, adjacent-pair LCP as the max equal-prefix length. */
  def longestRepeatOracleSql(innerSql: String, idName: String): String =
    s"""WITH d AS (
       |  SELECT $idName, text FROM ($innerSql) WHERE length(text) >= 1
       |), p AS (
       |  SELECT $idName, text,
       |         unnest(generate_series(1, length(text))) AS pos
       |  FROM d
       |), sa AS (
       |  SELECT $idName, text, pos,
       |         lag(pos) OVER (PARTITION BY $idName
       |           ORDER BY substr(text, CAST(pos AS INTEGER))) AS pos2
       |  FROM p
       |), pr AS (
       |  SELECT $idName, text, pos, pos2,
       |         coalesce(list_max(list_filter(
       |           generate_series(1, least(
       |             length(text) - pos + 1,
       |             length(text) - pos2 + 1)),
       |           l -> substr(text, CAST(pos AS INTEGER),
       |                  CAST(l AS INTEGER))
       |              = substr(text, CAST(pos2 AS INTEGER),
       |                  CAST(l AS INTEGER)))), 0) AS lcp,
       |         least(pos, pos2) AS pstart
       |  FROM sa WHERE pos2 IS NOT NULL
       |), best AS (
       |  SELECT *, row_number() OVER (PARTITION BY $idName
       |    ORDER BY lcp DESC, pstart) AS rn
       |  FROM pr
       |)
       |SELECT $idName, CAST(lcp AS BIGINT) AS lrs_len,
       |       CAST(CASE WHEN lcp > 0 THEN pstart ELSE 0 END
       |         AS BIGINT) AS lrs_pos,
       |       CASE WHEN lcp > 0
       |            THEN substr(text, CAST(pstart AS INTEGER),
       |                   CAST(lcp AS INTEGER))
       |            ELSE '' END AS lrs
       |FROM best WHERE rn = 1""".stripMargin

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
