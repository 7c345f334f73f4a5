package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.functions.Hash64

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * local-fingerprinting scheme): hash every k-token gram, slide a window
  * of `w` consecutive gram hashes, and keep each window's minimum hash
  * (rightmost position on ties). The selection is LOCAL — whether a gram
  * is kept depends only on the w hashes around it — which gives the
  * guarantee full-content hashing lacks and random sampling breaks:
  * any shared run of ≥ w+k−1 tokens between two documents produces at
  * least one IDENTICAL selected fingerprint in both, regardless of where
  * the run sits in either document. Expected density is 2/(w+1) of gram
  * positions, so the fingerprint set is a ~2/(w+1) sample with a
  * worst-case match guarantee — the right primitive for partial-overlap
  * detection (MOSS-style plagiarism, template reuse) where whole-doc
  * MinHash (resemblance-blind to small shared spans) and the q73 span
  * profile (per-doc fractions, no pair localization) stop short.
  *
  * Plan shape: fingerprint selection is entirely per-document array
  * work — tokenize → shingle → hash → window-argmin, all inside one
  * projection chain with each HOF lambda touching only materialized
  * attribute arrays (the [[NearDup.shingles]] re-evaluation contract) —
  * so NOTHING shuffles until the selected fingerprints (a 2/(w+1)
  * sample of grams, 8-byte keys) reach the cross-doc join. At 100 TB the
  * selection stage is embarrassingly parallel map work; only the
  * winnowed sample pays shuffle.
  */
object Winnow {

  /** Selected fingerprints per document: (idCol, pos, h) where `pos` is
    * the gram's 0-based token position and `h` its [[Hash64.hash60]]
    * value. A document always yields ≥ 1 fingerprint (short docs — fewer
    * than `w` grams — winnow their single whole-span window; empty docs
    * collapse to the empty shingle, [[NearDup.shingles]] semantics).
    *
    * The per-window argmin folds left-to-right replacing on `h ≤ acc.h`,
    * so equal hashes keep the LATER position — the rightmost tie-break
    * that makes adjacent overlapping windows reuse one selection instead
    * of emitting w copies of it. Selections are deduped per document
    * before returning.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    require(k >= 1 && w >= 1, "gram size and window must be >= 1")
    // gram hashing + window argmin fuse into the input's scan stage —
    // lift a single-row-group corpus to the core floor (identity at
    // scale — Tables.scanFloor)
    val withHs = graft.Tables.scanFloor(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), NearDup.shingles(col("__toks"), k).as("__grams"))
      .select(col(idCol),
        transform(col("__grams"), g => hash(g)).as("__hs"))
      // (h, pos) pairs as one attribute so every window lambda reads a
      // materialized array, never re-evaluating the hash subtree.
      .select(col(idCol),
        zip_with(col("__hs"),
          sequence(lit(0L), size(col("__hs")).cast("long") - 1L),
          (h, p) => struct(h.as("h"), p.as("pos"))).as("__phs"))
    val n = size(col("__phs"))
    // Window starts 0 .. max(n-w, 0); slice is 1-based and clamps at the
    // array end, which is exactly the short-doc single-window case.
    val sel = transform(
      sequence(lit(0), greatest(n - w, lit(0))),
      i => aggregate(
        slice(col("__phs"), i + 1, lit(w)),
        lit(null).cast("struct<h:bigint,pos:bigint>"),
        (acc, x) => when(acc.isNull || x.getField("h") <= acc.getField("h"),
          x).otherwise(acc)))
    withHs
      .select(col(idCol), explode(array_distinct(sel)).as("__fp"))
      .select(col(idCol), col("__fp.pos").as("pos"), col("__fp.h").as("h"))
  }

  /** Cross-document match scoring over winnowed fingerprints: pairs of
    * documents sharing ≥ `minShared` distinct selected hashes, scored by
    * fingerprint-set resemblance (|∩| / |∪| of the per-doc distinct
    * selected-hash sets). Positions are dropped for scoring — the
    * winnowing guarantee is about hash identity; localization stays
    * available from [[fingerprints]].
    *
    * Fingerprint hashes selected in more than `dfCap` documents are
    * excluded from pair generation (template/boilerplate grams — the
    * same document-frequency cut every blocked-join dedup op here
    * applies), which is what bounds the join fan-out: a hash key
    * contributes ≤ C(dfCap, 2) pairs, so the candidate volume is
    * Σ_h C(df_h, 2) with df_h ≤ dfCap — linear in corpus size at fixed
    * cap, never quadratic.
    *
    * @return (d1, d2, n_shared, sim) with d1 < d2 */
  def matchPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, dfCap: Long = 50L,
      minShared: Long = 2L,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w, hash)
      .select(col(idCol), col("h")).distinct()
      .persist()
    val sizes = fp.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val kept = fp.withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("h"))))
      .filter(col("__df") <= dfCap)
    val pairs = kept.select(col(idCol).as("d1"), col("h"))
      .join(kept.select(col(idCol).as("d2"), col("h")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col(idCol).as("d1"), col("__n").as("__n1")), Seq("d1"))
      .join(sizes.select(col(idCol).as("d2"), col("__n").as("__n2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("__n1") + col("__n2") - col("n_shared")).cast("double"))
          .as("sim"))
  }

  /** Match LOCALIZATION — the extents that make [[matchPairs]]
    * actionable (MOSS's matched-region readout, the input to span-level
    * removal): for each qualifying pair, the token extent of the shared
    * fingerprints in EACH document. `*_from` is the first matched gram's
    * token position, `*_to` the exclusive token end (last matched gram
    * position + k). Same df-capped join as [[matchPairs]]; extents are
    * per-pair min/max aggregates, so the plan shape is identical.
    *
    * @return (d1, d2, n_shared, d1_from, d1_to, d2_from, d2_to) */
  def matchSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, dfCap: Long = 50L,
      minShared: Long = 2L,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w, hash).persist()
    val dfh = fp.select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap)
    val kept = fp.join(dfh.select(col("h")), Seq("h"))
    kept.select(col("h"), col(idCol).as("d1"), col("pos").as("__p1"))
      .join(kept.select(col("h"), col(idCol).as("d2"),
        col("pos").as("__p2")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(countDistinct(col("h")).as("n_shared"),
        min(col("__p1")).as("d1_from"),
        (max(col("__p1")) + k).as("d1_to"),
        min(col("__p2")).as("d2_from"),
        (max(col("__p2")) + k).as("d2_to"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB oracle for [[fingerprints]] as a CTE chain ending in a
    * relation `fp(doc_id, pos, h)` — the self-join O(n·w) replay of the
    * per-window rightmost argmin (fine at oracle scale). `table` must
    * expose (idCol, textCol); `toksSql` is the shared tokenizer
    * fragment. */
  def fingerprintsOracleCtes(table: String, idCol: String,
      toksSql: String, k: Int, w: Int): String =
    s"""t AS (SELECT $idCol, $toksSql AS toks FROM $table),
       |gr AS (
       |  SELECT $idCol, ${NearDup.duckShinglesSql(k)} AS grams FROM t),
       |hs AS (
       |  SELECT $idCol,
       |         list_transform(grams, g -> ${Hash64.duckSql("g")}) AS hl
       |  FROM gr),
       |p AS (
       |  SELECT $idCol, len(hl) AS n, unnest(hl) AS h,
       |         unnest(range(0, len(hl))) AS pos
       |  FROM hs),
       |wmin AS (
       |  SELECT a.$idCol, a.pos AS i, min(b.h) AS mh
       |  FROM p a JOIN p b
       |    ON a.$idCol = b.$idCol AND b.pos BETWEEN a.pos AND a.pos + ${w - 1}
       |  WHERE a.pos <= greatest(a.n - $w, 0)
       |  GROUP BY 1, 2),
       |fp AS (
       |  SELECT DISTINCT wmin.$idCol, max(b.pos) AS pos, wmin.mh AS h
       |  FROM wmin JOIN p b
       |    ON b.$idCol = wmin.$idCol AND b.h = wmin.mh
       |   AND b.pos BETWEEN wmin.i AND wmin.i + ${w - 1}
       |  GROUP BY wmin.$idCol, wmin.i, wmin.mh)""".stripMargin

  /** DuckDB oracle for [[matchSpans]] (embeds
    * [[fingerprintsOracleCtes]]). */
  def matchSpansOracleSql(table: String, idCol: String, toksSql: String,
      k: Int, w: Int, dfCap: Long, minShared: Long): String =
    s"""WITH ${fingerprintsOracleCtes(table, idCol, toksSql, k, w)},
       |fpd AS (SELECT DISTINCT $idCol, h FROM fp),
       |dfh AS (
       |  SELECT h FROM (SELECT h, count(*) AS df FROM fpd GROUP BY 1)
       |  WHERE df <= $dfCap),
       |keep AS (SELECT f.$idCol, f.pos, f.h FROM fp f JOIN dfh USING (h))
       |SELECT a.$idCol AS d1, b.$idCol AS d2,
       |       CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared,
       |       CAST(min(a.pos) AS BIGINT) AS d1_from,
       |       CAST(max(a.pos) + $k AS BIGINT) AS d1_to,
       |       CAST(min(b.pos) AS BIGINT) AS d2_from,
       |       CAST(max(b.pos) + $k AS BIGINT) AS d2_to
       |FROM keep a JOIN keep b ON a.h = b.h AND a.$idCol < b.$idCol
       |GROUP BY 1, 2
       |HAVING count(DISTINCT a.h) >= $minShared""".stripMargin

  /** DuckDB oracle for [[matchPairs]] (embeds
    * [[fingerprintsOracleCtes]]). */
  def matchPairsOracleSql(table: String, idCol: String, toksSql: String,
      k: Int, w: Int, dfCap: Long, minShared: Long): String =
    s"""WITH ${fingerprintsOracleCtes(table, idCol, toksSql, k, w)},
       |fpd AS (SELECT DISTINCT $idCol, h FROM fp),
       |sz AS (SELECT $idCol, count(*) AS n FROM fpd GROUP BY 1),
       |keep AS (
       |  SELECT $idCol, h FROM (
       |    SELECT $idCol, h, count(*) OVER (PARTITION BY h) AS df FROM fpd)
       |  WHERE df <= $dfCap),
       |pr AS (
       |  SELECT a.$idCol AS d1, b.$idCol AS d2, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM keep a JOIN keep b ON a.h = b.h AND a.$idCol < b.$idCol
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $minShared)
       |SELECT d1, d2, n_shared,
       |       CAST(n_shared AS DOUBLE) / CAST(s1.n + s2.n - n_shared AS DOUBLE) AS sim
       |FROM pr JOIN sz s1 ON d1 = s1.$idCol JOIN sz s2 ON d2 = s2.$idCol""".stripMargin
}
