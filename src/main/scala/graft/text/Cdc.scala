package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Content-defined chunking (the rolling-hash splitter of
  * rsync/LBFS/FastCDC, at character granularity): a chunk boundary
  * falls after position `i` exactly when the hash of the trailing
  * `w`-char window ends a content pattern — `hash(text[i−w+1..i]) ≡ 0
  * (mod p)` — so boundaries are a pure function of LOCAL content, not
  * of position. That buys the property fixed-size chunking can never
  * have: inserting or deleting a prefix only perturbs chunks up to the
  * first boundary after the edit; everything downstream re-aligns and
  * dedups against the unedited copy. This is how storage dedup survives
  * shifted content, and for corpora it catches "same article, new
  * header" mass that whole-doc fingerprints (q23) miss and w-gram
  * profiles (q73) can only report fractionally.
  *
  * Expected chunk length is `p` chars (geometric); [[Segments.chunk]]
  * is the token-budget fixed splitter for model windows — different
  * contract (deterministic sizes, no shift resilience).
  *
  * Portability: the window hash and the chunk fingerprint both use
  * [[Hash64.hash60]], so the DuckDB oracle derives identical boundaries
  * and verdicts. Grams come from a codegen'd `substring` over an
  * exploded POSITION sequence (the q134 lesson — no per-doc array of
  * |text| strings), and per-doc boundary lists are len/p-bounded.
  *
  * Reference analogue: none — LLM-pipeline / storage surface.
  */
object Cdc {

  /** Split every document into content-defined chunks.
    *
    * @return (idCol, start, chunk_len, chunk) — `start` is the 0-based
    *         char offset; chunks concatenate back to the exact text.
    *         Empty-text docs drop (they have no content to chunk). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, p: Int = 64,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    require(w >= 1 && p >= 1)
    val len = length(col(textCol))
    val base = docs.select(col(idCol), col(textCol)).filter(len >= 1)
    // interior boundary candidates: the w-gram ENDING at pos, pos ≤ len−1
    // (a boundary at the very end would only mint an empty chunk)
    val bounds = base
      .select(col(idCol), col(textCol),
        explode(when(len - 1 >= w,
            sequence(lit(w.toLong), (len - 1).cast("long")))
          .otherwise(array().cast("array<bigint>"))).as("__pos"))
      .filter(pmod(hash(col(textCol).substr(
        (col("__pos") - lit(w - 1)).cast("int"), lit(w))), lit(p.toLong)) === 0L)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos"))).as("__bs"))
    base.join(bounds, Seq(idCol), "left")
      .withColumn("__bs2", concat(array(lit(0L)),
        coalesce(col("__bs"), array().cast("array<bigint>")),
        array(len.cast("long"))))
      .select(col(idCol), col(textCol), explode(filter(
        zip_with(col("__bs2"),
          slice(col("__bs2"), lit(2), size(col("__bs2")) - 1),
          (a, b) => struct(a.as("s"), b.as("e"))),
        x => x.getField("e").isNotNull)).as("__pr"))
      .select(col(idCol), col("__pr.s").as("start"),
        (col("__pr.e") - col("__pr.s")).as("chunk_len"),
        col(textCol).substr((col("__pr.s") + 1L).cast("int"),
          (col("__pr.e") - col("__pr.s")).cast("int")).as("chunk"))
  }

  /** Per-document chunk-level dedup profile: how much of each doc's
    * character mass lives in chunks that occur ≥2 times corpus-wide
    * (within- or cross-document). The content-shift-resilient sibling
    * of q73's w-gram dup profile.
    *
    * @return (idCol, n_chunks, n_dup_chunks, dup_chars, total_chars,
    *         dup_frac) */
  def chunkDedupProfile(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 8, p: Int = 64,
      hash: Column => Column = Hash64.hash60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    chunks(docs, idCol, textCol, w, p, hash)
      .select(col(idCol), col("chunk_len"), hash(col("chunk")).as("__h"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__df") >= 2, col("chunk_len")).otherwise(0L))
          .as("dup_chars"),
        sum(col("chunk_len")).as("total_chars"))
      .withColumn("dup_frac",
        col("dup_chars").cast("double") / col("total_chars").cast("double"))
  }

  /** DuckDB oracle for [[chunkDedupProfile]]; `docsSql` must yield
    * (doc_id, text). */
  def profileOracleSql(docsSql: String, w: Int = 8, p: Int = 64): String =
    s"""WITH d AS (
      |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      |  FROM ($docsSql) WHERE length(text) >= 1
      |), pos AS (
      |  SELECT doc_id, text,
      |         unnest(generate_series($w, n - 1)) AS pos
      |  FROM d WHERE n - 1 >= $w
      |), b AS (
      |  SELECT doc_id, pos FROM pos
      |  WHERE ${Hash64.duckSql(s"substr(text, CAST(pos AS BIGINT) - ${w - 1}, $w)")} % $p = 0
      |), bs AS (
      |  SELECT doc_id, list_sort(list(pos)) AS bs FROM b GROUP BY 1
      |), z AS (
      |  SELECT d.doc_id, d.text,
      |         [CAST(0 AS BIGINT)] || coalesce(bs.bs, CAST([] AS BIGINT[])) || [d.n] AS bs2
      |  FROM d LEFT JOIN bs USING (doc_id)
      |), ch AS (
      |  SELECT doc_id, bs2[i + 1] - bs2[i] AS clen,
      |         substr(text, bs2[i] + 1, bs2[i + 1] - bs2[i]) AS chunk
      |  FROM (SELECT *, unnest(generate_series(1, len(bs2) - 1)) AS i FROM z)
      |), wd AS (
      |  SELECT doc_id, clen,
      |         count(*) OVER (PARTITION BY ${Hash64.duckSql("chunk")}) AS df
      |  FROM ch
      |)
      |SELECT doc_id,
      |       CAST(count(*) AS BIGINT) AS n_chunks,
      |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      |       CAST(sum(CASE WHEN df >= 2 THEN clen ELSE 0 END) AS BIGINT) AS dup_chars,
      |       CAST(sum(clen) AS BIGINT) AS total_chars,
      |       CAST(sum(CASE WHEN df >= 2 THEN clen ELSE 0 END) AS DOUBLE)
      |         / CAST(sum(clen) AS DOUBLE) AS dup_frac
      |FROM wd GROUP BY 1""".stripMargin
}
