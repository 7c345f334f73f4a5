package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextTiling-style topic segmentation (Hearst 1997) in exact integer
  * arithmetic: split each document into fixed token blocks, score every
  * block gap by the VOCABULARY OVERLAP of its adjacent blocks, convert
  * the valley structure to depth scores against the enclosing peaks,
  * and mark boundaries where the depth clears Hearst's μ − σ/2 cutoff
  * — the long-document structure signal (where does the topic shift)
  * that the whole-doc quality/coherence family can't see, and the
  * splitter long-context training pipelines chunk by.
  *
  * Exactness: gap score = Σ_t min(count_left(t), count_right(t)) — an
  * integer; depths are integer differences of per-doc running maxima;
  * the μ − σ/2 test is evaluated WITHOUT square roots: with
  * `L = 2Σd − 2n·d`, `d ≥ μ − σ/2 ⟺ L ≤ n·σ`, which is `L ≤ 0` or
  * (squaring, both sides exact longs) `L² ≤ n²σ² = n·Σd² − (Σd)²` —
  * so both engines decide identically with no float in sight.
  *
  * Scale shape: one token explode + one (doc, block, term) counting
  * aggregation (map-side combinable); gap scores are one self-join of
  * adjacent block vocabularies on (doc, gap, term); depths are two
  * doc-keyed running-max windows; the threshold is one doc-keyed stats
  * aggregation joined back. Everything is keyed by document — no
  * global anything.
  *
  * @param blockTokens block width in tokens (Hearst's w)
  * @return one row per interior gap: (idCol, gap, overlap, depth,
  *         boundary) — gap g sits before block g (tokens
  *         g·blockTokens …); docs with < 2 blocks emit nothing */
object Tiling {

  def textTiling(docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 16): DataFrame = {
    require(blockTokens >= 2)
    val W = org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("__p", "__t")))
      .select(col(idCol), expr(s"__p div $blockTokens").as("__b"),
        col("__t"))
      .groupBy(col(idCol), col("__b"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    // all interior gaps (1 .. maxBlock), so zero-overlap gaps exist
    val gaps = counts.groupBy(col(idCol))
      .agg(max(col("__b")).as("__mb"))
      .filter(col("__mb") >= 1)
      .select(col(idCol),
        explode(sequence(lit(1L), col("__mb"))).as("gap"))
    val leftC = counts.select(col(idCol), (col("__b") + 1).as("gap"),
      col("__t"), col("__c").as("__cl"))
    val rightC = counts.select(col(idCol), col("__b").as("gap"),
      col("__t"), col("__c").as("__cr"))
    val overlap = leftC.join(rightC, Seq(idCol, "gap", "__t"))
      .groupBy(col(idCol), col("gap"))
      .agg(sum(least(col("__cl"), col("__cr"))).as("overlap"))
    val g = gaps.join(overlap, Seq(idCol, "gap"), "left")
      .select(col(idCol), col("gap"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
    val byGap = W.partitionBy(col(idCol)).orderBy(col("gap"))
    val byGapD = W.partitionBy(col(idCol)).orderBy(col("gap").desc)
    val withDepth = g
      .withColumn("__hl", max(col("overlap")).over(
        byGap.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("__hr", max(col("overlap")).over(
        byGapD.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("depth",
        (col("__hl") - col("overlap")) + (col("__hr") - col("overlap")))
    val stats = withDepth.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"), sum(col("depth")).as("__s"),
        sum(col("depth") * col("depth")).as("__s2"))
    // depth ≥ μ − σ/2  ⟺  L = 2Σd − 2n·d ≤ n·σ: true when L ≤ 0,
    // else (squaring) L² ≤ n²σ² = n·Σd² − (Σd)²
    val L = lit(2L) * col("__s") - lit(2L) * col("__n") * col("depth")
    withDepth.join(stats, idCol)
      .select(col(idCol), col("gap"), col("overlap"), col("depth"),
        (L <= 0 || L * L <= col("__n") * col("__s2") -
          col("__s") * col("__s")).as("boundary"))
  }

  /** DuckDB oracle for [[textTiling]]: `innerSql` yields
    * (`idName`, toks). */
  def textTilingOracleSql(innerSql: String, idName: String,
      blockTokens: Int = 16): String =
    s"""WITH tk AS (
       |  SELECT $idName, CAST(pr[2] AS BIGINT) // $blockTokens AS b,
       |         pr[1] AS t
       |  FROM (SELECT $idName,
       |          unnest(list_zip(toks, range(0, len(toks)))) AS pr
       |        FROM ($innerSql))
       |), counts AS MATERIALIZED (
       |  SELECT $idName, b, t, CAST(count(*) AS BIGINT) AS c
       |  FROM tk GROUP BY 1, 2, 3
       |), gaps AS (
       |  SELECT $idName, unnest(generate_series(1, mb)) AS gap
       |  FROM (SELECT $idName, max(b) AS mb FROM counts GROUP BY 1)
       |  WHERE mb >= 1
       |), ov AS (
       |  SELECT l.$idName, l.gap,
       |         CAST(sum(least(l.cl, r.cr)) AS BIGINT) AS overlap
       |  FROM (SELECT $idName, b + 1 AS gap, t, c AS cl FROM counts) l
       |  JOIN (SELECT $idName, b AS gap, t, c AS cr FROM counts) r
       |    USING ($idName, gap, t)
       |  GROUP BY 1, 2
       |), g AS (
       |  SELECT gaps.$idName, gaps.gap,
       |         coalesce(ov.overlap, 0) AS overlap
       |  FROM gaps LEFT JOIN ov USING ($idName, gap)
       |), d AS (
       |  SELECT $idName, gap, overlap,
       |         (max(overlap) OVER (PARTITION BY $idName ORDER BY gap
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          - overlap)
       |         + (max(overlap) OVER (PARTITION BY $idName
       |            ORDER BY gap DESC
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          - overlap) AS depth
       |  FROM g
       |), st AS (
       |  SELECT $idName, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(depth) AS BIGINT) AS s,
       |         CAST(sum(depth * depth) AS BIGINT) AS s2
       |  FROM d GROUP BY 1
       |)
       |SELECT d.$idName, CAST(d.gap AS BIGINT) AS gap, d.overlap,
       |       CAST(d.depth AS BIGINT) AS depth,
       |       ((2 * st.s - 2 * st.n * d.depth) <= 0 OR
       |        (2 * st.s - 2 * st.n * d.depth)
       |          * (2 * st.s - 2 * st.n * d.depth)
       |          <= st.n * st.s2 - st.s * st.s) AS boundary
       |FROM d JOIN st USING ($idName)""".stripMargin
}
