package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank extractive salience (Mihalcea–Tarau 2004): rank a
  * document's segments by centrality in the segment-overlap graph and
  * keep the top k — the unsupervised "which part of this document
  * carries it" primitive (summary candidates, best-passage selection
  * for retrieval indexing, dedup-representative choice). Classic
  * TextRank splits on sentences; this corpus is unpunctuated prose, so
  * the unit is [[Segments.lineArrays]]' fixed `per`-token segment (the
  * q77/q80 sub-document contract) — swap the segmenter for a
  * punctuation split on corpora that have one.
  *
  * Graph: segments of the SAME document sharing ≥ `minOverlap`
  * distinct tokens, both directions; scores are the exact-integer
  * [[graft.ops.PageRank.pageRank]] recurrence over the union graph of
  * all documents at once (node = doc·10⁴ + sid, a disjoint union — one
  * PageRank job for the corpus, not one per document). Contract:
  * ≤ 10⁴ segments per document.
  *
  * Scale shape: segmentation is scan-side; the overlap join is keyed
  * by (doc, token) — fan-out bounded by segments-per-doc², never
  * corpus²; PageRank is the q63 machinery (keyed joins + counts per
  * iteration). The top-k window partitions by document (the W3
  * per-key class). Segments with no qualifying edge carry no rank and
  * are not emitted.
  */
object TextRank {

  /** @return (idCol, sid, segment, r, rn) — rn ≤ k by (r desc, sid) */
  def topSegments(docs: DataFrame, idCol: String, textCol: String,
      per: Int = 16, minOverlap: Long = 3L, k: Int = 2): DataFrame = {
    require(per >= 2 && minOverlap >= 1 && k >= 1)
    val seg = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(Segments.lineArrays(col("__toks"), per))
          .as(Seq("sid", "__seg")))
      .withColumn("sid", col("sid").cast("long"))
      .withColumn("toks", array_distinct(col("__seg")))
      .filter(size(col("toks")) >= 2)
      .withColumn("node", col(idCol) * 10000L + col("sid"))
      .withColumn("segment", array_join(col("__seg"), " "))
    val tok = seg.select(col(idCol).as("__d"), col("node"),
      explode(col("toks")).as("tok"))
    val ov = tok.as("a").join(tok.as("b"),
        col("a.__d") === col("b.__d") && col("a.tok") === col("b.tok") &&
          col("a.node") < col("b.node"))
      .groupBy(col("a.node").as("src"), col("b.node").as("dst"))
      .agg(count(lit(1)).as("__ov"))
      .filter(col("__ov") >= minOverlap)
      .select(col("src"), col("dst"))
    val edges = ov.unionAll(
      ov.select(col("dst").as("src"), col("src").as("dst")))
    val pr = graft.ops.PageRank.pageRank(edges, "src", "dst")
      .select(col("node"), col("r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("r").desc, col("sid"))
    seg.join(pr, "node")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col(idCol), col("sid"), col("segment"), col("r"), col("rn"))
  }

  /** DuckDB oracle for [[topSegments]]. `docsTokSql` yields
    * (idName, toks LIST(VARCHAR), where toks is the SAME tokenization
    * the Spark side used). */
  def topSegmentsOracleSql(docsTokSql: String, idName: String,
      per: Int = 16, minOverlap: Long = 3L, k: Int = 2): String = {
    val segSql =
      s"""SELECT $idName, st // $per AS sid,
         |       list_distinct(list_slice(toks, st + 1, st + $per))
         |         AS dtoks,
         |       array_to_string(list_slice(toks, st + 1, st + $per), ' ')
         |         AS segment
         |FROM (
         |  SELECT $idName,
         |         unnest(generate_series(0, len(toks) - 1, $per)) AS st,
         |         toks
         |  FROM t WHERE len(toks) > 0)""".stripMargin
    val edgeSql =
      s"""WITH t AS ($docsTokSql),
         |segs AS ($segSql),
         |nodes AS (
         |  SELECT $idName, $idName * 10000 + sid AS node, dtoks
         |  FROM segs WHERE len(dtoks) >= 2
         |), tk AS (
         |  SELECT $idName, node, unnest(dtoks) AS tok FROM nodes
         |), ov AS (
         |  SELECT a.node AS src, b.node AS dst
         |  FROM tk a JOIN tk b
         |    ON a.$idName = b.$idName AND a.tok = b.tok
         |   AND a.node < b.node
         |  GROUP BY 1, 2 HAVING count(*) >= $minOverlap
         |)
         |SELECT src, dst FROM ov
         |UNION ALL SELECT dst, src FROM ov""".stripMargin
    s"""WITH pr AS (
       |${graft.ops.PageRank.pageRankOracleSql(edgeSql)}
       |), t AS ($docsTokSql),
       |segs AS ($segSql),
       |j AS (
       |  SELECT $idName, sid, segment, r
       |  FROM segs JOIN pr ON $idName * 10000 + sid = pr.node
       |  WHERE len(dtoks) >= 2
       |)
       |SELECT $idName, sid, segment, r, rn FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY $idName
       |    ORDER BY r DESC, sid) AS BIGINT) AS rn
       |  FROM j
       |) WHERE rn <= $k""".stripMargin
  }
}
