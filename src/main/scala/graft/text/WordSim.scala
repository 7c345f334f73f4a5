package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributional word similarity from PPMI context vectors (Church &
  * Hanks 1990; Levy & Goldberg 2014 showed skip-gram factorizes
  * exactly this matrix) — "words are known by the company they keep",
  * computed entirely from corpus counts: the counts-based face of word
  * embeddings, next to the graph-embedding walks (q330) and the dense
  * ANN family. Nearest neighbors under this score surface synonyms /
  * same-slot words with zero training.
  *
  * PPMI is quantized by the bit-length log (the q130 Adamic–Adar /
  * [[LangModel]] device): `ppmi_q = max(blog(N·n_wc) − blog(n_w·n_c),
  * 0)` with `blog(x) = ⌊log2 x⌋ + 1` — integer-exact on both engines,
  * order-preserving within its ±1 staircase. Similarity is the exact
  * integer DOT PRODUCT of two words' ppmi_q context vectors; top-k
  * neighbors break ties by ascending neighbor id (a total order).
  *
  * Scale shape: context pairs come from 2·`window` position-shifted
  * keyed equi-joins (never an inequality join); the similarity
  * self-join is keyed by context and DF-CAPPED — contexts occurring
  * with more than `dfCap` distinct words are dropped before the join
  * (the house df-cap doctrine: stop-word contexts carry no signal and
  * quadratic fan-out), so the join is Σ_c min(df_c, dfCap)² bounded.
  *
  * @return top `k` neighbors per word: (w1, w2, sim, rank) —
  *         sim = Σ_c ppmi_q(w1,c)·ppmi_q(w2,c) > 0 */
object WordSim {

  def ppmiNeighbors(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 2, k: Int = 5, dfCap: Long = 1000L): DataFrame = {
    require(window >= 1 && window <= 4 && k >= 1 && dfCap >= 2)
    val W = org.apache.spark.sql.expressions.Window
    val occ = docs
      .select(col(idCol).as("__d"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("__p", "__w")))
      .localCheckpoint()
    val shifted = (1 to window).map { d =>
      val right = occ.select(col("__d"), (col("__p") - d).as("__p"),
        col("__w").as("__c"))
      occ.join(right, Seq("__d", "__p"))
        .select(col("__w"), col("__c"))
    }.reduce(_ unionAll _)
    val pairs = shifted
      .unionAll(shifted.select(col("__c").as("__w"), col("__w").as("__c")))
      .groupBy(col("__w"), col("__c")).agg(count(lit(1)).as("__nwc"))
      .persist()
    val wTot = pairs.groupBy(col("__w")).agg(sum(col("__nwc")).as("__nw"))
    val cTot = pairs.groupBy(col("__c")).agg(sum(col("__nwc")).as("__nc"),
      count(lit(1)).as("__cdf"))
    val tot = pairs.agg(sum(col("__nwc")).as("__N"))
    val blog = (x: org.apache.spark.sql.Column) =>
      length(bin(x)).cast("long")
    val ppmi = pairs
      .join(wTot, "__w").join(cTot, "__c")
      .join(broadcast(tot)) // one-row mass: the stat-broadcast idiom
      .filter(col("__cdf") <= dfCap)
      .select(col("__w"), col("__c"),
        greatest(blog(col("__N") * col("__nwc")) -
          blog(col("__nw") * col("__nc")), lit(0L)).as("__q"))
      .filter(col("__q") > 0)
    val sims = ppmi.select(col("__c"), col("__w").as("w1"),
        col("__q").as("__q1"))
      .join(ppmi.select(col("__c"), col("__w").as("w2"),
        col("__q").as("__q2")), Seq("__c"))
      .filter(col("w1") =!= col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("__q1") * col("__q2")).as("sim"))
    val byW = W.partitionBy(col("w1"))
      .orderBy(col("sim").desc, col("w2"))
    sims
      .withColumn("rank", row_number().over(byW).cast("long"))
      .filter(col("rank") <= k)
  }

  /** DuckDB oracle for [[ppmiNeighbors]]: `innerSql` yields
    * (`idName`, toks). */
  def ppmiNeighborsOracleSql(innerSql: String, idName: String,
      window: Int = 2, k: Int = 5, dfCap: Long = 1000L): String = {
    val shifts = (1 to window).map { d =>
      s"""SELECT a.w, b.w AS c
         |FROM occ a JOIN occ b ON a.d = b.d AND b.p = a.p + $d"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH occ AS MATERIALIZED (
       |  SELECT $idName AS d, CAST(pr[2] AS BIGINT) AS p, pr[1] AS w
       |  FROM (SELECT $idName,
       |          unnest(list_zip(toks, range(0, len(toks)))) AS pr
       |        FROM ($innerSql))
       |), sh AS (
       |$shifts
       |), pairs AS MATERIALIZED (
       |  SELECT w, c, CAST(count(*) AS BIGINT) AS nwc FROM (
       |    SELECT w, c FROM sh UNION ALL SELECT c, w FROM sh)
       |  GROUP BY 1, 2
       |), wt AS (SELECT w, CAST(sum(nwc) AS BIGINT) AS nw
       |          FROM pairs GROUP BY 1),
       |ct AS (SELECT c, CAST(sum(nwc) AS BIGINT) AS nc,
       |              CAST(count(*) AS BIGINT) AS cdf
       |       FROM pairs GROUP BY 1),
       |tt AS (SELECT CAST(sum(nwc) AS BIGINT) AS n FROM pairs),
       |ppmi AS MATERIALIZED (
       |  SELECT w, c,
       |         greatest(length(bin(tt.n * nwc))
       |           - length(bin(wt.nw * ct.nc)), 0) AS q
       |  FROM pairs JOIN wt USING (w) JOIN ct USING (c) CROSS JOIN tt
       |  WHERE ct.cdf <= $dfCap
       |    AND greatest(length(bin(tt.n * nwc))
       |          - length(bin(wt.nw * ct.nc)), 0) > 0
       |), sims AS (
       |  SELECT a.w AS w1, b.w AS w2,
       |         CAST(sum(a.q * b.q) AS BIGINT) AS sim
       |  FROM ppmi a JOIN ppmi b ON a.c = b.c AND a.w <> b.w
       |  GROUP BY 1, 2
       |)
       |SELECT w1, w2, sim, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT w1, w2, sim,
       |         row_number() OVER (PARTITION BY w1
       |           ORDER BY sim DESC, w2) AS rank
       |  FROM sims)
       |WHERE rank <= $k""".stripMargin
  }
}
