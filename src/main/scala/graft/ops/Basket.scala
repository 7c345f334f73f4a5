package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules: for item pairs co-occurring in
  * enough baskets, support / confidence / lift — the co-purchase
  * recommendation primitive ("users who bought A also bought B") and,
  * on a corpus, the co-occurrence signal behind related-document
  * suggestions.
  *
  * Scale shape: the pair generator is a within-basket self-join, so its
  * fan-out is Σ|basket|² — bounded by BASKET size (an order has a
  * handful of lines however big the corpus), never corpus². Item
  * supports join back onto the min-support-surviving pairs (the prune
  * happens BEFORE the stats join). One basket-keyed join + three hash
  * aggregations.
  *
  * Exactness: supports and pair counts are integers; confidence
  * (`pair/n_a`) and lift (`pair·N / n_a / n_b`) derive in one fixed
  * IEEE sequence each. Lift > 1 means genuinely associated, < 1
  * substitutes; both directions' confidences are emitted on the one
  * canonical (a < b) row.
  */
object Basket {

  /** @param baskets   (basketCol, itemCol) rows — duplicates within a
    *                  basket are collapsed (presence, not quantity)
    * @param minSupport minimum number of baskets a PAIR must appear in
    * @return (item_a, item_b, n_pair, n_a, n_b, n_baskets, conf_a_b,
    *         conf_b_a, lift), item_a < item_b
    */
  def associationRules(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    val items = baskets
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = items.select(col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemSupport = items.groupBy(col("__i"))
      .agg(count(lit(1)).as("n"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    pairs
      .join(broadcast(itemSupport.select(col("__i").as("item_a"),
        col("n").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemSupport.select(col("__i").as("item_b"),
        col("n").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
        col("n_b"), col("n_baskets"),
        (col("n_pair").cast("double") / col("n_a")).as("conf_a_b"),
        (col("n_pair").cast("double") / col("n_b")).as("conf_b_a"),
        (col("n_pair").cast("double") * col("n_baskets")
          / col("n_a") / col("n_b")).as("lift"))
  }

  /** DuckDB oracle for [[associationRules]] over
    * `table(basketCol, itemCol)`. */
  def associationRulesOracleSql(table: String, basketCol: String,
      itemCol: String, minSupport: Long): String =
    s"""WITH it AS (
       |  SELECT DISTINCT $basketCol AS b, $itemCol AS i FROM $table
       |), nb AS (
       |  SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM it
       |), sup AS (
       |  SELECT i, CAST(count(*) AS BIGINT) AS n FROM it GROUP BY 1
       |), pr AS (
       |  SELECT a.i AS item_a, b.i AS item_b,
       |         CAST(count(*) AS BIGINT) AS n_pair
       |  FROM it a JOIN it b ON a.b = b.b AND a.i < b.i
       |  GROUP BY 1, 2 HAVING count(*) >= $minSupport
       |)
       |SELECT item_a, item_b, n_pair, sa.n AS n_a, sb.n AS n_b,
       |       nb.n_baskets,
       |       CAST(n_pair AS DOUBLE) / sa.n AS conf_a_b,
       |       CAST(n_pair AS DOUBLE) / sb.n AS conf_b_a,
       |       CAST(n_pair AS DOUBLE) * nb.n_baskets / sa.n / sb.n AS lift
       |FROM pr
       |JOIN sup sa ON sa.i = item_a
       |JOIN sup sb ON sb.i = item_b
       |CROSS JOIN nb""".stripMargin

  /** Item-item cosine neighborhoods ("people who bought X also
    * bought"): over binary basket-membership vectors,
    * `cos(i,j) = co(i,j) / √(n_i·n_j)` — the normalized sibling of
    * [[associationRules]]' lift (lift rewards rare coincidences;
    * cosine is symmetric and bounded, the standard item-CF
    * neighborhood weight). Top-k neighbors per item, BOTH directions
    * (the pair is materialized once, emitted twice).
    *
    * Scale shape: co-occurrence only through shared baskets (the q119
    * orientation argument: fan-out is basket-size-bounded, never
    * item-pair-quadratic), two aggregate-sized support joins, one
    * per-item window over each item's neighbor list.
    *
    * @return (item, neighbor, co, n_item, n_neighbor, cosine, rn) —
    *         rn ≤ k ordered by (cosine desc, neighbor)
    */
  /** The (item, item) cosine-scored symmetric pair frame both
    * [[itemCosineTopK]] and [[recListAudit]] build on. */
  private def scoredItemPairs(baskets: DataFrame, basketCol: String,
      itemCol: String): DataFrame = {
    val m = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sup = m.groupBy(col("__i")).agg(count(lit(1)).as("n"))
    val pairs = m.as("a").join(m.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("ia"), col("b.__i").as("ib"))
      .agg(count(lit(1)).as("co"))
    val sym = pairs.unionAll(pairs.select(col("ib").as("ia"),
      col("ia").as("ib"), col("co")))
    sym
      .join(sup.select(col("__i").as("ia"), col("n").as("n_item")), "ia")
      .join(sup.select(col("__i").as("ib"), col("n").as("n_neighbor")), "ib")
      .withColumn("cosine",
        col("co").cast("double") /
          sqrt((col("n_item") * col("n_neighbor")).cast("double")))
  }

  def itemCosineTopK(baskets: DataFrame, basketCol: String,
      itemCol: String, k: Int = 5): DataFrame = {
    require(k >= 1)
    val scored = scoredItemPairs(baskets, basketCol, itemCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ia")).orderBy(col("cosine").desc, col("ib"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("ia").as("item"), col("ib").as("neighbor"), col("co"),
        col("n_item"), col("n_neighbor"), col("cosine"), col("rn"))
  }

  /** Recommendation-list AUDIT over [[itemCosineTopK]]'s neighborhoods:
    * the two numbers that catch a degenerate recommender before launch —
    * catalog COVERAGE (how much of the catalog ever gets recommended;
    * popularity-collapsed lists score low) and INTRA-LIST SIMILARITY
    * (mean pairwise cosine inside a list; near-duplicate lists score
    * high). Ziegler et al. 2005's diversification diagnostics.
    *
    * Determinism: list-pair cosines are bit-identical doubles, so
    * `trunc(cos·1e6)` integers sum in any order; missing pairs (never
    * co-bought) contribute exactly 0. The scored pair frame is persisted
    * — it feeds the top-k AND the pair lookup (the q27 caching
    * contract).
    *
    * @return one row: (n_lists, catalog_size, n_recommended, coverage,
    *         n_list_pairs, ils_micro_sum, ils)
    */
  def recListAudit(baskets: DataFrame, basketCol: String,
      itemCol: String, k: Int = 5): DataFrame = {
    val scored = scoredItemPairs(baskets, basketCol, itemCol).persist()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ia")).orderBy(col("cosine").desc, col("ib"))
    val topk = scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("ia").as("item"), col("ib").as("nbr")).persist()
    val catalog = baskets.select(col(itemCol).as("__i")).distinct()
      .agg(count(lit(1)).as("catalog_size"))
    val listPairs = topk.as("t1").join(topk.as("t2"),
        col("t1.item") === col("t2.item") && col("t1.nbr") < col("t2.nbr"))
      .select(col("t1.item").as("item"), col("t1.nbr").as("n1"),
        col("t2.nbr").as("n2"))
    val withCos = listPairs.join(
        scored.select(col("ia").as("n1"), col("ib").as("n2"),
          col("cosine")),
        Seq("n1", "n2"), "left")
      .withColumn("cmicro",
        coalesce((col("cosine") * lit(1000000.0)).cast("long"), lit(0L)))
    val lists = topk.agg(countDistinct(col("item")).as("n_lists"),
      countDistinct(col("nbr")).as("n_recommended"))
    val ils = withCos.agg(count(lit(1)).as("n_list_pairs"),
      coalesce(sum(col("cmicro")), lit(0L)).as("ils_micro_sum"))
    lists.crossJoin(broadcast(catalog)).crossJoin(broadcast(ils))
      .select(col("n_lists"), col("catalog_size"), col("n_recommended"),
        (col("n_recommended").cast("double") / col("catalog_size"))
          .as("coverage"),
        col("n_list_pairs"), col("ils_micro_sum"),
        when(col("n_list_pairs") > 0,
          col("ils_micro_sum").cast("double") / col("n_list_pairs") /
            lit(1000000.0)).as("ils"))
  }

  /** Shared CTE prefix (`m`/`sup`/`pr`/`sym`/`scored`) for the
    * item-cosine oracle family; `innerSql` yields (b, i). */
  private def scoredPairsCtes(innerSql: String): String =
    s"""m AS (SELECT DISTINCT b, i FROM ($innerSql)),
       |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
       |pr AS (
       |  SELECT a.i AS ia, bb.i AS ib, CAST(count(*) AS BIGINT) AS co
       |  FROM m a JOIN m bb ON a.b = bb.b AND a.i < bb.i
       |  GROUP BY 1, 2
       |), sym AS (
       |  SELECT ia, ib, co FROM pr
       |  UNION ALL SELECT ib AS ia, ia AS ib, co FROM pr
       |), scored AS (
       |  SELECT sym.ia, sym.ib, sym.co, sa.n AS n_item,
       |         sb.n AS n_neighbor,
       |         CAST(sym.co AS DOUBLE)
       |           / sqrt(CAST(sa.n * sb.n AS DOUBLE)) AS cosine
       |  FROM sym JOIN sup sa ON sa.i = sym.ia
       |           JOIN sup sb ON sb.i = sym.ib
       |)""".stripMargin

  /** DuckDB oracle for [[itemCosineTopK]]: `innerSql` yields (b, i). */
  def itemCosineOracleSql(innerSql: String, k: Int = 5): String =
    s"""WITH ${scoredPairsCtes(innerSql)}
       |SELECT ia AS item, ib AS neighbor, co, n_item, n_neighbor,
       |       cosine, rn
       |FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY ia
       |    ORDER BY cosine DESC, ib) AS BIGINT) AS rn
       |  FROM scored
       |) WHERE rn <= $k""".stripMargin

  /** DuckDB oracle for [[recListAudit]]: `innerSql` yields (b, i). */
  def recListAuditOracleSql(innerSql: String, k: Int = 5): String =
    s"""WITH ${scoredPairsCtes(innerSql)},
       |topk AS (
       |  SELECT ia AS item, ib AS nbr FROM (
       |    SELECT ia, ib, CAST(row_number() OVER (PARTITION BY ia
       |      ORDER BY cosine DESC, ib) AS BIGINT) AS rn
       |    FROM scored
       |  ) WHERE rn <= $k
       |), lp AS (
       |  SELECT t1.item, t1.nbr AS n1, t2.nbr AS n2
       |  FROM topk t1 JOIN topk t2
       |    ON t1.item = t2.item AND t1.nbr < t2.nbr
       |), wc AS (
       |  SELECT lp.*, coalesce(CAST(trunc(s.cosine * 1000000.0)
       |    AS BIGINT), 0) AS cmicro
       |  FROM lp LEFT JOIN scored s ON s.ia = lp.n1 AND s.ib = lp.n2
       |), cat AS (
       |  SELECT CAST(count(DISTINCT i) AS BIGINT) AS catalog_size FROM m
       |), ls AS (
       |  SELECT CAST(count(DISTINCT item) AS BIGINT) AS n_lists,
       |         CAST(count(DISTINCT nbr) AS BIGINT) AS n_recommended
       |  FROM topk
       |), il AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_list_pairs,
       |         CAST(coalesce(sum(cmicro), 0) AS BIGINT) AS ils_micro_sum
       |  FROM wc
       |)
       |SELECT n_lists, catalog_size, n_recommended,
       |       CAST(n_recommended AS DOUBLE) / catalog_size AS coverage,
       |       n_list_pairs, ils_micro_sum,
       |       CASE WHEN n_list_pairs > 0 THEN
       |         CAST(ils_micro_sum AS DOUBLE) / n_list_pairs / 1000000.0
       |       END AS ils
       |FROM ls CROSS JOIN cat CROSS JOIN il""".stripMargin
}
