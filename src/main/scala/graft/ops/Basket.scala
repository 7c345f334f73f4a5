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
}
