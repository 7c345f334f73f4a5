package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * A single hot key (one player generating 1% of 100 TB, one stopword
  * token) lands its entire partition on one task in a keyed shuffle. AQE's
  * skew-join split handles much of this at runtime; salting is the
  * explicit, planner-independent form:
  *
  *  - join: the probe side gets a salt in [0, n); the build side is
  *    replicated to every salt value; joining on (key, salt) splits each
  *    hot key across n tasks. Output is identical to the unsalted join
  *    for any salt assignment, so the salt source only needs spread, not
  *    determinism.
  *  - aggregation: partial-aggregate on (key, salt), then final-aggregate
  *    on key — the manual form of the map-side partial Catalyst already
  *    does, useful when combining non-algebraic custom logic.
  */
object Skew {

  /** Deterministic per-row salt: hash of the full row content. A
    * nondeterministic source (row order, monotonically_increasing_id)
    * would assign different salts when a failed map stage is partially
    * recomputed — reducers that already consumed the first attempt's
    * output would then double-count or drop rows (the SPARK-23207 class
    * of bug). Content-hashing is retry-stable; a hot KEY still spreads
    * because its rows differ in the other columns.
    *
    * PRECONDITION: rows of a hot key must actually differ — on an input
    * projected down to the key alone (or with byte-identical duplicate
    * rows), every duplicate hashes to ONE salt and the hot key still
    * lands on one task, with an extra shuffle stage for nothing. Salt
    * BEFORE projecting, or carry a row-unique column through. */
  private def saltCol(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(n.toLong)).cast("int")

  /** Inner equi-join with the probe (larger, skewed) side salted and the
    * build side replicated `salts` times. Build side should be the smaller
    * input — replication multiplies it. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    val sl = probe.withColumn("__salt", saltCol(probe, salts))
    val sr = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted count: per-(key, salt) partials, then the final
    * per-key sum. Result equals `df.groupBy(key).count`. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt", saltCol(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col(key))
      .agg(sum(col("partial")).as("count"))

  /** Key-distribution report — the diagnostic that decides whether a
    * shuffle needs [[saltedJoin]]/AQE skew handling at all: one row with
    * key cardinality, row count, the heaviest key (deterministic lowest-id
    * tie-break), exact discrete count quantiles, and `skew` = max key
    * share relative to a uniform spread (max_c · n_keys / n_rows; 1.0 =
    * perfectly uniform).
    *
    * Scale shape: per-key counts are one keyed aggregation; quantiles are
    * selected from the count HISTOGRAM (distinct count values — bounded
    * by the max key multiplicity, not by key cardinality), so the only
    * window runs over a frame that stays tiny at any corpus size.
    * Quantile ranks are computed in integer arithmetic
    * (`⌈p·n⌉ = (num·n + den − 1) div den`) — a double `ceil(0.9·n)`
    * diverges between engines when 0.9·n lands on an integer.
    *
    * The per-key count frame is `persist()`ed internally (it feeds the
    * totals/top arm and the histogram arm — static exchange reuse cannot
    * unify them), the ONE-ROW result is materialized eagerly, and the
    * cache is released in a `finally` before returning — no caching
    * contract leaks to the caller. The returned frame is a local
    * relation holding the single diagnostic row.
    *
    * @param ps quantiles as rationals (num, den), e.g. (1,2) for p50
    * @return one row: (n_keys, n_rows, max_c, top_key, p<NN>_c…, skew)
    */
  def skewReport(df: DataFrame, keyCol: String,
      ps: Seq[(Int, Int)] = Seq(1 -> 2, 9 -> 10)): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c")).persist()
    try {
      // Heaviest key, ties to the SMALLEST key value: min over (−count,
      // key) structs — works for any orderable key type (a negated-key max
      // would only handle numeric keys).
      val totals = counts.agg(
        count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        min(struct((-col("c")).as("nc"), col(keyCol).as("k"))).as("top"))
      val hist = counts.groupBy(col("c")).agg(count(lit(1)).as("k"))
      val cum = hist.withColumn("cum",
        sum(col("k")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("c")).rowsBetween(Long.MinValue, 0)))
      // Totals ride through the one-row quantile aggregation (max of a
      // constant column), so the single crossJoin serves both the rank
      // thresholds and the output columns.
      val qAggs = ps.map { case (num, den) =>
        min(when(col("cum") >=
          expr(s"($num * n_keys + ${den - 1}) div $den"), col("c")))
          .as(s"p${num * 100 / den}_c")
      } ++ Seq(max(col("n_keys")).as("n_keys"),
        max(col("n_rows")).as("n_rows"), max(col("top")).as("top"))
      val outCols =
        Seq(col("n_keys"), col("n_rows"),
          (-col("top.nc")).as("max_c"), col("top.k").as("top_key")) ++
        ps.map { case (n, d) => col(s"p${n * 100 / d}_c") } :+
        ((-col("top.nc")).cast("double") * col("n_keys") / col("n_rows"))
          .as("skew")
      val out = cum.crossJoin(broadcast(totals))
        .agg(qAggs.head, qAggs.tail: _*)
        .select(outCols: _*)
      val rows = out.collect() // one row by construction — bounded
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally counts.unpersist()
  }

  /** Join-explosion pre-flight: the EXACT output cardinality a key
    * equi-join would produce (`Σ_k c_left(k)·c_right(k)`) plus the top
    * contributing keys — the planner check that catches "this join
    * multiplies to 10¹²" BEFORE the cluster finds out, and names the
    * keys to salt ([[saltedJoin]]) or filter.
    *
    * Cost: two key-count aggregations + one join of the KEY
    * DIRECTORIES (distinct keys, not rows) — the same frame the real
    * join would shuffle, read once. Top keys by two-phase bounded rank
    * (salted partials, then ≤64·topK survivors — the q152 recipe).
    *
    * @return (key, left_rows, right_rows, out_rows, rank) for the topK
    *         keys by output contribution, plus one TOTAL row
    *         (key = NULL) with the full predicted cardinality
    */
  def joinExplosionReport(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("left_rows"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("right_rows"))
    val joined = lc.join(rc, Seq("key"))
      .withColumn("out_rows", col("left_rows") * col("right_rows"))
    val partial = joined
      .withColumn("__rn", row_number().over(Window
        .partitionBy(pmod(hash(col("key")), lit(64)))
        .orderBy(col("out_rows").desc, col("key"))))
      .filter(col("__rn") <= topK)
    val top = partial
      .withColumn("rank", row_number().over(Window
        .orderBy(col("out_rows").desc, col("key"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("key"), col("left_rows"), col("right_rows"),
        col("out_rows"), col("rank"))
    val total = joined.agg(
        sum(col("left_rows")).as("left_rows"),
        sum(col("right_rows")).as("right_rows"),
        sum(col("out_rows")).as("out_rows"))
      .select(lit(null).cast(top.schema("key").dataType).as("key"),
        col("left_rows"), col("right_rows"), col("out_rows"),
        lit(0L).as("rank"))
    top.unionByName(total)
  }

  /** DuckDB oracle for [[joinExplosionReport]]. */
  def joinExplosionOracleSql(leftTable: String, leftKey: String,
      rightTable: String, rightKey: String, topK: Int = 10): String =
    s"""WITH lc AS (
       |  SELECT $leftKey AS key, CAST(count(*) AS BIGINT) AS left_rows
       |  FROM $leftTable GROUP BY 1
       |), rc AS (
       |  SELECT $rightKey AS key, CAST(count(*) AS BIGINT) AS right_rows
       |  FROM $rightTable GROUP BY 1
       |), j AS (
       |  SELECT lc.key, left_rows, right_rows,
       |         left_rows * right_rows AS out_rows
       |  FROM lc JOIN rc ON lc.key = rc.key
       |), top AS (
       |  SELECT key, left_rows, right_rows, out_rows,
       |         CAST(row_number() OVER (ORDER BY out_rows DESC, key)
       |           AS BIGINT) AS rank
       |  FROM j QUALIFY rank <= $topK
       |)
       |SELECT * FROM top
       |UNION ALL
       |SELECT NULL AS key, CAST(sum(left_rows) AS BIGINT),
       |       CAST(sum(right_rows) AS BIGINT),
       |       CAST(sum(out_rows) AS BIGINT), CAST(0 AS BIGINT) AS rank
       |FROM j""".stripMargin
}
