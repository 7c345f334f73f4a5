package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row is enriched with the MOST
  * RECENT right row at or before its timestamp, per key — the canonical
  * feature/dimension-snapshot lookup (prices as of trade time, model
  * version as of event time). Spark has no native as-of join; the naive
  * encodings are a `t >= rt` theta-join (O(n·m) per key) or a per-left-row
  * window over all earlier right rows — both scale-killers.
  *
  * This is the UNION + running-`last` encoding instead: tag right rows
  * side 0 and left rows side 1, union, and take per key, in (time, side,
  * tie) order, the last non-null right payload at or before each row.
  * Cost is ONE shuffle + sort over left+right — identical to a sort-merge
  * join's — and the window frame is running (no per-row rescan).
  * Ordering puts right before left at equal timestamps, so `rt == t`
  * matches (the same inclusive bound as DuckDB's `ASOF JOIN ... ON t >=
  * rt`, which oracles q38). Unmatched left rows keep null payload columns
  * (left-join semantics).
  *
  * Contract: right must be unique per (keys, rightTime) up to `tieBreak` —
  * ties resolve to the highest tie-break value, deterministically.
  * `valueCols` must not collide with left column names.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tieBreak: String): DataFrame = {
    // join-key equality semantics: a NULL key matches nothing, but the
    // window partition would happily group NULL with NULL — drop null-
    // keyed right rows so null-keyed left rows keep a null payload,
    // exactly like the equality theta-join / DuckDB ASOF the q38 oracle runs
    val rNonNull = right.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val r = rNonNull.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__ts"),
        col(tieBreak).as("__tb"),
        struct(valueCols.map(col): _*).as("__rv")): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__ts", col(leftTime))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    valueCols.foldLeft(matched)((d, c) => d.withColumn(c, col(s"__m.$c")))
      .drop("__m", "__rv", "__tb", "__ts", "__side")
  }

  /** BITEMPORAL as-of: enrich facts with the dimension version that was
    * valid at the fact's time (valid-time axis) AS THE WAREHOUSE KNEW
    * IT at `asKnownAt` (transaction-time axis) — "reproduce
    * yesterday's report exactly, including what we had not yet
    * corrected". Restatements append a new row with the SAME
    * `validFrom` and a later `txFrom`; a later `asKnownAt` therefore
    * changes history retroactively, an earlier one ignores the
    * correction — both deterministically.
    *
    * `asKnownAt` is a REPORT PARAMETER (one transaction timestamp per
    * run), which is what makes this scale: the transaction axis
    * reduces to a scan-side filter + one (keys, validFrom) keyed
    * max_by (latest visible correction per version), and the
    * valid-time axis is the [[join]] union-window plan — no 2D range
    * join ever forms. Per-fact as-known-at (a true 2D as-of) is out of
    * contract by design.
    *
    * @return left ++ valueCols ++ (valid_from_used, tx_from_used) —
    *         the provenance pair says which version AND which
    *         correction produced each enriched row; unmatched facts
    *         keep nulls */
  def bitemporalJoin(left: DataFrame, dim: DataFrame, keys: Seq[String],
      leftTime: String, validFrom: String, txFrom: String,
      valueCols: Seq[String], asKnownAt: Long): DataFrame = {
    val payload = valueCols :+ txFrom
    val visible = dim.filter(col(txFrom) <= asKnownAt)
      .groupBy((keys :+ validFrom).map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(txFrom)).as("__v"))
      .select(keys.map(col) ++ Seq(col(validFrom),
        col(validFrom).as("valid_from_used")) ++
        valueCols.map(c => col(s"__v.$c").as(c)) :+
        col(s"__v.$txFrom").as("tx_from_used"): _*)
    join(left, visible, keys, leftTime, validFrom,
      valueCols ++ Seq("valid_from_used", "tx_from_used"),
      tieBreak = "tx_from_used")
  }
}
