package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark plans a raw
  * `t >= start AND t < end` condition as BroadcastNestedLoopJoin — every
  * point checked against every interval, O(points × intervals): the
  * classic silent scale-killer for telemetry-vs-incident-window joins.
  *
  * Bucketed encoding instead: explode each interval into the coarse time
  * buckets it overlaps (`sequence` over the truncated endpoints — an
  * interval spanning h hours yields h+1 rows at hour grain), truncate each
  * point to its bucket, equi-join on the bucket (a keyed shuffle), then
  * post-filter exact containment `[start, end)`. Choose `grain` near the
  * median interval length: coarser grain = fewer interval replicas but
  * larger per-bucket cograms; finer = the reverse.
  *
  * Interval replication is by OVERLAP, so long intervals fan out — for
  * heavily mixed interval lengths, split the interval set by length and
  * run two grains. Deterministic, and the oracle is the plain predicate
  * join (q39). */
object RangeJoin {

  /** @param grain a `date_trunc` unit that is also a valid 1-unit
    *              interval: "hour", "day", "minute". */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointTime: String, startCol: String, endCol: String,
      grain: String = "hour"): DataFrame = {
    val bucketed = intervals.withColumn("__bucket",
      explode(sequence(
        date_trunc(grain, col(startCol)),
        date_trunc(grain, col(endCol)),
        expr(s"INTERVAL 1 $grain"))))
    points.withColumn("__bucket", date_trunc(grain, col(pointTime)))
      .join(bucketed, "__bucket")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop("__bucket")
  }
}
