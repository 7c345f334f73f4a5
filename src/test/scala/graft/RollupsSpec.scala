package graft

import org.apache.spark.sql.functions._

import graft.ops.{Exact, Rollups}

/** The sketch-relaxed rollup: same shape as the exact form, distinct
  * counts within the configured relative error. */
class RollupsSpec extends SparkSuite {

  test("hourlyRollupApprox matches the exact rollup within the rsd bound") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val ev = t.events
    def run(approx: Boolean) = {
      val f =
        if (approx) Rollups.hourlyRollupApprox _
        else (df: org.apache.spark.sql.DataFrame, ts: org.apache.spark.sql.Column,
            dims: Seq[org.apache.spark.sql.Column], uid: org.apache.spark.sql.Column,
            vc: org.apache.spark.sql.Column, _: Double) =>
          Rollups.hourlyRollup(df, ts, dims, uid, vc)
      f(ev, col("ts"), Seq(col("event_type")), col("user_id"),
        Exact.cents(col("value")), 0.02)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("total_events"), r.getAs[Long]("unique_users")))
        .toMap
    }
    val exact = run(approx = false)
    val approx = run(approx = true)
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (n, distinct)) =>
      val (nA, distinctA) = approx(k)
      assert(nA == n) // counts and grouping identical
      val err = math.abs(distinctA - distinct).toDouble / math.max(distinct, 1)
      assert(err <= 0.10, s"$k: approx $distinctA vs exact $distinct") // 5x rsd headroom
    }
  }
}
