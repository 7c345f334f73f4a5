package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Exact, Rollups}

/** The sketch-relaxed rollup: same shape as the exact form, distinct
  * counts within the configured relative error. Inline fixture — no
  * machine-local testdata dependency. */
class RollupsSpec extends SparkSuite {

  private def events = {
    import spark.implicits._
    (1 to 2000).map { i =>
      (Timestamp.valueOf(s"2024-01-01 ${10 + i % 3}:00:00"),
        if (i % 4 == 0) "click" else "view",
        (i % 137).toLong,       // user_id: 137 distinct per slice
        (i % 50) + 0.25)        // value
    }.toDF("ts", "event_type", "user_id", "value")
  }

  test("denseWindowAgg fills the gap hours with null metrics (fill(null))") {
    import spark.implicits._
    // click events only at 10:00 and 13:00 — 11:00 and 12:00 are holes;
    // view has 10:00 only, so the spine forces 3 null rows for it too.
    val sparse = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:10"), "click", 1L, 2.0),
      (Timestamp.valueOf("2024-01-01 13:00:10"), "click", 2L, 4.0),
      (Timestamp.valueOf("2024-01-01 10:00:20"), "view", 3L, 6.0))
      .toDF("ts", "event_type", "event_id", "value")
    val dense = Rollups.denseWindowAgg(sparse, col("ts"), "1 hour",
      Seq(col("event_type")), col("value"), Exact.cents(col("value")), col("event_id"))
      .collect()
    assert(dense.length == 8) // 4 spine hours x 2 types
    val byKey = dense.map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r).toMap
    assert(byKey(("2024-01-01 10:00:00.0", "click")).getAs[Long]("n_events") == 1L)
    val hole = byKey(("2024-01-01 11:00:00.0", "click"))
    assert(hole.isNullAt(hole.fieldIndex("n_events")))   // no events ≠ zero
    assert(hole.isNullAt(hole.fieldIndex("avg_value")))
    assert(byKey(("2024-01-01 12:00:00.0", "view")).isNullAt(2))
  }

  test("hourlyRollupApprox matches the exact rollup within the rsd bound") {
    def run(approx: Boolean) = {
      val f = if (approx)
        Rollups.hourlyRollupApprox(events, col("ts"), Seq(col("event_type")),
          col("user_id"), Exact.cents(col("value")))
      else
        Rollups.hourlyRollup(events, col("ts"), Seq(col("event_type")),
          col("user_id"), Exact.cents(col("value")))
      f.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("total_events"), r.getAs[Long]("unique_users"),
            r.getAs[Double]("avg_value")))
        .toMap
    }
    val exact = run(approx = false)
    val sketch = run(approx = true)
    assert(exact.nonEmpty && sketch.keySet == exact.keySet)
    exact.foreach { case (k, (n, distinct, avg)) =>
      val (nA, distinctA, avgA) = sketch(k)
      assert(nA == n && avgA == avg) // identical shape outside the sketch
      val err = math.abs(distinctA - distinct).toDouble / math.max(distinct, 1)
      assert(err <= 0.10, s"$k: approx $distinctA vs exact $distinct") // 5x rsd headroom
    }
  }

  test("rollupState merge: any slicing folds to the full recompute, any order") {
    import spark.implicits._
    import graft.ops.Rollups
    val rows = (0 until 300)
      .map(i => (s"k${i % 4}", (i * 37 % 101).toLong)).toDF("key", "v")
    val full = Rollups.rollupState(rows, Seq(col("key")), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    // three disjoint slices, merged pairwise in two different orders
    val s = (0 until 3).map(j =>
      Rollups.rollupState(rows.filter(col("v") % 3 === j), Seq(col("key")), col("v")))
    def m(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Rollups.mergeStates(a, b, Seq("key"))
    for (merged <- Seq(m(m(s(0), s(1)), s(2)), m(s(2), m(s(0), s(1))))) {
      val got = merged.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(got == full)
    }
  }

  test("forwardFill: gauges carry last observation per dim, leading gaps stay null, filled flags imputed rows") {
    import spark.implicits._
    import graft.ops.Rollups
    // dense spine for two dims; nulls = spine-only buckets
    val dense = Seq(
      // dim a: observation at t1 and t3; t2 gap carries t1's gauge
      (1L, "a", Option(2L), Option(10.0)),
      (2L, "a", None, None),
      (3L, "a", Option(1L), Option(30.0)),
      // dim b: LEADING gap has nothing to carry -> stays null
      (1L, "b", None, None),
      (2L, "b", Option(4L), Option(99.0)))
      .toDF("t", "dim", "n", "gauge")
    val out = Rollups.forwardFill(dense, Seq("dim"), "t",
        Seq("gauge"), "n").na.fill(0L, Seq("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4))).toMap
    assert(out((1L, "a")) == ((2L, Some(10.0), false)))
    assert(out((2L, "a")) == ((0L, Some(10.0), true)))  // carried + flagged
    assert(out((3L, "a")) == ((1L, Some(30.0), false))) // new observation wins
    assert(out((1L, "b")) == ((0L, None, true)))        // nothing to carry
    assert(out((2L, "b")) == ((4L, Some(99.0), false)))
  }
}
