package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Count-min frequency sketch contracts: over-count-only error within the
  * eps·n bound, and heavy-hitter discovery on a skewed corpus. */
class SketchesSpec extends SparkSuite {

  // zipf-ish skew: key "hot" on 20% of rows, "warm" on 5%, cold long tail
  private def skewed = {
    import spark.implicits._
    (0 until 20000).map { i =>
      val k =
        if (i % 5 == 0) "hot"
        else if (i % 20 == 1) "warm"
        else s"cold-${i % 997}"
      (i.toLong, k)
    }.toDF("row_id", "key")
  }

  test("count-min estimates over-count only, within the eps*n bound") {
    val df = skewed
    val sketch = Sketches.countMin(df, col("key"), eps = 0.001)
    val exact = df.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for ((k, true_) <- Seq("hot", "warm", "cold-1").map(k => k -> exact(k))) {
      val est = sketch.estimateCount(k)
      assert(est >= true_, s"$k under-counted: $est < ${true_}") // CMS never undercounts
      assert(est <= true_ + (0.001 * n * 3).toLong, s"$k over-counted far: $est vs ${true_}")
    }
  }

  test("heavyHitters works on non-string key columns (sketch/probe type parity)") {
    import spark.implicits._
    // long key: 60% of rows are key 42; the sketch must be built on the
    // same string rendering the candidates probe with
    val df = (0 until 5000).map(i => (i.toLong, if (i % 5 < 3) 42L else i.toLong))
      .toDF("row_id", "key")
    val hits = Sketches.heavyHitters(df, col("key"), minFrac = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set("42"), hits)
    assert(hits("42") >= 3000L)
  }

  test("heavyHitters finds the hot keys with faithful estimates, nothing cold") {
    val df = skewed
    val hits = Sketches.heavyHitters(df, col("key"), minFrac = 0.04)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set("hot", "warm"), hits)
    assert(hits("hot") >= 4000L && hits("hot") <= 4200L)
    assert(hits("warm") >= 1000L && hits("warm") <= 1200L)
    // deterministic: a repartitioned rerun returns the identical result
    val again = Sketches.heavyHitters(df.repartition(13), col("key"), minFrac = 0.04)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == hits)
  }

  test("hllRollup re-aggregates sketches to coarser grains without rescanning") {
    import spark.implicits._
    // users overlap across (day, hour) groups — re-summing per-group
    // distinct NUMBERS would double-count; sketch union must not.
    val df = (0 until 5000).map { i =>
      (s"d${i % 2}", s"h${(i / 2) % 4}", (i % 700).toLong)
    }.toDF("day", "hour", "user")
    val fine = Sketches.hllRollup(df, Seq(col("day"), col("hour")), col("user"))
    assert(fine.count() == 8)
    val byDay = Sketches.hllReRollup(fine, Seq(col("day")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = df.groupBy("day").agg(count(lit(1)), count_distinct(col("user")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((day, (n, est)) <- byDay) {
      assert(n == exact(day)._1) // row counts re-sum exactly
      val ex = exact(day)._2.toDouble
      assert(math.abs(est.toDouble - ex) / ex < 0.05, s"$day est=$est exact=$ex")
      // naive double-count for contrast: summing per-hour distincts
      // overshoots (each user shows up in several hours)
    }
    val global = Sketches.hllReRollup(fine, Seq(lit(1).as("g")))
      .collect().head.getLong(2)
    assert(math.abs(global.toDouble - 700.0) / 700.0 < 0.05)
  }
}
