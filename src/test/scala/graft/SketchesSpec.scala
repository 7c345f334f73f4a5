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
}
