package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Integrity, Quantiles, RangeJoin, Sampling}

/** Edge-case contracts of the relational/OLAP operators (the oracle rows
  * q38-q43 check end-to-end values; these pin the semantics the oracles
  * can't isolate). */
class RelationalOpsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: inclusive bound, latest-wins, null for rows before any snapshot") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 09:00:00")), // before any snapshot → null
      (2L, 10L, ts("2024-01-01 10:00:00")), // == snapshot time → inclusive match
      (3L, 10L, ts("2024-01-01 12:00:00")), // after both → latest wins
      (4L, 99L, ts("2024-01-01 12:00:00"))) // other key, no snapshots → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0, 7L),
      (10L, ts("2024-01-01 11:00:00"), 200.0, 8L))
      .toDF("user_id", "ts", "snap_value", "snap_id")
    val out = AsOf.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("snap_value", "snap_id"), "snap_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("snap_id"))) None else Some(r.getAs[Long]("snap_id"))))
      .toMap
    assert(out == Map(1L -> None, 2L -> Some(7L), 3L -> Some(8L), 4L -> None))
  }

  test("asOf: NULL join keys match nothing on either side") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(10L), ts("2024-01-01 12:00:00")),
      (2L, None, ts("2024-01-01 12:00:00"))) // null-keyed left row
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), ts("2024-01-01 10:00:00"), 1.5, 7L),
      (Option.empty[Long], ts("2024-01-01 10:00:00"), 9.9, 8L)) // null-keyed snapshot
      .toDF("user_id", "ts", "snap_value", "snap_id")
    val out = AsOf.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("snap_value", "snap_id"), "snap_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("snap_id"))) None else Some(r.getAs[Long]("snap_id"))))
      .toMap
    // equality semantics: the null-keyed left row must NOT pick up the
    // null-keyed snapshot (window partitioning would happily group them)
    assert(out == Map(1L -> Some(7L), 2L -> None))
  }

  test("asOf: union+running-last equals the naive theta-join on random data") {
    import spark.implicits._
    // pseudo-random but deterministic: ~300 left rows, ~60 right rows over
    // 7 keys with colliding timestamps to exercise ties
    val left = (0 until 300).map { i =>
      (i.toLong, (i * 31 % 7).toLong, ts(f"2024-01-01 ${i * 17 % 24}%02d:${i * 13 % 60}%02d:00"))
    }.toDF("event_id", "user_id", "ts")
    val right = (0 until 60).map { j =>
      ((j * 37 % 7).toLong, ts(f"2024-01-01 ${j * 11 % 24}%02d:${j * 7 % 60}%02d:00"),
        j * 1.5, 1000L + j)
    }.toDF("user_id", "ts", "snap_value", "snap_id")
      .groupBy("user_id", "ts")
      .agg(max("snap_value").as("snap_value"), max("snap_id").as("snap_id"))
    val fast = AsOf.join(left, right, Seq("user_id"), "ts", "ts",
      Seq("snap_value", "snap_id"), "snap_id")
      .select("event_id", "snap_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // naive: theta-join all eligible rights, keep max (rt, snap_id)
    val naive = left.as("l")
      .join(right.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id"))
      .agg(max_by(col("r.snap_id"), struct(col("r.ts"), col("r.snap_id"))).as("snap_id"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fast == naive)
    assert(fast.valuesIterator.contains(-1L)) // some rows genuinely unmatched
  }

  test("rangeJoin: bucketed result equals the naive theta join; boundary is [start, end)") {
    import spark.implicits._
    val points = (0 until 200).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"))).toDF("pid", "t")
    val iv = Seq(
      (1L, ts("2024-01-01 03:30:00"), ts("2024-01-01 06:10:00")), // multi-bucket span
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
      .toDF("iid", "s", "e")
    val bucketed = RangeJoin.pointInInterval(points, iv, "t", "s", "e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(iv, col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive && bucketed.nonEmpty)
    // end-exclusive: a point exactly at e must be out, at s must be in
    val edge = Seq((100L, ts("2024-01-01 10:00:00")), (101L, ts("2024-01-01 10:30:00")))
      .toDF("pid", "t")
    val hits = RangeJoin.pointInInterval(edge, iv, "t", "s", "e")
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(hits == Set(100L))
  }

  test("plan shapes: asOf is one window pass, rangeJoin never plans a nested-loop join") {
    import spark.implicits._
    val left = (0 until 50).map(i =>
      (i.toLong, (i % 5).toLong, ts(f"2024-01-01 ${i % 24}%02d:00:00"))).toDF("event_id", "user_id", "ts")
    val right = (0 until 10).map(j =>
      ((j % 5).toLong, ts(f"2024-01-01 ${j}%02d:30:00"), j * 1.0, j.toLong)).toDF("user_id", "ts", "v", "rid")
    val asofPlan = AsOf.join(left, right, Seq("user_id"), "ts", "ts", Seq("v", "rid"), "rid")
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("Join"), asofPlan) // pure union + window, no join at all
    assert(asofPlan.split("Window").length == 2, asofPlan) // exactly one window op

    val iv = Seq((1L, ts("2024-01-01 03:00:00"), ts("2024-01-01 05:00:00"))).toDF("iid", "s", "e")
    val rjPlan = RangeJoin.pointInInterval(left, iv, "ts", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!rjPlan.contains("NestedLoop"), rjPlan) // the bucket key makes it a hash join
    assert(rjPlan.contains("BroadcastHashJoin") || rjPlan.contains("SortMergeJoin"), rjPlan)
  }

  test("star join broadcasts the dim side at sf0.01") {
    val df = graft.queries.Relational.queries("q49_star_join")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan) // nation never shuffles the facts
    assert(df.count() == 25)
  }

  test("quantiles: approx sketch lands within rank tolerance of the exact answer") {
    import spark.implicits._
    val df = (1 to 10000).map(i => ("g", i.toLong)).toDF("g", "v")
    val ex = Quantiles.exact(df, Seq(col("g")), col("v"), Seq(0.5, 0.99)).head
    assert(ex.getAs[Long]("p50") == 5000L && ex.getAs[Long]("p99") == 9900L)
    val ap = Quantiles.approx(df, Seq(col("g")), col("v"), Seq(0.5, 0.99)).head
    assert(math.abs(ap.getAs[Long]("p50") - 5000L) <= 50)
    assert(math.abs(ap.getAs[Long]("p99") - 9900L) <= 50)
  }

  test("quantiles: rational ranks match float exact on the hazard " +
      "points (n divisible by 10) and are exact by construction") {
    import spark.implicits._
    // measured: double(0.9)*10 rounds back to exactly 9.0 (relative
    // error ≤ 2^-53 < half-ulp), so float ceil agrees here — but only
    // by rounding analysis; the rational form needs none
    for (n <- Seq(10, 20, 70, 100, 1000)) {
      val df = (1 to n).map(i => ("g", i.toLong)).toDF("g", "v")
      val fl = Quantiles.exact(df, Seq(col("g")), col("v"), Seq(0.9)).head
      val ra = Quantiles.exactRatio(df, Seq(col("g")), col("v"),
        Seq((9, 10))).head
      assert(ra.getAs[Long]("p90") == (9L * n + 9L) / 10L,
        s"rational p90 wrong at n=$n")
      assert(fl.getAs[Long]("p90") == ra.getAs[Long]("p90"),
        s"float/rational diverge at n=$n")
    }
    val ra = Quantiles.exactRatio(
      (1 to 10).map(i => ("g", i.toLong)).toDF("g", "v"),
      Seq(col("g")), col("v"), Seq((1, 2), (9, 10))).head
    assert(ra.getAs[Long]("p50") == 5L)
    assert(ra.getAs[Long]("p90") == 9L)
  }

  test("incremental corpus dedup: history fingerprints and intra-batch dups both drop") {
    import spark.implicits._
    val history = Seq((1L, "the quick brown fox"), (2L, "existing doc two"))
      .toDF("doc_id", "text")
    val historyFps = history.select(
      graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))
    val batch = Seq(
      (10L, "THE  quick   brown fox"), // normalizes to history doc 1 → drop
      (11L, "genuinely new content"),
      (12L, "genuinely new content"),  // intra-batch dup → keep lowest id
      (13L, "another new one"))
      .toDF("doc_id", "text")
    val kept = graft.text.Corpus.incremental(batch, "doc_id", "text", historyFps)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L))
  }

  test("session_window boundary: an exactly-gap-later event MERGES (inclusive bound)") {
    // Pins the boundary rule q48's oracle must mirror: Spark merges when
    // next.ts <= prev.ts + gap (inclusive), so the gaps-and-islands break
    // condition is STRICTLY greater-than. (Measured here — an earlier
    // draft of the oracle used >= and only passed by data luck.)
    import spark.implicits._
    val df = Seq(
      (7L, ts("2024-01-01 10:00:00")),
      (7L, ts("2024-01-01 10:30:00")),   // exactly gap later → merges
      (7L, ts("2024-01-01 11:00:01")))   // 30:01 later → new session
      .toDF("user_id", "ts")
    val sessions = df.groupBy(col("user_id"),
        org.apache.spark.sql.functions.session_window(col("ts"), "30 minutes"))
      .count().collect().map(_.getLong(2)).sorted.toSeq
    assert(sessions == Seq(1L, 2L))
  }

  test("sampling: deterministic across runs/partitionings, additive in the rate") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (i.toLong, if (i % 4 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def ids(d: org.apache.spark.sql.DataFrame, rate: Double) =
      Sampling.stratifiedSample(d, col("doc_id"), col("lang"),
        Map("en" -> rate), defaultRate = 0.1, salt = "s")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(df, 0.3)
    assert(a == ids(df.repartition(13), 0.3)) // layout-independent
    val b = ids(df, 0.6)
    assert(a.subsetOf(b)) // raising a rate keeps every prior row
    // rates land near nominal
    val en = df.filter(col("lang") === "en").count().toDouble
    val enKept = Sampling.stratifiedSample(df, col("doc_id"), col("lang"),
      Map("en" -> 0.3), 0.1, "s").filter(col("lang") === "en").count()
    assert(math.abs(enKept / en - 0.3) < 0.08)
  }

  test("assignSplit: stable fractions, exhaustive and disjoint labels") {
    import spark.implicits._
    val df = (0 until 5000).map(_.toLong).toDF("id")
    val split = Sampling.assignSplit(df, col("id"), "x",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 5000L)
    assert(math.abs(counts("train") / 5000.0 - 0.8) < 0.05)
    // same key, same salt → same split on a different day/run
    val again = Sampling.assignSplit(df.repartition(7), col("id"), "x",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    split.collect().foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
  }

  test("capPerKey caps each key, is deterministic, and is a subset under repartitioning") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "key")
    val capped = Sampling.capPerKey(df, col("key"), col("id"), 20, "s")
    val byKey = capped.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey.values.forall(_ == 20L) && byKey.size == 3)
    // Same winners regardless of partitioning (hash priority, not order).
    val again = Sampling.capPerKey(df.repartition(7), col("key"), col("id"), 20, "s")
    assert(capped.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // Raising the cap keeps every previously selected row (prefix property).
    val wider = Sampling.capPerKey(df, col("key"), col("id"), 30, "s")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(capped.select("id").collect().map(_.getLong(0)).forall(wider))
  }

  test("weightedSample: rate tracks weight, additive in the weight, zero drops all") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, (i % 4) * 100L)).toDF("id", "w")
    val kept = Sampling.weightedSample(df, col("id"), col("w"), 400L, "ws")
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0L)) // w=0 never survives
    // survival fraction ≈ w/400 per stratum (1000 rows each)
    assert(math.abs(kept(100L) - 250.0) < 80)
    assert(math.abs(kept(200L) - 500.0) < 80)
    assert(math.abs(kept(300L) - 750.0) < 80)
    // additivity: every row kept at weight w survives at weight w+100
    val at200 = Sampling.weightedSample(df.withColumn("w", lit(200L)),
      col("id"), col("w"), 400L, "ws").select("id").collect().map(_.getLong(0)).toSet
    val at300 = Sampling.weightedSample(df.withColumn("w", lit(300L)),
      col("id"), col("w"), 400L, "ws").select("id").collect().map(_.getLong(0)).toSet
    assert(at200.subsetOf(at300))
  }

  test("minMaxNormalize: exact [0,1] per group, constant group pins to 0.5") {
    import spark.implicits._
    import graft.ops.Profiling
    val df = Seq(("g1", 10L), ("g1", 20L), ("g1", 30L),
      ("g2", 7L), ("g2", 7L)).toDF("grp", "v")
    val out = Profiling.minMaxNormalize(df, "grp", col("v"), "norm")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out(("g1", 10L)) == 0.0 && out(("g1", 20L)) == 0.5 &&
      out(("g1", 30L)) == 1.0)
    assert(out(("g2", 7L)) == 0.5) // constant group: centered, not NaN
  }

  test("capPerKeyIds: identical winners to the window form, no Window in the plan") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"k${i % 5}")).toDF("id", "key")
    val viaWindow = Sampling.capPerKey(df, col("key"), col("id"), 12, "s")
      .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaTopK = Sampling.capPerKeyIds(df, "key", "id", 12, "s")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaTopK == viaWindow)
    // two-phase aggregate, never a per-key window sort of the whole frame
    val plan = Sampling.capPerKeyIds(df, "key", "id", 12, "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
  }

  test("histogramCuts + binByCuts: exact deciles, equal-frequency bins, ties share") {
    import spark.implicits._
    import graft.ops.Quantiles
    val df = (1 to 100).map(_.toLong).toDF("v") // values 1..100
    val cuts = Quantiles.histogramCuts(df, col("v"), (1 to 9).map(i => (i, 10)))
    val row = cuts.collect().head
    // rank ceil(i*100/10) = 10i → cut value 10i exactly
    assert(cuts.columns.toSeq == (1 to 9).map(i => s"c${i * 10}"))
    assert((0 until 9).map(row.getLong) == (1 to 9).map(_ * 10L))
    val binned = Quantiles.binByCuts(df, col("v"), cuts)
    val counts = binned.groupBy("bin").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == (0L to 9L).map(_ -> 10L).toMap) // 10 bins x 10 rows
    // Ties: duplicate values land in one bin
    val dup = Quantiles.binByCuts(
      Seq(10L, 10L, 10L).toDF("v"), col("v"), cuts)
      .select("bin").distinct().collect()
    assert(dup.length == 1 && dup.head.getLong(0) == 0L)
    // NULL values get a NULL bin (explicit contract, matches the oracle's
    // CASE WHEN ... IS NULL arm), not a null-propagated surprise
    val withNull = Quantiles.binByCuts(
      Seq(Some(10L), None, Some(95L)).toDF("v"), col("v"), cuts)
      .orderBy(col("v").asc_nulls_first).select("bin").collect()
    assert(withNull(0).isNullAt(0))
    assert(withNull(1).getLong(0) == 0L && withNull(2).getLong(0) == 9L)
  }

  test("corrFromSums: exact ±1 on linear data, NULL on constant columns") {
    import spark.implicits._
    import graft.ops.Exact
    import org.apache.spark.sql.types.DecimalType
    def corrOf(pairs: Seq[(Long, Long)]): Option[Double] = {
      val df = pairs.toDF("x", "y")
      val r = df.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"),
          sum(col("y").cast(DecimalType(38, 0)) * col("x")).as("sxy"))
        .select(Exact.corrFromSums(col("n"), col("sx"), col("sy"),
          col("sxx"), col("syy"), col("sxy")))
        .collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    // ±1 up to one IEEE rounding of sqrt(vx)·sqrt(vy) — the portability
    // guarantee is bit-equality BETWEEN engines, not algebraic exactness.
    assert(math.abs(corrOf(Seq((1L, 2L), (2L, 4L), (3L, 6L))).get - 1.0) < 1e-12)
    assert(math.abs(corrOf(Seq((1L, 6L), (2L, 4L), (3L, 2L))).get + 1.0) < 1e-12)
    assert(corrOf(Seq((1L, 5L), (2L, 5L), (3L, 5L))).isEmpty) // var(y) = 0
    val r = corrOf(Seq((1L, 1L), (2L, 5L), (3L, 2L), (4L, 9L))).get
    assert(r > 0 && r < 1) // noisy positive, bounded
  }

  test("eventSequences: (ts, tie) total order, span stats per user") {
    import spark.implicits._
    import graft.ops.Journey
    val ev = Seq(
      (10L, 3L, ts("2024-01-01 10:00:02"), "c"),
      (10L, 1L, ts("2024-01-01 10:00:01"), "a"),
      (10L, 2L, ts("2024-01-01 10:00:01"), "b"), // ts tie → event_id order
      (20L, 4L, ts("2024-01-01 11:00:00"), "x")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Journey.eventSequences(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getLong(1) == 3L)
    assert(out(10L).getString(4) == "a->b->c")
    assert(out(10L).getTimestamp(2) == ts("2024-01-01 10:00:01"))
    assert(out(10L).getTimestamp(3) == ts("2024-01-01 10:00:02"))
    assert(out(20L).getString(4) == "x")
  }

  test("applyChanges: update, insert, delete, idempotent unmatched delete") {
    import spark.implicits._
    import graft.ops.Merge
    val target = Seq(
      (1L, "alice", 10.0),
      (2L, "bob", 20.0),
      (3L, "carol", 30.0)).toDF("id", "name", "bal")
    val changes = Seq(
      (2L, "bob2", 25.0, "upsert"),   // matched update
      (3L, "carol", 30.0, "delete"),  // matched delete
      (4L, "dave", 40.0, "upsert"),   // unmatched insert
      (9L, "ghost", 0.0, "delete")    // unmatched delete → no-op
    ).toDF("id", "name", "bal", "op")
    val out = Merge.applyChanges(target, changes, Seq("id"))
    assert(out.columns.toSeq == Seq("id", "name", "bal"))
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(rows == Map(
      1L -> (("alice", 10.0)), // untouched
      2L -> (("bob2", 25.0)),  // updated
      4L -> (("dave", 40.0)))) // inserted; 3 deleted, 9 never existed
  }

  test("snapshotDiff classifies all four statuses and round-trips " +
      "through diffToChanges + applyChanges") {
    import spark.implicits._
    import graft.ops.Merge
    val oldS = Seq((1L, "a", "fa"), (2L, "b", "fb"), (3L, "c", "fc"))
      .toDF("id", "payload", "fp")
    val newS = Seq((1L, "a", "fa"), (2L, "b2", "fb2"), (4L, "d", "fd"))
      .toDF("id", "payload", "fp")
    val diff = Merge.snapshotDiff(
      oldS.select("id", "fp"), newS.select("id", "fp"), Seq("id"), "fp")
    assert(diff.columns.toSeq == Seq("id", "status", "fp_old", "fp_new"))
    val st = diff.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // The closing property: applying the derived change set to the old
    // snapshot reproduces the new snapshot exactly.
    val merged = Merge.applyChanges(
      oldS, Merge.diffToChanges(diff, newS, Seq("id")), Seq("id"))
    val asSet = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(asSet(merged) == asSet(newS))
  }

  test("snapshotDiff: NULL digests compare null-safe, not as missing rows") {
    import spark.implicits._
    import graft.ops.Merge
    val oldS = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "fp")
    val newS = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "fp")
    val st = Merge.snapshotDiff(oldS, newS, Seq("id"), "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("triangleCounts: hand graph, canonicalization, and K5 closed form") {
    import spark.implicits._
    import graft.ops.Triangles
    // Triangles {1,2,3} and {2,3,4}; (1,5) closes nothing. Noise: a
    // reversed duplicate (2,1), a parallel edge (2,3) twice, a self-loop
    // (3,3), and a NULL endpoint — all must collapse or drop.
    val e = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (1L, 5L),
      (2L, 1L), (3L, 2L), (3L, 3L)).map { case (a, b) =>
        (Option(a), Option(b)) } :+ ((Option(9L), Option.empty[Long]))
    val out = Triangles.triangleCounts(e.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // K5: every node sits in C(4,2) = 6 triangles
    val k5 = (for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b))
      .toDF("src", "dst")
    val kc = Triangles.triangleCounts(k5, "src", "dst")
      .collect().map(r => r.getLong(1)).toSeq
    assert(kc.length == 5 && kc.forall(_ == 6L))
    spark.catalog.clearCache()
  }

  test("profileDrift: null-rate, cardinality-ratio and extreme moves flag; " +
      "stable columns don't") {
    import spark.implicits._
    import graft.ops.Profiling
    val ref = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, Some("c"), 30L), (4L, Some("d"), 40L))
      .toDF("id", "cat", "v")
    // cat: half nulled (null drift). v: one value pushed past the ref
    // max (extreme move). id: untouched control.
    val cur = Seq((1L, Option.empty[String], 10L), (2L, Option.empty[String], 20L),
      (3L, Some("c"), 30L), (4L, Some("d"), 99L))
      .toDF("id", "cat", "v")
    val out = Profiling.profileDrift(ref, cur, Seq("id", "cat", "v"),
        maxNullDelta = 0.1, maxDistinctRatio = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("extremes_moved"), r.getAs[Long]("drift"))).toMap
    assert(out("id") == (0L, 0L))
    assert(out("cat") == (1L, 1L)) // null delta 0.5 AND min moved (a → c)
    assert(out("v") == (1L, 1L))
    // cardinality collapse alone flags: 4 distinct -> 1 at ratio 3
    val flat = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x")).toDF("id", "cat")
    val rat = Profiling.profileDrift(ref.select("id", "cat"), flat,
        Seq("cat"), maxNullDelta = 1.0, maxDistinctRatio = 3.0)
      .collect().head
    assert(rat.getAs[Long]("drift") == 1L)
  }

  test("adamicAdar: exact bit-length weights, hub cut before pair generation") {
    import spark.implicits._
    import graft.ops.LinkPredict
    // Customers 1,2 share suppliers 10 (deg 3) and 11 (deg 2); customer 3
    // touches only 10. blog(3) = blog(2) = 2 → each weight 500000.
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L),
      (1L, 10L) /* parallel edge collapses */).toDF("src", "dst")
    val out = LinkPredict.adamicAdar(e, "src", "dst", minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("common"), r.getAs[Long]("aa_score"))).toMap
    assert(out == Map((1L, 2L) -> (2L, 1000000L)))
    // maxDeg = 2 cuts hub 10 entirely: (1,2) survive on 11 alone.
    val cut = LinkPredict.adamicAdar(e, "src", "dst", minCommon = 1, maxDeg = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("common"))
      .toMap
    assert(cut == Map((1L, 2L) -> 1L))
  }

  test("trimmedStats: hand-computed trim/winsorize, single-row group untrimmed") {
    import spark.implicits._
    import graft.ops.Quantiles
    // Group a: values 1..9 plus outlier 1000 (n=10, k=1): trimmed drops
    // 1 and 1000 → mean of 2..9 = 5.5; winsorized clamps them to the
    // kept extremes (2, 9) → (44 + 2 + 9) / 10 = 5.5. Group b: one row —
    // k=0, nothing trimmed.
    val df = ((1L to 9L) :+ 1000L).map(("a", _)) :+ (("b", 7L))
    val out = Quantiles.trimmedStats(df.toDF("g", "v"),
        Seq(col("g")), col("v"), num = 1, den = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("trimmed_mean"), r.getAs[Double]("winsorized_mean")))
      .toMap
    assert(out("a") == (10L, 8L, 5.5, 5.5))
    assert(out("b") == (1L, 1L, 7.0, 7.0))
    // The plain mean the outlier would have dragged to 104.5:
    assert(out("a")._3 < 6.0)
  }

  test("kAnonymity: violations reported, suppression removes exactly those rows") {
    import spark.implicits._
    import graft.ops.Profiling
    // Groups: (us, a) ×3 — safe at k=3; (us, b) ×2 — violates; (de, a)
    // ×1 — violates; (NULL, a) ×3 — NULLs group together, safe.
    val rows = Seq(
      (1L, Some("us"), "a"), (2L, Some("us"), "a"), (3L, Some("us"), "a"),
      (4L, Some("us"), "b"), (5L, Some("us"), "b"),
      (6L, Some("de"), "a"),
      (7L, None, "a"), (8L, None, "a"), (9L, None, "a"))
      .toDF("id", "region", "seg")
    val viol = Integrity.kAnonymityViolations(rows, Seq("region", "seg"), 3)
      .collect().map(r => (r.getAs[String]("region"), r.getString(1)) ->
        r.getAs[Long]("group_n")).toMap
    assert(viol == Map(("us", "b") -> 2L, ("de", "a") -> 1L))
    val kept = Integrity.kAnonymize(rows, Seq("region", "seg"), 3)
    assert(kept.columns.toSeq == Seq("id", "region", "seg"))
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 7L, 8L, 9L))
  }

  test("kCore: tail peels in cascade order; K4 core survives with exact degrees") {
    import spark.implicits._
    import graft.ops.KCore
    // K4 on {1,2,3,4} plus a tail 4–5–6. 2-core = K4: node 6 (deg 1)
    // peels in round 1, which drops 5 to deg 1 → peels in round 2.
    // Noise: reversed dup (2,1), self-loop (3,3), NULL endpoint.
    val e = (Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (2L, 1L), (3L, 3L))
      .map { case (a, b) => (Option(a), Option(b)) } :+
      ((Option.empty[Long], Option(9L)))).toDF("src", "dst")
    def run(rounds: Int) = KCore.kCore(e, "src", "dst", k = 2, rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // One round: 6 is gone but 5 (round-1 degree 2) still survives.
    assert(run(1) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
    // Two rounds reach the fixpoint; more rounds are stable.
    val core = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    assert(run(2) == core && run(4) == core)
  }

  test("corenessHIndex: h-index propagation reaches the exact core " +
      "numbers on a clique-plus-tail and a cycle") {
    import spark.implicits._
    import graft.ops.KCore
    // K4 on {1..4} + tail 4-5-6: coreness 3/3/3/3/1/1 (deg 3/3/3/4/2/1)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    def run(rounds: Int) = KCore.corenessHIndex(e, "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val exact = Map(1L -> ((3L, 3L)), 2L -> ((3L, 3L)), 3L -> ((3L, 3L)),
      4L -> ((3L, 4L)), 5L -> ((1L, 2L)), 6L -> ((1L, 1L)))
    assert(run(2) == exact)
    assert(run(6) == exact, "converged values are stable")
    // round 1 is the documented monotone upper bound: node 5's first
    // h-index over neighbor degrees {4, 1} is already 1, node 4 drops
    // from deg 4 to 3 - the sequence never undershoots coreness
    val r1 = run(1)
    assert(r1.forall { case (n, (c, _)) => c >= exact(n)._1 })
    // C5 cycle: every node coreness 2 from round 0 onward
    val cyc = (0L to 4L).map(i => (i + 10, (i + 1) % 5 + 10))
      .toDF("src", "dst")
    assert(KCore.corenessHIndex(cyc, "src", "dst", 2)
      .collect().forall(r => r.getLong(1) == 2L && r.getLong(2) == 2L))
  }

  test("densestSubgraphTrace: the peel uncovers a planted clique as " +
      "the best round; hygiene and threshold are exact") {
    import spark.implicits._
    import graft.ops.Densest
    // K5 on {1..5} (10 edges, density 2.0) + a 20-node path hung off
    // node 5 (20 edges). Round 0: V=25, E=30, rho=1.2. With eps=1/2 the
    // peel removes d*V <= 3*E2 <=> d <= 7.2 ... threshold keep
    // d*25*2 > 3*60 <=> d > 3.6: path nodes (d<=2) drop, K5 (d>=4)
    // survives -> round 1 IS the clique, density 2.0, flagged best.
    val k5 = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val path = (0 until 20).map(i =>
      (if (i == 0) 5L else 100L + i, 101L + i))
    val e = (k5 ++ path).toDF("src", "dst")
    val out = Densest.densestSubgraphTrace(e, "src", "dst",
        epsNum = 1L, epsDen = 2L, rounds = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(0L) == ((25L, 30L, 1.2, false)))
    assert(out(1L) == ((5L, 10L, 2.0, true)))
    // K5 is its own fixpoint at this threshold? d*V*2 > 3*E2:
    // 4*5*2 = 40 > 3*20 = 60 is FALSE -> the clique peels away next
    // round; the trace simply ends (no empty rows emitted).
    assert(!out.contains(2L) && out.size == 2)
    // hygiene: self-loops, NULLs, reversed dups collapse
    val noisy = (Seq((Some(1L), Some(2L)), (Some(2L), Some(1L)),
      (Some(3L), Some(3L)), (None, Some(4L)), (Some(1L), Some(3L)),
      (Some(2L), Some(3L)))).toDF("src", "dst")
    val t0 = Densest.densestSubgraphTrace(noisy, "src", "dst",
      rounds = 1).collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(t0(0L) == ((3L, 3L)))
  }

  test("joinDelta: old result plus delta reproduces the full recompute " +
      "as a multiset; the delta-delta term is not forgotten") {
    import spark.implicits._
    import graft.ops.Merge
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val b = Seq((1L, "b1"), (1L, "b1b"), (3L, "b3")).toDF("k", "bv")
    // dA brings key 3 (matches base b) and key 4; dB brings key 2
    // (matches base a) and key 4 — key 4 joins ONLY via dA⋈dB.
    val dA = Seq((3L, "a3"), (4L, "a4")).toDF("k", "av")
    val dB = Seq((2L, "b2"), (4L, "b4"), (4L, "b4b")).toDF("k", "bv")
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2))).groupBy(identity).view.mapValues(_.length).toMap
    val delta = Merge.joinDelta(a, b, dA, dB, Seq("k"))
    val maintained = bag(a.join(b, Seq("k")).unionByName(delta))
    val recompute = bag(a.unionByName(dA).join(b.unionByName(dB), Seq("k")))
    assert(maintained == recompute)
    // the delta-delta pairs are present (key 4 never touches a base)
    val d = bag(delta)
    assert(d.contains((4L, "a4", "b4")) && d.contains((4L, "a4", "b4b")))
    // duplicate base rows multiply correctly (key 1 is not in any delta
    // -> contributes nothing to the delta)
    assert(!d.keys.exists(_._1 == 1L))
  }

  test("applyChanges: NULL keys never match (SQL MERGE semantics)") {
    import spark.implicits._
    import graft.ops.Merge
    val target = Seq((Some(1L), "a"), (None, "null-target"))
      .toDF("id", "name")
    val changes = Seq((Option.empty[Long], "null-change", "upsert"))
      .toDF("id", "name", "op")
    val out = Merge.applyChanges(target, changes, Seq("id"))
      .collect().map(r => r.getString(1)).toSet
    // Null-keyed target row kept, null-keyed upsert inserts a new row.
    assert(out == Set("a", "null-target", "null-change"))
  }

  test("applyChanges rejects a change set missing target columns") {
    import spark.implicits._
    import graft.ops.Merge
    val target = Seq((1L, "a")).toDF("id", "name")
    val bad = Seq((1L, "upsert")).toDF("id", "op") // no 'name'
    val e = intercept[IllegalArgumentException] {
      Merge.applyChanges(target, bad, Seq("id"))
    }
    assert(e.getMessage.contains("name"))
  }

  test("applyChanges fails loudly on unknown or null op values") {
    import spark.implicits._
    import graft.ops.Merge
    val target = Seq((1L, "a")).toDF("id", "name")
    for (badOp <- Seq("DELETE", "remove", null)) {
      val ch = Seq((1L, "x", badOp)).toDF("id", "name", "op")
      val e = intercept[Exception] {
        Merge.applyChanges(target, ch, Seq("id")).collect()
      }
      // raise_error surfaces as USER_RAISED_EXCEPTION wrapping our message
      assert(e.getMessage.contains("unknown op value") ||
        Option(e.getCause).exists(_.getMessage.contains("unknown op value")),
        s"op=$badOp: ${e.getMessage}")
    }
  }

  test("histogramCuts excludes NULLs and rejects colliding cut names") {
    import spark.implicits._
    import graft.ops.Quantiles
    // 6 nulls + values 1..4: cuts must derive from the 4 real values only
    val df = (Seq.fill(6)(Option.empty[Long]) ++
      (1L to 4L).map(Some(_))).toDF("v")
    val cuts = Quantiles.histogramCuts(df, col("v"), Seq((1, 2), (1, 1)))
    val row = cuts.collect().head
    assert(row.getLong(0) == 2L && row.getLong(1) == 4L) // median 2, max 4
    val e = intercept[IllegalArgumentException] {
      Quantiles.histogramCuts(df, col("v"), Seq((1, 3), (33, 100)))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("fkAudit: planted orphans counted with multiplicity, NULL keys " +
      "separate, clean FK passes") {
    import spark.implicits._
    import graft.ops.Profiling
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    // key 9 is an orphan appearing twice; two NULL keys are not orphans
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), None, None)
      .toDF("fk_col")
    val out = Integrity.fkAudit(Seq(
      ("dirty", child, "fk_col", parent, "pk"),
      ("clean", child.filter(col("fk_col") <= 2), "fk_col", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("dirty") == ((6L, 2L, 2L, false)))
    assert(out("clean") == ((2L, 0L, 0L, true)))
  }

  test("benfordAudit: digit counts exact, fractions sum to 1, " +
      "zero/negative rows excluded") {
    import spark.implicits._
    import graft.ops.Profiling
    // 1, 19, 123 → digit 1 ×3; 25 → 2; 9 → 9; 0 and -5 excluded
    val df = Seq(1L, 19L, 123L, 25L, 9L, 0L, -5L).toDF("cents")
    val rows = Profiling.benfordAudit(df, col("cents")).collect()
    val byDigit = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDigit == Map("1" -> 3L, "2" -> 1L, "9" -> 1L))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    val d1 = rows.find(_.getString(0) == "1").get
    assert(d1.getDouble(3) == Profiling.benfordExpected.head)
    assert(d1.getDouble(4) == math.abs(3.0 / 5 - Profiling.benfordExpected.head))
  }

  test("intervalMerge: overlap and touch fuse, gaps split, islands " +
      "numbered in order") {
    import spark.implicits._
    import graft.ops.RangeJoin
    val iv = Seq(
      ("k", 0L, 10L), ("k", 5L, 15L),   // overlap → one island
      ("k", 15L, 20L),                  // touches → same island
      ("k", 30L, 40L),                  // gap → new island
      ("z", 100L, 110L))                // other key independent
      .toDF("g", "s", "e")
    val out = RangeJoin.intervalMerge(iv, Seq("g"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("k", 1L)) == ((0L, 20L, 3L)))
    assert(out(("k", 2L)) == ((30L, 40L, 1L)))
    assert(out(("z", 1L)) == ((100L, 110L, 1L)))
  }

  test("quantileMap: identical distributions map onto their own decile " +
      "bounds; a shifted batch lands on the reference's coordinates") {
    import spark.implicits._
    import graft.ops.Quantiles
    val ref = (1L to 100L).toDF("v")
    val sameOut = Quantiles.quantileMap(ref, (1L to 100L).toDF("v"),
        col("v"), (1 to 9).map(i => (i, 10)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // value 5 sits in decile bin 0 → mapped to ref c10 = 10
    assert(sameOut(5L) == 10L && sameOut(95L) == 100L)
    // shifted batch (+1000): same ranks, so same mapped values
    val shifted = Quantiles.quantileMap(ref,
        (1L to 100L).map(_ + 1000L).toDF("v"), col("v"),
        (1 to 9).map(i => (i, 10)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(shifted(1005L) == 10L && shifted(1095L) == 100L)
  }

  test("goldenRecords: field-wise modal survivorship, count ties break " +
      "ascending, all-NULL fields stay NULL") {
    import spark.implicits._
    import graft.ops.Merge
    // cluster c1: modal src = x (2 of 3); lang en/fr tie 1-1 → asc
    // tie-break picks en; note NULL across the cluster stays NULL;
    // cluster c2: singleton survives as itself
    val df = Seq[(String, Option[String], Option[String], Option[String])](
      ("c1", Some("x"), Some("fr"), None),
      ("c1", Some("x"), Some("en"), None),
      ("c1", Some("y"), None, None),
      ("c2", Some("z"), None, Some("note2")))
      .toDF("cl", "src", "lang", "note")
    val out = Merge.goldenRecords(df, "cl", Seq("src", "lang", "note"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.getString(4))))
      .toMap
    assert(out("c1") == ((3L, "x", "en", null)))
    assert(out("c2") == ((1L, "z", null, "note2")))
  }

  test("pivot/unpivot round-trip: melted metrics regroup to the original " +
      "wide row") {
    import spark.implicits._
    val wide = Seq((1L, 10L, 20L), (2L, 30L, 40L)).toDF("id", "m_a", "m_b")
    val long = wide.unpivot(Array(col("id")),
      Array(col("m_a"), col("m_b")), "metric", "v")
    assert(long.count() == 4)
    val back = long.groupBy("id").pivot("metric", Seq("m_a", "m_b"))
      .agg(first("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == Set((1L, 10L, 20L), (2L, 30L, 40L)))
  }

  test("randomizedResponse: mechanism matches a hand-computed coin per " +
      "row; debiased estimate tracks the true count") {
    import spark.implicits._
    import graft.ops.Privacy
    def coin(salt: String, id: Long, den: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % den
    }
    // exactness on a tiny frame: reported = bit iff coin < pNum
    val rows = (1L to 12L).map(i => (i, "g", (i % 3 == 0)))
    val out = Privacy.randomizedResponseCounts(
        rows.toDF("id", "k", "b"), Seq("k"), col("b").cast("long"),
        col("id"), 3L, 4L, "spec-salt")
      .collect().head
    val expectedOnes = rows.map { case (i, _, b) =>
      val tellsTruth = coin("spec-salt", i, 4L) < 3L
      val bit = if (b) 1L else 0L
      if (tellsTruth) bit else 1L - bit
    }.sum
    assert(out.getLong(1) == 12L && out.getLong(2) == expectedOnes)
    // debias: 2000 rows, true ones = 400; hash coins are deterministic
    // so the estimate is a fixed number — assert it lands near truth
    val big = (1L to 2000L).map(i => (i, "g", i <= 400))
    val est = Privacy.randomizedResponseCounts(
        big.toDF("id", "k", "b"), Seq("k"), col("b").cast("long"),
        col("id"), 3L, 4L, "spec-salt")
      .collect().head.getDouble(3)
    assert(math.abs(est - 400.0) < 100.0, s"est $est far from 400")
  }

  test("generalizeToK: picks the MINIMAL ladder level where every group " +
      "reaches k, and suppresses residual small groups at maxG") {
    import spark.implicits._
    import graft.ops.Privacy
    // hand ladder, base=10, k=2, values 5,15,17,25 in one category:
    //   g=0 (div 10): bands 0,1,1,2 -> group sizes 1,2,1 -> min 1 < k
    //   g=1 (div 20): bands 0,0,0,1 -> sizes 3,1        -> min 1 < k
    //   g=2 (div 40): bands 0,0,0,0 -> size 4           -> min 4 >= k
    // so the chosen level must be g=2 even though maxG=3 also qualifies.
    val a = Seq((1L, "a", 5L), (2L, "a", 15L), (3L, "a", 17L),
      (4L, "a", 25L)).toDF("id", "cat", "v")
    val out = Privacy.generalizeToK(a, "id", "cat", col("v"), k = 2L,
        base = 10L, maxG = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(out == (1L to 4L).map(i => (i, "a", 0L, 2L, 4L, false)).toSet)
    // add a lone row in category b: no level ever reaches k for it, so
    // the coalesce falls back to maxG=2 and ONLY b is suppressed
    // (b's band at g=2: 100 div 40 = 2).
    val withB = a.union(Seq((5L, "b", 100L)).toDF("id", "cat", "v"))
    val out2 = Privacy.generalizeToK(withB, "id", "cat", col("v"), k = 2L,
        base = 10L, maxG = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(out2 == (1L to 4L).map(i => (i, "a", 0L, 2L, 4L, false)).toSet
      + ((5L, "b", 2L, 2L, 1L, true)))
  }

  test("geometricNoisyCounts: noise replays an independent BigInt " +
      "inverse-CDF; bounded, salt-keyed, zero-clamped") {
    import spark.implicits._
    import graft.ops.Privacy
    // independent reimplementation of the draw: md5-60-bit uniform ->
    // u = h*T >> 60 -> first cumulative bucket
    def hash60(s: String): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      BigInt(hex, 16)
    }
    def expectedNoise(cell: String, aNum: Long, aDen: Long, kMax: Int): Int = {
      val w = (-kMax to kMax).map(k =>
        k -> (BigInt(aNum).pow(math.abs(k)) *
          BigInt(aDen).pow(kMax - math.abs(k))))
      val t = w.map(_._2).sum
      val u = (hash60(cell) * t) >> 60
      var acc = BigInt(0)
      w.find { case (_, wk) => acc += wk; u < acc }.get._1
    }
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L), ("c", 5L),
      ("c", 6L)).toDF("g", "x")
    val out = Privacy.geometricNoisyCounts(rows, Seq("g"), "spec-dp",
        aNum = 1L, aDen = 2L, maxShift = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((g, n) <- Seq("a" -> 2L, "b" -> 1L, "c" -> 3L)) {
      val want = expectedNoise(s"spec-dp|${g.length}:$g", 1L, 2L, 8).toLong
      assert(out(g)._1 == n)
      assert(out(g)._2 == want, s"cell $g noise")
      assert(out(g)._3 == n + want)
      assert(out(g)._4 == math.max(n + want, 0L))
      assert(math.abs(out(g)._2) <= 8)
    }
    // salt-keyed: a different salt must flip at least one cell's noise
    // over a wide cell population (alpha=1/2: P(all equal) ~ (1/3)^26)
    val many = (1L to 26L).map(i => (('a' + (i - 1)).toChar.toString, i))
      .toDF("g", "x")
    def noises(salt: String) = Privacy
      .geometricNoisyCounts(many, Seq("g"), salt, 1L, 2L, 8)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(noises("s1") != noises("s2"))
    // zero clamp: a count of 1 with strongly negative noise releases 0
    val clamp = Privacy.geometricNoisyCounts(
        (1L to 200L).map(i => (i.toString, i)).toDF("g", "x"),
        Seq("g"), "clamp", 1L, 2L, 8).collect()
    assert(clamp.forall(r => r.getLong(4) >= 0L))
    assert(clamp.exists(r => r.getLong(3) < 0L),
      "200 singleton cells should produce at least one negative draw")
    // delimiter safety: the length-prefixed cell encoding keeps
    // ("a:b","c") and ("a","b:c") distinct — without it both would
    // concat to the same string and draw CORRELATED noise
    val tricky = Seq(("a:b", "c", 1L), ("a", "b:c", 2L))
      .toDF("g1", "g2", "x")
    val tn = Privacy.geometricNoisyCounts(tricky, Seq("g1", "g2"),
        "delim", 1L, 2L, 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val w1 = expectedNoise("delim|3:a:b|1:c", 1L, 2L, 8).toLong
    val w2 = expectedNoise("delim|1:a|3:b:c", 1L, 2L, 8).toLong
    assert(tn(("a:b", "c")) == w1 && tn(("a", "b:c")) == w2)
    // NULL keys: concat null-propagates -> v is NULL -> every ladder
    // comparison is NULL -> the ELSE branch (+maxShift) on BOTH engines
    // (DuckDB's CASE treats NULL conditions as false identically)
    val withNull = Seq((Some("a"), 1L), (None, 2L), (None, 3L))
      .toDF("g", "x")
    val nn = Privacy.geometricNoisyCounts(withNull, Seq("g"), "nul",
        1L, 2L, 8)
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(nn(None) == ((2L, 8L)), "NULL cell takes the ELSE branch")
    assert(nn(Some("a"))._2 == expectedNoise("nul|1:a", 1L, 2L, 8).toLong)
  }

  test("tClosenessAudit: exact EMD against a hand-computed ledger; a " +
      "group mirroring the global mix scores zero") {
    import spark.implicits._
    import graft.ops.Profiling
    // global domain v in {0,1,2}: X uniform (2,2,2), Y all-v=2 skews
    // the global mix to (2,2,5) — both groups diverge from it.
    val x = Seq(0L, 0L, 1L, 1L, 2L, 2L).map(v => ("X", v))
    val y = Seq(2L, 2L, 2L).map(v => ("Y", v))
    val out = Integrity.tClosenessAudit(
        (x ++ y).toDF("g", "v"), Seq("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // N=9, m=3. X: cums (2,4,6) vs global (2,4,9)·(6/9):
    //   |2·9-2·6| + |4·9-4·6| + |6·9-9·6| = 6+12+0 = 18; den 6·9·2=108
    assert(out("X") == ((6L, 3L, 18L, 108L, 18.0 / 108.0)))
    // Y: cums (0,0,3) vs global: |0-2·3| + |0-4·3| + |3·9-9·3| = 18;
    //   den 3·9·2 = 54 -> t = 1/3... hand: 6+12+0=18, 18/54
    assert(out("Y") == ((3L, 3L, 18L, 54L, 18.0 / 54.0)))
    // mirrored-mix group at DIFFERENT size still scores 0
    val z = Seq(0L, 1L, 2L).map(v => ("Z", v))
    val out2 = Integrity.tClosenessAudit(
        (x ++ z).toDF("g", "v"), Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(out2("X") == 0.0 && out2("Z") == 0.0)
    // single-value sensitive domain: m = 1 -> emd_den = 0, t_emd is
    // guarded to 0.0 (not 0/0 = NaN) so a >= t gate reports the group
    val mono = Seq(("A", 7L), ("A", 7L), ("B", 7L))
    val out3 = Integrity.tClosenessAudit(
        mono.toDF("g", "v"), Seq("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getDouble(5))).toMap
    assert(out3("A") == ((1L, 0L, 0.0)) && out3("B") == ((1L, 0L, 0.0)))
  }

  test("geometricNoisySumMean: clamped contributions, quantize-then-" +
      "noise release (no mod-clampHi residue), floors respected") {
    import spark.implicits._
    import graft.ops.Privacy
    def hash60(s: String): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      BigInt(hex, 16)
    }
    def draw(cell: String, kMax: Int): Int = {
      val w = (-kMax to kMax).map(k =>
        k -> (BigInt(1).pow(math.abs(k)) *
          BigInt(2).pow(kMax - math.abs(k))))
      val t = w.map(_._2).sum
      val u = (hash60(cell) * t) >> 60
      var acc = BigInt(0)
      w.find { case (_, wk) => acc += wk; u < acc }.get._1
    }
    // raw values: -5 clamps to 0, 120 clamps to 100, 30 stays
    val rows = Seq(("a", -5L), ("a", 120L), ("a", 30L), ("b", 40L))
      .toDF("g", "x")
    val out = Privacy.geometricNoisySumMean(rows, Seq("g"), col("x"),
        clampHi = 100L, salt = "sm", maxShift = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7))).toMap
    val (na, sa) = (3L, 130L)
    val dnA = draw("sm#n|1:a", 8).toLong
    val dsA = draw("sm#s|1:a", 8).toLong
    assert(out("a")._1 == na && out("a")._2 == sa)
    assert(out("a")._3 == dnA && out("a")._4 == dsA * 100L)
    assert(out("a")._5 == math.max(na + dnA, 1L))
    // quantize-then-noise: floor(130/100)=1 unit, noised, re-scaled —
    // the release carries NO residue of the true sum mod clampHi
    assert(out("a")._6 == math.max(sa / 100L + dsA, 0L) * 100L)
    assert(out("a")._6 % 100L != sa % 100L,
      "the old scaled-noise form preserved the residue; this must not")
    assert(out("a")._7 == out("a")._6.toDouble / out("a")._5.toDouble)
    // the two draws use DISTINCT cells (different salt suffix)
    assert(draw("sm#n|1:b", 8) != draw("sm#s|1:b", 8) ||
      draw("sm#n|1:a", 8) != draw("sm#s|1:a", 8))
    // floors: over many singleton cells released_n never drops below 1
    val many = (1L to 200L).map(i => (i.toString, 50L)).toDF("g", "x")
    val rel = Privacy.geometricNoisySumMean(many, Seq("g"), col("x"),
      clampHi = 100L, salt = "fl", maxShift = 8).collect()
    assert(rel.forall(r => r.getLong(5) >= 1L && r.getLong(6) >= 0L))
    assert(rel.exists(r => r.getLong(1) + r.getLong(3) < 1L),
      "some cell should hit the count floor")
  }

  test("noisyTopK: k rows, dense ranks, ordering replays the noisy " +
      "scores with the cell-string tie-break") {
    import spark.implicits._
    import graft.ops.Privacy
    val rows = (1L to 100L).map { i =>
      (if (i <= 40) "a" else if (i <= 70) "b" else if (i <= 90) "c"
       else "d", i)
    }.toDF("g", "x")
    val out = Privacy.noisyTopK(rows, Seq("g"), k = 3, salt = "tk",
        maxShift = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 3 && out.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    // replay: rank by (count + noise) desc, cell-string asc
    val full = Privacy.geometricNoisyCounts(rows, Seq("g"), "tk",
        maxShift = 8)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    val expect = full.sortBy { case (g, noisy) => (-noisy, s"tk|1:$g") }
      .take(3).zipWithIndex
      .map { case ((g, noisy), i) => (g, noisy, i + 1L) }.toSeq
    assert(out.sortBy(_._3).toSeq == expect)
  }

  test("bitemporalJoin: asKnownAt selects the correction layer; reports " +
      "change retroactively and deterministically") {
    import spark.implicits._
    import graft.ops.AsOf
    // key 1: v0(bal 10 @ vf0,tx0), v1(bal 20 @ vf100,tx200),
    //        restatement of v1 (bal 21 @ vf100,tx400)
    val dim = Seq(
      (1L, 0L, 0L, 10L), (1L, 100L, 200L, 20L), (1L, 100L, 400L, 21L),
      (2L, 0L, 0L, 50L)).toDF("k", "valid_from", "tx_from", "bal")
    val facts = Seq((10L, 1L, 50L), (11L, 1L, 100L), (12L, 1L, 150L),
      (13L, 2L, 999L), (14L, 3L, 5L)).toDF("fid", "k", "ts")
    def run(t: Long) = AsOf.bitemporalJoin(facts, dim, Seq("k"), "ts",
        "valid_from", "tx_from", Seq("bal"), asKnownAt = t)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    // as known at 300: the tx-400 correction is invisible
    val early = run(300L)
    assert(early(10L) == (Some(10L), Some(0L), Some(0L)))
    assert(early(11L) == (Some(20L), Some(100L), Some(200L))) // vf == ts matches
    assert(early(12L) == (Some(20L), Some(100L), Some(200L)))
    assert(early(13L) == (Some(50L), Some(0L), Some(0L)))
    assert(early(14L) == ((None, None, None))) // unknown key: null payload
    // as known at 500: history changes retroactively for vf-100 facts
    val late = run(500L)
    assert(late(11L) == (Some(21L), Some(100L), Some(400L)))
    assert(late(12L) == (Some(21L), Some(100L), Some(400L)))
    assert(late(10L) == early(10L)) // pre-version facts unchanged
    // as known at 100: v1 itself not yet recorded -> everyone on v0
    val prior = run(100L)
    assert(prior(12L) == (Some(10L), Some(0L), Some(0L)))
  }
}
