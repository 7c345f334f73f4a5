package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.{StateSinks, Streams}

/** End-to-end streaming coverage (S1-S4, S6, streaming O3/X3, F6) using
  * MemoryStream as the source stand-in (SURVEY §2.1 S1: no Kafka in the
  * harness — the operators consume a generic streaming DataFrame carrying
  * the same JSON envelopes the reference reads from its topic).
  */
class StreamsSpec extends SparkSuite {

  /** One wire envelope as the reference producer emits it
    * (`/root/reference/producer/producer.py:215`). */
  private def envJson(account: String, name: String,
      matches: Seq[(String, Int, Double, String)]): String = {
    val ms = matches.map { case (mid, kills, damage, createdAt) =>
      s"""{"match_id":"$mid","game_mode":"squad","map_name":"erangel","duration":1800,""" +
        s""""is_custom_match":false,"created_at":"$createdAt","player_performance":{""" +
        s""""kills":$kills,"assists":1,"headshot_kills":1,"longest_kill":100.0,""" +
        s""""damage_dealt":$damage,"time_survived":1200.0,"death_type":"byplayer",""" +
        s""""win_place":5,"walk_distance":1000.0,"weapons_acquired":3,"participant_name":"$name"}}"""
    }.mkString("[", ",", "]")
    s"""{"player":{"player_name":"$name","account_id":"$account","shard_id":"steam",""" +
      s""""total_matches_count":${matches.size},"match_ids":[],""" +
      s""""data_collected_at":"2024-01-01 00:00:00"},"matches":$ms}"""
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("S1+S2+O3/X3: envelope stream -> flatten -> watermarked dedup -> parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    val out = tmp("etl-out")
    val ckp = tmp("etl-ckp")

    val flat = Streams.dedupWithinWatermark(
      Streams.etlFlatten(mem.toDF()),
      Seq("match_id", "account_id"), "event_time", "10 minutes")

    // m1 arrives twice in the batch (producer re-poll) -> must land once
    mem.addData(
      envJson("a1", "alice", Seq(
        ("m1", 3, 250.0, "2024-01-01 10:00:00"),
        ("m2", 1, 100.0, "2024-01-01 10:05:00"))),
      envJson("a1", "alice", Seq(
        ("m1", 3, 250.0, "2024-01-01 10:00:00"))),
      envJson("b2", "bob", Seq(
        ("m1", 0, 50.0, "2024-01-01 10:01:00"))))

    val q = Streams.parquetSink(flat, out, ckp, Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val landed = spark.read.parquet(out)
    assert(landed.count() == 3) // (m1,a1) deduped; (m1,b2) is a distinct key
    assert(landed.filter(col("match_id") === "m1").count() == 2)
    // event time came from the envelope, not the processing clock
    assert(landed.filter(col("account_id") === "a1" && col("match_id") === "m1")
      .select(date_format(col("event_time"), "yyyy-MM-dd HH:mm:ss"))
      .head.getString(0) == "2024-01-01 10:00:00")
  }

  test("S4+F6: foreachBatch analytics pipeline emits the four sub-queries per epoch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    // alice: 5 quiet matches then a spike (trend + anomaly); bob: 3 quiet
    val quiet = (1 to 5).map(i => (s"a$i", 1, 100.0, f"2024-01-01 10:0$i%d:00"))
    val spike = Seq(("a6", 20, 10000.0, "2024-01-01 10:06:00"))
    val bobMs = (1 to 3).map(i => (s"b$i", 1, 100.0, f"2024-01-01 11:0$i%d:00"))
    mem.addData(
      envJson("a1", "alice", quiet ++ spike),
      envJson("b2", "bob", bobMs))

    val got = scala.collection.mutable.Map[String, Array[Row]]()
    val q = Streams.analyticsPipeline(
      Streams.etlFlatten(mem.toDF()), tmp("fb-ckp"), Trigger.AvailableNow()) {
      (name: String, df: DataFrame, _: Long) => got.synchronized { got(name) = df.collect() }
    }
    q.awaitTermination(120000)

    assert(got.keySet == Set("ranking", "trends", "anomalies", "aggregates"))
    // ranking: both players scored, spike player on top
    val ranking = got("ranking")
    assert(ranking.length == 2)
    assert(ranking.map(_.getAs[String]("player_name")).toSet == Set("alice", "bob"))
    // trends: only the warm (seq>=5) spike row passes the threshold gate
    val trends = got("trends")
    assert(trends.map(r => (r.getAs[String]("player_name"), r.getAs[String]("match_id"))).toSet
      == Set(("alice", "a6")))
    // anomalies: the 10000-damage outlier is the lone |z|>2.5 row
    assert(got("anomalies").map(_.getAs[String]("match_id")).toSet == Set("a6"))
    // aggregates: two (hour, mode, map) buckets, 9 rows total
    assert(got("aggregates").map(_.getAs[Long]("total_events")).sum == 9)
  }

  test("F6: empty micro-batch short-circuits the pipeline (no sink calls)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String] // no data added
    var calls = 0
    val q = Streams.analyticsPipeline(
      Streams.etlFlatten(mem.toDF()), tmp("fb-empty-ckp"), Trigger.AvailableNow()) {
      (_: String, _: DataFrame, _: Long) => calls += 1
    }
    q.awaitTermination(120000)
    assert(calls == 0)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")

  test("event-time window agg emits finalized windows as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.KeyedEvent]
    val wc = Streams.windowedCounts(mem.toDF(), "ts", "0 seconds", "1 hour", Seq("key"))
    val q = wc.writeStream.format("memory").queryName("wc_out")
      .outputMode("append").start()
    mem.addData(
      Streams.KeyedEvent("a", "p", ts("10:00:00")),
      Streams.KeyedEvent("a", "p", ts("10:30:00")),
      Streams.KeyedEvent("b", "p", ts("10:15:00")))
    q.processAllAvailable()
    assert(spark.table("wc_out").count() == 0) // 10:00 window still open
    mem.addData(Streams.KeyedEvent("a", "p", ts("12:00:00")))
    q.processAllAvailable()
    val closed = spark.table("wc_out")
      .select(col("key"), col("n_events")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(closed == Map("a" -> 2L, "b" -> 1L)) // exactly the finalized hour
    q.stop()
  }

  test("stream-stream interval join matches within the window, ages out state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lm = MemoryStream[Streams.KeyedEvent]
    val rm = MemoryStream[Streams.KeyedEvent]
    val joined = Streams.intervalJoin(lm.toDF(), rm.toDF(), "key", "ts",
      delay = "0 seconds", before = "5 minutes", after = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    lm.addData(
      Streams.KeyedEvent("k1", "left-a", ts("10:00:00")),
      Streams.KeyedEvent("k1", "left-b", ts("11:00:00")))
    rm.addData(
      Streams.KeyedEvent("k1", "right-near", ts("10:03:00")), // within ±5m of left-a
      Streams.KeyedEvent("k1", "right-far", ts("10:30:00")),  // matches neither
      Streams.KeyedEvent("k2", "right-otherkey", ts("10:00:00")))
    q.processAllAvailable()
    val got = spark.table("ij_out")
      .select("payload", "payload_r").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("left-a", "right-near")))
    q.stop()
  }

  test("left-outer interval join emits unmatched rows once the watermark proves no partner") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lm = MemoryStream[Streams.KeyedEvent]
    val rm = MemoryStream[Streams.KeyedEvent]
    val joined = Streams.intervalJoinLeftOuter(lm.toDF(), rm.toDF(), "key", "ts",
      delay = "0 seconds", before = "5 minutes", after = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("loj_out")
      .outputMode("append").start()
    lm.addData(
      Streams.KeyedEvent("k1", "matched", ts("10:00:00")),
      Streams.KeyedEvent("k1", "lonely", ts("10:20:00")))
    rm.addData(Streams.KeyedEvent("k1", "partner", ts("10:02:00")))
    q.processAllAvailable()
    // advance both watermarks far past the lonely row's join window
    lm.addData(Streams.KeyedEvent("k9", "tick", ts("12:00:00")))
    rm.addData(Streams.KeyedEvent("k9", "tick", ts("12:00:00")))
    q.processAllAvailable()
    val got = spark.table("loj_out")
      .filter(col("key") === "k1")
      .select("payload", "payload_r").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(got == Set(("matched", Some("partner")), ("lonely", None)))
    q.stop()
  }

  test("session windows close after the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.KeyedEvent]
    val sc = Streams.sessionCounts(mem.toDF(), "ts", "0 seconds", "10 minutes", Seq("key"))
    val q = sc.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    mem.addData(
      Streams.KeyedEvent("a", "p", ts("10:00:00")),
      Streams.KeyedEvent("a", "p", ts("10:05:00")), // same session (gap < 10m)
      Streams.KeyedEvent("a", "p", ts("10:30:00"))) // new session
    q.processAllAvailable()
    mem.addData(Streams.KeyedEvent("b", "p", ts("12:00:00"))) // advance watermark
    q.processAllAvailable()
    val sessions = spark.table("sess_out")
      .filter(col("key") === "a").select("n_events").as[Long].collect().sorted.toSeq
    assert(sessions == Seq(1L, 2L)) // the 10:00-10:05 pair and the lone 10:30
    q.stop()
  }

  test("flatMapGroupsWithState TTL dedup: emit, suppress within TTL, re-emit after") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.KeyedEvent]
    val out = Streams.ttlDedupWithState(mem.toDS(), "0 seconds", ttlMs = 10 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("ttl_out")
      .outputMode("append").start()
    mem.addData(
      Streams.KeyedEvent("k1", "first", ts("10:00:00")),
      Streams.KeyedEvent("k1", "dup", ts("10:00:30")))
    q.processAllAvailable()
    mem.addData(Streams.KeyedEvent("k2", "other", ts("10:20:00")))
    q.processAllAvailable()
    mem.addData(Streams.KeyedEvent("k1", "again", ts("10:25:00"))) // past k1's 10:10 deadline
    q.processAllAvailable()
    val got = spark.table("ttl_out").select("payload").as[String].collect().toSet
    assert(got == Set("first", "other", "again")) // "dup" suppressed
    q.stop()
  }

  test("cusumAlarmsStream: drift crossing fires once, survives micro-batch boundaries, flat keys stay silent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.MetricEvent]
    // target 100, slack 0, threshold 120: sustained +50 drift crosses at
    // the third drifted point (S = 150) — which arrives in the SECOND
    // micro-batch, so the crossing only fires if S persists in state
    val out = Streams.cusumAlarmsStream(mem.toDS(), "0 seconds",
      target = 100L, slack = 0L, threshold = 120L)
    val q = out.writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    mem.addData(
      Streams.MetricEvent("drift", 100L, ts("10:00:00")),
      Streams.MetricEvent("drift", 150L, ts("10:00:10")),
      Streams.MetricEvent("drift", 150L, ts("10:00:20")), // S=100
      Streams.MetricEvent("flat", 100L, ts("10:00:00")),
      Streams.MetricEvent("flat", 100L, ts("10:00:20")))
    q.processAllAvailable()
    assert(spark.table("cusum_out").isEmpty) // S=100 <= 120: not yet
    mem.addData(
      Streams.MetricEvent("drift", 150L, ts("10:00:30")), // S=150: crossing
      Streams.MetricEvent("drift", 150L, ts("10:00:40")), // S=200: no re-fire
      Streams.MetricEvent("flat", 100L, ts("10:00:40")))
    q.processAllAvailable()
    val got = spark.table("cusum_out").as[Streams.CusumAlarm].collect()
    assert(got.toSeq == Seq(
      Streams.CusumAlarm("drift", 150L, ts("10:00:30"))))
    q.stop()
  }

  test("holtForecastStream: the live fold reproduces the batch " +
      "holtLinear numbers across a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.MetricEvent]
    val out = Streams.holtForecastStream(mem.toDS(), "0 seconds")
    val q = out.writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    // the batch spec's series 100,200,300,400 split across TWO
    // micro-batches: state must persist for the numbers to match
    mem.addData(
      Streams.MetricEvent("a", 100L, ts("10:00:00")),
      Streams.MetricEvent("a", 200L, ts("10:00:10")))
    q.processAllAvailable()
    mem.addData(
      Streams.MetricEvent("a", 300L, ts("10:00:20")),
      Streams.MetricEvent("a", 400L, ts("10:00:30")))
    q.processAllAvailable()
    val last = spark.table("holt_out").as[Streams.HoltPoint].collect()
      .maxBy(_.ts.getTime)
    // identical to OpsSpec's batch holtLinear hand-derivation
    assert(last.level == 330L && last.trend == 46L &&
      last.forecast == 376L)
    q.stop()
  }

  test("rollingMedianStream: trailing lower medians match the batch " +
      "window recomputation across a micro-batch boundary, spikes " +
      "leave the median untouched") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.MetricEvent]
    val out = Streams.rollingMedianStream(mem.toDS(), "0 seconds",
      window = 3)
    val q = out.writeStream.format("memory").queryName("med_out")
      .outputMode("append").start()
    val vs = Seq(10L, 20L, 1000L, 30L, 40L)
    mem.addData(vs.take(2).zipWithIndex.map { case (v, i) =>
      Streams.MetricEvent("k", v, ts(f"10:00:0$i")) }: _*)
    q.processAllAvailable()
    mem.addData(vs.drop(2).zipWithIndex.map { case (v, i) =>
      Streams.MetricEvent("k", v, ts(f"10:00:0${i + 2}")) }: _*)
    q.processAllAvailable()
    val got = spark.table("med_out").as[Streams.MedianPoint].collect()
      .sortBy(_.ts.getTime).map(_.med).toSeq
    // trailing window-3 lower medians of 10,20,1000,30,40 — the batch
    // recomputation: [10], [10,20]→10, [10,20,1000]→20,
    // [20,1000,30]→30, [1000,30,40]→40; the 1000 spike never surfaces
    assert(got == Seq(10L, 10L, 20L, 30L, 40L))
    q.stop()
  }

  test("ewmaAlarmsStream: spike against a settled baseline fires, " +
      "warm-up stays silent, baseline follows level cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.MetricEvent]
    // alpha = 1/4, band k² = 16 (±4σ), warmup 5
    val out = Streams.ewmaAlarmsStream(mem.toDS(), "0 seconds",
      alphaShift = 2, kSquared = 16L, warmup = 5)
    val q = out.writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    // batch 1: settle at 100 ± 2 (6 events, past warmup) — no alarms
    val base = Seq(100L, 102L, 98L, 100L, 102L, 98L, 100L)
    mem.addData(base.zipWithIndex.map { case (v, i) =>
      Streams.MetricEvent("k", v, ts(f"10:00:${i}%02d")) }: _*)
    q.processAllAvailable()
    assert(spark.table("ewma_out").isEmpty)
    // batch 2: a 10x spike — fires only if the settled baseline and
    // variance survived the micro-batch boundary in state
    mem.addData(Streams.MetricEvent("k", 1000L, ts("10:00:30")))
    q.processAllAvailable()
    val got = spark.table("ewma_out").as[Streams.EwmaAlarm].collect()
    assert(got.length == 1 && got.head.v == 1000L)
    assert(math.abs(got.head.ewma - 100L) <= 2,
      s"baseline should sit at the settled level: ${got.head.ewma}")
    q.stop()
  }

  test("qualityGate splits a stream into pass and replayable quarantine") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Double)]
    val df = mem.toDF().toDF("id", "kind", "v")
    val (good, bad) = Streams.qualityGate(df, Seq(
      "v_non_negative" -> (col("v") >= 0),
      "kind_in_domain" -> col("kind").isin("a", "b")))
    val q1 = good.writeStream.format("memory").queryName("qg_good")
      .outputMode("append").start()
    val q2 = bad.writeStream.format("memory").queryName("qg_bad")
      .outputMode("append").start()
    mem.addData((1L, "a", 1.0), (2L, "z", 2.0), (3L, "a", -5.0), (4L, "z", -1.0))
    q1.processAllAvailable(); q2.processAllAvailable()
    assert(spark.table("qg_good").select("id").as[Long].collect().toSet == Set(1L))
    val bads = spark.table("qg_bad")
      .select(col("id"), col("failed_checks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(bads == Map(
      2L -> Set("kind_in_domain"),
      3L -> Set("v_non_negative"),
      4L -> Set("v_non_negative", "kind_in_domain")))
    q1.stop(); q2.stop()
  }

  test("incremental rollup sink: folded state equals the full recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long)]
    val ev = mem.toDF().toDF("key", "cents")
    val (stateDir, ckp) = (tmp("roll-state"), tmp("roll-ckp"))

    def run(): Unit = {
      val q = StateSinks.incrementalRollupSink(ev, Seq("key"), "cents",
        stateDir, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData(("a", 10L), ("a", 30L), ("b", 5L))
    run()
    mem.addData(("a", 20L), ("b", 100L), ("c", 7L))
    run()
    val state = StateSinks.latestRollupState(spark, stateDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // identical to rollupState over the concatenation of both batches
    assert(state == Map(
      "a" -> ((3L, 60L, 10L, 30L)),
      "b" -> ((2L, 105L, 5L, 100L)),
      "c" -> ((1L, 7L, 7L, 7L))))
    // storage bounded: at most the current + previous snapshot survive
    val epochs = new java.io.File(stateDir).listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName).sorted
    assert(epochs.length <= 2, epochs.mkString(", "))
  }

  test("shardLayoutSink: positions append contiguously per shard " +
      "across epochs; earlier epochs' rows never move") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (layoutDir, stateDir, ckp) =
      (tmp("lay-out"), tmp("lay-state"), tmp("lay-ckp"))
    def run(): Unit = {
      val q = StateSinks.shardLayoutSink(docs, "doc_id", "text",
        nShards = 4, salt = "lay", layoutDir, stateDir, ckp,
        Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData((1L to 20L).map(i => (i, s"doc $i words here")): _*)
    run()
    val afterE1 = StateSinks.readLayout(spark, layoutDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    mem.addData((21L to 50L).map(i => (i, s"doc $i words here")): _*)
    run()
    val all = StateSinks.readLayout(spark, layoutDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc exactly once
    assert(all.length == 50 && all.map(_._1).distinct.length == 50)
    // per-shard positions are exactly 1..size
    for ((shard, rows) <- all.groupBy(_._2)) {
      val ps = rows.map(_._3).sorted
      assert(ps.toSeq == (1L to ps.length).toSeq, s"shard $shard: $ps")
    }
    // epoch-1 assignments are immutable
    val byId = all.map(r => r._1 -> (r._2, r._3)).toMap
    for ((id, sp) <- afterE1) assert(byId(id) == sp, s"doc $id moved")
  }

  test("curriculumShardLayoutSink: staged (bucket, hash, id) order holds " +
      "inside every epoch slice; shards stay contiguous; epoch-1 immutable") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (layoutDir, stateDir, ckp) =
      (tmp("cur-out"), tmp("cur-state"), tmp("cur-ckp"))
    // curriculum stage: short docs first (bucket = token count div 3)
    val bucket = (size(graft.text.TextAnalysis.tokens(col("text")))
      .cast("long") / 3L).cast("long")
    def run(): Unit = {
      val q = StateSinks.curriculumShardLayoutSink(docs, "doc_id", "text",
        bucket, nShards = 3, salt = "cur", layoutDir, stateDir, ckp,
        Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    def doc(i: Long) = (i, ("word " * (1 + (i % 7)).toInt).trim)
    mem.addData((1L to 20L).map(doc): _*); run()
    val afterE1 = StateSinks.readLayout(spark, layoutDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    mem.addData((21L to 45L).map(doc): _*); run()
    // read back per-slice: layoutDir/epoch=N are separate overwrite dirs
    val slices = new java.io.File(layoutDir).listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName).sorted
    assert(slices.length == 2)
    // staged order inside every (epoch, shard) slice: pos order ==
    // (bucket asc, hash asc, id asc) order
    for (sl <- slices) {
      val rows = spark.read.parquet(s"$layoutDir/$sl")
        .withColumn("__h", graft.functions.Hash64.hash60(
          concat(lit("cur"), lit("_"), col("doc_id").cast("string"))))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Long]("__h"), r.getLong(0)))
      for ((_, g) <- rows.groupBy(_._1)) {
        val byPos = g.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq
        assert(byPos == byPos.sorted, s"slice $sl not staged: $byPos")
      }
    }
    // global per-shard contiguity + immutability (the shardLayoutSink
    // contract, unchanged by the extra sort key)
    val flat = StateSinks.readLayout(spark, layoutDir)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flat.length == 45 && flat.map(_._1).distinct.length == 45)
    for ((shard, rows) <- flat.groupBy(_._2)) {
      val ps = rows.map(_._3).sorted
      assert(ps.toSeq == (1L to ps.length).toSeq, s"shard $shard: $ps")
    }
    val byId = flat.map(r => r._1 -> (r._2, r._3)).toMap
    for ((id, sp) <- afterE1) assert(byId(id) == sp, s"doc $id moved")
  }

  test("heavyHittersSink: merged-sketch estimates equal the batch " +
      "heavy hitters over every epoch's rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val ev = mem.toDF().toDF("rid", "k")
    val (stateDir, ckp) = (tmp("hh-state"), tmp("hh-ckp"))
    def run(): Unit = {
      val q = StateSinks.heavyHittersSink(ev, "k", stateDir, ckp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    // epoch 1: hot1 x 60, tail x 40; epoch 2: hot2 x 50, hot1 x 20,
    // plus a hot REAL key literally named "__sketch" x 60 — the state
    // discriminates by is_sketch, so the name can never collide with
    // the serialized-sketch row
    val e1 = (1L to 60L).map(i => (i, "hot1")) ++
      (61L to 100L).map(i => (i, s"tail$i"))
    val e2 = (101L to 150L).map(i => (i, "hot2")) ++
      (151L to 170L).map(i => (i, "hot1")) ++
      (171L to 230L).map(i => (i, "__sketch"))
    mem.addData(e1: _*); run()
    mem.addData(e2: _*); run()
    val streamed = StateSinks.latestHeavyHitters(spark, stateDir,
        minFrac = 0.2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.ops.Sketches.heavyHitters(
        (e1 ++ e2).toDF("rid", "k"), col("k"), minFrac = 0.2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.keySet == Set("hot1", "hot2", "__sketch"))
    assert(streamed("hot1") >= 80L && streamed("__sketch") >= 60L)
  }

  test("lateDataAuditSink: rows behind the prior epochs' high-water " +
      "mark are counted, never silently lost") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[java.sql.Timestamp]
    val ev = mem.toDF().toDF("ts")
    val (auditDir, stateDir, ckp) =
      (tmp("late-audit"), tmp("late-state"), tmp("late-ckp"))
    def run(): Unit = {
      val q = StateSinks.lateDataAuditSink(ev, "ts", delaySeconds = 10L,
        auditDir, stateDir, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // epoch 1: no mark yet -> nothing late, mark becomes 1000s
    mem.addData(ts(900), ts(1000)); run()
    // epoch 2: mark 1000s, tolerance 10s -> 985 late, 995 and 1100 not
    mem.addData(ts(985), ts(995), ts(1100)); run()
    val audits = StateSinks.readLateAudits(spark, auditDir)
      .select("epoch", "n_rows", "n_late", "mark_us")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(audits.size == 2)
    val byOrder = audits.toSeq.sortBy(_._1).map(_._2)
    assert(byOrder(0) == ((2L, 0L, -1L)), "first epoch: no mark")
    assert(byOrder(1) == ((3L, 1L, 1000L * 1000000L)),
      s"epoch 2 should flag exactly ts=985: ${byOrder(1)}")
  }

  test("dpReleaseFromState: DP release over the epoch-merged state " +
      "equals the batch release over every epoch's rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long)]
    val ev = mem.toDF().toDF("key", "cents")
    val (stateDir, ckp) = (tmp("dp-state"), tmp("dp-ckp"))
    def run(): Unit = {
      val q = StateSinks.incrementalRollupSink(ev, Seq("key"), "cents",
        stateDir, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    val e1 = Seq(("a", 10L), ("a", 30L), ("b", 5L))
    val e2 = Seq(("a", 20L), ("b", 100L), ("c", 7L), ("c", 9L))
    mem.addData(e1: _*); run()
    mem.addData(e2: _*); run()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val streamed = rows(StateSinks.dpReleaseFromState(spark, stateDir,
      Seq("key"), salt = "dp-stream", maxShift = 8))
    val batch = rows(graft.ops.Privacy.geometricNoisyCounts(
      (e1 ++ e2).toDF("key", "cents"), Seq("key"), salt = "dp-stream",
      maxShift = 8))
    assert(streamed == batch)
    assert(streamed("a")._1 == 3L && streamed("c")._1 == 2L)
  }

  test("streaming log-bucket quantiles: two-epoch merged sketch answers " +
      "exactly as the batch sketch on the union") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Long]
    val ev = mem.toDF().toDF("v")
    val (stateDir, ckp) = (tmp("lbq-state"), tmp("lbq-ckp"))
    val ps = Seq((1, 2), (9, 10), (99, 100))

    def run(): Unit = {
      val q = StateSinks.logBucketQuantileSink(ev, "v", j = 6,
        stateDir, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    val batch1 = (1L to 400L).map(i => i * 7L % 1000L)
    val batch2 = (1L to 300L).map(i => i * i % 5000L)
    mem.addData(batch1: _*)
    run()
    mem.addData(batch2: _*)
    run()
    val streamed = StateSinks.latestLogBucketQuantiles(spark, stateDir, ps, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = graft.ops.Quantiles.logBucketQuantiles(
        (batch1 ++ batch2).toDF("v"), col("v"), ps, j = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(streamed == batch && streamed.size == 3)
    // storage bounded: at most the current + previous snapshot survive
    val epochs = new java.io.File(stateDir).listFiles()
      .filter(_.getName.startsWith("epoch=")).map(_.getName)
    assert(epochs.length <= 2, epochs.mkString(", "))
  }

  test("streaming HLL rollup: epoch-merged sketches read the exact " +
      "distinct count (sparse-exact regime) and match the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long)]
    val ev = mem.toDF().toDF("key", "v")
    val (stateDir, ckp) = (tmp("hll-state"), tmp("hll-ckp"))
    def run(): Unit = {
      val q = StateSinks.hllRollupSink(ev, Seq("key"), "v", stateDir, ckp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    // distinct sets small enough that the HLL stays in its exact
    // (coupon) regime: a 17 and b 9 distincts, overlapping epochs
    mem.addData((1L to 12L).map(i => ("a", i)) ++
      (1L to 6L).map(i => ("b", i * 2)): _*)
    run()
    mem.addData((8L to 17L).map(i => ("a", i)) ++
      (4L to 9L).map(i => ("b", i * 2)): _*)
    run()
    val state = StateSinks.latestHllEstimates(spark, stateDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(state == Map("a" -> ((22L, 17L)), "b" -> ((12L, 9L))))
    // batch parity: one-shot hllRollup over the union reads the same
    val batch = graft.ops.Sketches.hllReRollup(
        graft.ops.Sketches.hllRollup(
          ((1L to 12L).map(i => ("a", i)) ++ (1L to 6L).map(i => ("b", i * 2))
            ++ (8L to 17L).map(i => ("a", i)) ++ (4L to 9L).map(i => ("b", i * 2)))
            .toDF("key", "v"), Seq(col("key")), col("v")),
        Seq(col("key")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(batch == Map("a" -> 17L, "b" -> 9L))
  }

  test("incremental corpus dedup: batch two drops fingerprints that landed in batch one") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (hist, out, mark, ckp) =
      (tmp("inc-hist"), tmp("inc-out"), tmp("inc-mark"), tmp("inc-ckp"))
    // fresh dirs must not pre-exist for parquet append to create them
    Seq(hist, out).foreach(d => Files.delete(java.nio.file.Paths.get(d)))

    def run(): Unit = {
      val q = Streams.incrementalCorpusSink(docs, "doc_id", "text",
        hist, out, mark, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    // batch 1: d2 duplicates d1's normalized text (whitespace/case only)
    // intra-batch — lowest id survives
    mem.addData((1L, "the quick brown fox"), (2L, "  The  QUICK brown fox "),
      (3L, "something else"))
    run()
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))

    // batch 2: d4 re-sends d3's text (cross-batch dup against history),
    // d5 is genuinely new
    mem.addData((4L, "SOMETHING   else"), (5L, "entirely new document"))
    run()
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 5L))
    // history carries exactly the surviving fingerprints
    assert(spark.read.parquet(hist).distinct().count() == 3)
  }

  test("incremental near-dup: signature history drops token-identical re-sends across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (hist, out, mark, ckp) =
      (tmp("nd-hist"), tmp("nd-out"), tmp("nd-mark"), tmp("nd-ckp"))
    Seq(hist, out).foreach(d => Files.delete(java.nio.file.Paths.get(d)))

    def run(): Unit = {
      val q = Streams.incrementalNearDupSink(docs, "doc_id", "text",
        hist, out, mark, ckp, trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    // batch 1: d2 is a case/whitespace variant of d1 (identical token
    // sequence -> identical signatures, agreement 1.0); d3 distinct
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "  The  QUICK brown fox jumps over the lazy dog AGAIN "),
      (3L, "completely different content about spark query engines"))
    run()
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L))

    // batch 2: d4 re-sends d3's token stream (cross-batch near-dup via
    // the signature history, md5 fingerprints would differ); d5 fresh;
    // d6/d7 token-free — they must BOTH pass through (no signature, no
    // near-dup verdict), not near-dup each other via the empty shingle
    mem.addData(
      (4L, "Completely DIFFERENT content about spark query engines!"),
      (5L, "entirely new document with its own words"),
      (6L, ""), (7L, "   "))
    run()
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 5L, 6L, 7L))
    // history carries signatures for exactly the SIGNED survivors —
    // token-free docs never enter it
    assert(spark.read.parquet(hist).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 5L))
  }

  test("streaming exact-substring dedup: cross-epoch verbatim spans " +
      "excised keep-first, exact batch parity on the union") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (hist, out, mark, ckp) =
      (tmp("es-hist"), tmp("es-out"), tmp("es-mark"), tmp("es-ckp"))
    Seq(hist, out).foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    val L = 12
    def run(): Unit = {
      val q = Streams.exactSubstrDedupSink(docs, "doc_id", "text",
        hist, out, mark, ckp, minLen = L, trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    val b1 = Seq(
      (1L, "the original shared passage lives right here in doc one"),
      (2L, "totally unrelated content without any overlap at all"))
    val b2 = Seq(
      // re-uses a >= 12-char span of doc 1 (cross-epoch), plus fresh text
      (3L, "prefix text then the original shared passage lives right here too"),
      // duplicates doc 3's fresh suffix? no — unrelated
      (4L, "another clean document with its own words only"))
    mem.addData(b1: _*); run()
    mem.addData(b2: _*); run()
    val streamed = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // batch parity: removeLaterCopies over the union (epoch order =
    // id order here)
    val expect = graft.text.ExactSubstr
      .removeLaterCopies((b1 ++ b2).toDF("doc_id", "text"),
        "doc_id", "text", L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(streamed == expect)
    assert(streamed(1L)._2 == 0L)            // first copy intact
    assert(streamed(3L)._2 > 0L)             // later copy excised
    assert(streamed(2L)._2 == 0L && streamed(4L)._2 == 0L)
    // replay idempotence: re-running the same epochs adds nothing
    run()
    assert(spark.read.parquet(out).count() == 4)
  }

  test("transformWithState TTL dedup matches the flatMapGroupsWithState semantics") {
    // Spark 4's arbitrary-state API; requires the RocksDB state store.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Streams.KeyedEvent]
      val out = Streams.ttlDedupTws(mem.toDS(), "0 seconds", ttlMs = 10 * 60 * 1000)
      val q = out.writeStream.format("memory").queryName("tws_out")
        .outputMode("append").start()
      mem.addData(
        Streams.KeyedEvent("k1", "first", ts("10:00:00")),
        Streams.KeyedEvent("k1", "dup", ts("10:00:30")))
      q.processAllAvailable()
      mem.addData(Streams.KeyedEvent("k2", "other", ts("10:20:00")))
      q.processAllAvailable()
      mem.addData(Streams.KeyedEvent("k1", "again", ts("10:25:00"))) // past 10:10 deadline
      q.processAllAvailable()
      val got = spark.table("tws_out").select("payload").as[String].collect().toSet
      assert(got == Set("first", "other", "again")) // "dup" suppressed
      q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("idempotentSink runs each (name, epoch) once across replays") {
    var calls = List.empty[(String, Long)]
    val wrapped = Streams.idempotentSink(tmp("idem-markers")) {
      (name, _, epoch) => calls = (name, epoch) :: calls
    }
    val df = spark.range(1).toDF()
    wrapped("ranking", df, 0L)
    wrapped("ranking", df, 0L) // epoch replay → skipped
    wrapped("ranking", df, 1L) // new epoch → runs
    wrapped("trends", df, 0L)  // different sub-query, same epoch → runs
    assert(calls.reverse == List(("ranking", 0L), ("ranking", 1L), ("trends", 0L)))
  }

  test("parquet sink schema evolution: widened schema resumes the same checkpoint") {
    import org.apache.spark.sql.types._
    val src = tmp("evo-src"); val out = tmp("evo-out"); val ckp = tmp("evo-ckp")
    val s1 = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    Files.write(java.nio.file.Paths.get(src, "f1.json"), """{"a":1,"b":"x"}""".getBytes)
    val q1 = Streams.parquetSink(spark.readStream.schema(s1).json(src),
      out, ckp, Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)

    // the job-upgrade path the sink documents: stop, redeploy with a new
    // column, resume the SAME checkpoint into the same directory
    val s2 = s1.add(StructField("c", DoubleType))
    Files.write(java.nio.file.Paths.get(src, "f2.json"), """{"a":2,"b":"y","c":3.5}""".getBytes)
    val q2 = Streams.parquetSink(spark.readStream.schema(s2).json(src),
      out, ckp, Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)

    val merged = Streams.readEvolved(spark, out)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "c"))
    val rows = merged.orderBy("a").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("c"))) // pre-evolution file: null
    assert(rows(1).getDouble(rows(1).fieldIndex("c")) == 3.5)
  }

  test("idempotentSink: failed epoch re-runs on replay, committed epoch skips") {
    var calls = 0
    val dir = tmp("idem-crash")
    val wrapped = Streams.idempotentSink(dir) { (_, _, _) =>
      calls += 1
      if (calls == 1) throw new RuntimeException("sink died mid-epoch")
    }
    val df = spark.range(1).toDF()
    intercept[RuntimeException] { wrapped("x", df, 0L) }
    wrapped("x", df, 0L) // no marker landed → at-least-once replay re-runs
    wrapped("x", df, 0L) // marker present → skipped
    assert(calls == 2)
    // the atomic rename leaves only completed markers, never partials
    val names = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator()
    val files = Iterator.continually(names).takeWhile(_.hasNext).map(_.next().getFileName.toString).toList
    assert(files == List("x-0.done"))
  }

  test("watermarked dedup runs on the RocksDB state store (the at-scale state backend)") {
    // The default HDFSBackedStateStore keeps every key's state on-heap —
    // fine for tests, an OOM at 100 TB/day key cardinality. RocksDB spills
    // to local disk with incremental checkpointing; the operator code is
    // unchanged, only session config selects it.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[String]
      val out = tmp("rocks-out"); val ckp = tmp("rocks-ckp")
      mem.addData(
        envJson("a1", "alice", Seq(("m1", 3, 250.0, "2024-01-01 10:00:00"))),
        envJson("a1", "alice", Seq(("m1", 3, 250.0, "2024-01-01 10:00:00"))))
      val flat = Streams.dedupWithinWatermark(
        Streams.etlFlatten(mem.toDF()),
        Seq("match_id", "account_id"), "event_time", "10 minutes")
      val q = Streams.parquetSink(flat, out, ckp, Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(q.exception.isEmpty, q.exception)
      assert(spark.read.parquet(out).count() == 1) // deduped through RocksDB state
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-static enrich: broadcast dim join per micro-batch, no stream shuffle") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Streams.KeyedEvent]
    val dim = Seq(("k1", "gold"), ("k2", "silver")).toDF("key", "tier")
    val enriched = Streams.enrich(mem.toDF(), dim, Seq("key"))
    val q = enriched.writeStream.format("memory").queryName("enr_out")
      .outputMode("append").start()
    mem.addData(
      Streams.KeyedEvent("k1", "a", ts("10:00:00")),
      Streams.KeyedEvent("k3", "b", ts("10:01:00"))) // no dim row → null tier
    q.processAllAvailable()
    val got = spark.table("enr_out").select("key", "tier").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map("k1" -> Some("gold"), "k3" -> None))
    // the micro-batch plan must broadcast the dim side
    assert(q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    q.stop()
  }

  test("Kafka builders carry the reference's option surface; value cast enters the ETL path") {
    import graft.streaming.Kafka
    import spark.implicits._
    val src = Kafka.Source("kafka:29092", "pubg-matches")
    assert(src.options == Map(
      "kafka.bootstrap.servers" -> "kafka:29092",
      "subscribe" -> "pubg-matches",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false")) // pubg_streaming.py:19-25 verbatim
    src.reader(spark) // configures without binding (no connector in harness)
    assert(Kafka.Source("b", "t", startingOffsets = "earliest",
      extra = Map("maxOffsetsPerTrigger" -> "1000")).options("maxOffsetsPerTrigger") == "1000")

    val sink = Kafka.Sink("kafka:29092", "pubg-alerts")
    assert(sink.options == Map(
      "kafka.bootstrap.servers" -> "kafka:29092", "topic" -> "pubg-alerts"))
    sink.batchWriter(Seq("x").toDF("value"))

    // binary kafka value -> string envelope column the flatten path reads
    val casted = Kafka.valueAsString(
      Seq("""{"k":1}""".getBytes("UTF-8")).toDF("value"))
    assert(casted.schema.head.dataType.typeName == "string")
    assert(casted.head.getString(0) == """{"k":1}""")
  }

  test("EtlJob with checks diverts violating rows to a replayable quarantine") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Jobs
    val mem = MemoryStream[String]
    mem.addData(
      envJson("a1", "alice", Seq(("m1", 3, 250.0, "2024-01-01 10:00:00"))),
      envJson("a2", "eve", Seq(("m2", 4, -50.0, "2024-01-01 10:01:00")))) // bad damage
    val out = tmp("gate-etl-out"); val qr = tmp("gate-etl-quar")
    val q = Jobs.EtlJob.start(mem.toDF(),
      Jobs.EtlConfig(out, tmp("gate-etl-ckp"), trigger = Trigger.AvailableNow(),
        checks = Seq("damage_non_negative" -> (col("damage_dealt") >= 0)),
        quarantinePath = Some(qr)))
    q.awaitTermination(120000)
    spark.streams.active.foreach(_.awaitTermination()) // quarantine sink (AvailableNow)
    assert(spark.read.parquet(out).select("account_id").as[String]
      .collect().toSeq == Seq("a1"))
    val quarantined = spark.read.parquet(qr)
    assert(quarantined.select("account_id").as[String].collect().toSeq == Seq("a2"))
    assert(quarantined.select("failed_checks").as[Seq[String]]
      .collect().head == Seq("damage_non_negative"))
  }

  test("assembled jobs: EtlJob and AnalyticsJob run the full reference pipelines") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Jobs

    val etlMem = MemoryStream[String]
    etlMem.addData(
      envJson("a1", "alice", Seq(("m1", 3, 250.0, "2024-01-01 10:00:00"))),
      envJson("a1", "alice", Seq(("m1", 3, 250.0, "2024-01-01 10:00:00")))) // dup
    val out = tmp("job-etl-out")
    val q1 = Jobs.EtlJob.start(etlMem.toDF(),
      Jobs.EtlConfig(out, tmp("job-etl-ckp"), trigger = Trigger.AvailableNow()))
    q1.awaitTermination(120000)
    assert(spark.read.parquet(out).count() == 1) // deduped end to end

    val anMem = MemoryStream[String]
    anMem.addData(envJson("b2", "bob",
      (1 to 6).map(i => (s"m$i", i, i * 100.0, f"2024-01-01 10:0$i%d:00"))))
    var names = Set.empty[String]
    val q2 = Jobs.AnalyticsJob.start(anMem.toDF(),
      Jobs.AnalyticsConfig(tmp("job-an-ckp"), tmp("job-an-markers"),
        trigger = Trigger.AvailableNow())) {
      (name, _, _) => names.synchronized { names += name }
    }
    q2.awaitTermination(120000)
    assert(names == Set("ranking", "trends", "anomalies", "aggregates"))
  }

  test("S3+S6: console sink runs alongside the parquet sink; awaitAny unblocks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[String]
    mem.addData(envJson("c3", "carol", Seq(("m9", 2, 150.0, "2024-01-01 12:00:00"))))
    val flat = Streams.etlFlatten(mem.toDF())
    val console = Streams.consoleSink(flat, Trigger.AvailableNow()).start()
    val parquet = Streams.parquetSink(flat, tmp("multi-out"), tmp("multi-ckp"),
      Trigger.AvailableNow()).start()
    // S6: multi-query coordination — both queries drain, awaitAny returns
    assert(Streams.awaitAny(spark, 120000))
    console.awaitTermination(120000)
    parquet.awaitTermination(120000)
    assert(console.exception.isEmpty && parquet.exception.isEmpty)
  }

  test("stateless tokenize-the-stream: trained BPE encode and winnowing " +
      "fingerprints run as pure streaming projections") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // merges/fingerprints are per-row transforms — no aggregation, no
    // state, so a TRAINED tokenizer applies to a stream exactly as it
    // applies to a batch (train-on-sample, encode-the-stream: the
    // streaming face of the Bpe 100 TB contract)
    val trained = Seq(("the", "cat"), ("the cat", "sat"))
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "the cat sat on the mat"), (2L, "the cat ran"))
    val docs = mem.toDF().toDF("doc_id", "text")
    val encoded = graft.text.Bpe.encode(docs, "doc_id", "text", trained)
    val out = tmp("bpe-stream-out")
    val q = encoded.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", tmp("bpe-stream-ckp"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val syms = spark.read.parquet(out)
      .filter(col("doc_id") === 1L).orderBy("pos")
      .select("symbol").as[String].collect().toSeq
    assert(syms == Seq("the cat sat", "on", "the", "mat"))

    val fpMem = MemoryStream[(Long, String)]
    fpMem.addData((1L, "alpha beta gamma delta epsilon zeta eta theta"))
    val fps = graft.text.Winnow.fingerprints(
      fpMem.toDF().toDF("doc_id", "text"), "doc_id", "text", k = 3, w = 2)
    val out2 = tmp("winnow-stream-out")
    val q2 = fps.writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", tmp("winnow-ckp"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    // batch parity: the same doc through the batch path yields the
    // identical fingerprint set
    val streamed = spark.read.parquet(out2)
      .select("pos", "h").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.text.Winnow.fingerprints(
        Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
          .toDF("doc_id", "text"), "doc_id", "text", k = 3, w = 2)
      .select("pos", "h").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stateless curation-the-stream: phrase blocklist and script-mix " +
      "profile run as pure streaming projections with batch parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq((1L, "the table scan merge is slow"),
      (2L, "Привет world"), (3L, "clean document here"))
    val phrases = Seq("table scan merge", "slow query")
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val docs = mem.toDF().toDF("doc_id", "text")
    val flagged = graft.text.Blocklist.phraseHits(docs, "doc_id", "text",
      phrases)
    val mixed = graft.text.Scripts.scriptMix(docs, "doc_id", "text")
    val (o1, o2) = (tmp("bl-stream-out"), tmp("sm-stream-out"))
    val q1 = flagged.writeStream.format("parquet")
      .option("path", o1).option("checkpointLocation", tmp("bl-ckp"))
      .trigger(Trigger.AvailableNow()).start()
    val q2 = mixed.writeStream.format("parquet")
      .option("path", o2).option("checkpointLocation", tmp("sm-ckp"))
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q2.awaitTermination(120000)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rowsOf(spark.read.parquet(o1)) ==
      rowsOf(graft.text.Blocklist.phraseHits(rows.toDF("doc_id", "text"),
        "doc_id", "text", phrases)))
    assert(rowsOf(spark.read.parquet(o2)) ==
      rowsOf(graft.text.Scripts.scriptMix(rows.toDF("doc_id", "text"),
        "doc_id", "text")))
  }

  test("curation pipeline sink: epoch gates + history dedup match the batch pipeline exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog today"
    val phrases = Seq("bad phrase")
    val ref = Seq((100L, base)).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (hist, out, stats, mark, ckp) = (tmp("cur-hist"), tmp("cur-out"),
      tmp("cur-stats"), tmp("cur-mark"), tmp("cur-ckp"))
    Seq(hist, out, stats).foreach(d => Files.delete(java.nio.file.Paths.get(d)))

    def run(): Unit = {
      val q = Streams.curationPipelineSink(docs, "doc_id", "text", phrases,
        ref, hist, out, stats, mark, ckp, minTokens = 3L,
        maxMeanBitsMicro = 21000000L, trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    // epoch 1: d1 survives; d2 fails gopher (1 token); d3 fails the
    // repetition ladder (base doubled)
    mem.addData((1L, base), (2L, "xx"), (3L, s"$base $base"))
    run()
    // epoch 2: d4 carries the banned phrase; d5 is an exact copy of d1
    // (cross-epoch dedup against history); d6 is genuinely new
    val d6 = "and it was entirely a new different document today"
    mem.addData(
      (4L, "the quick brown fox has a bad phrase inside it now"),
      (5L, base), (6L, d6))
    run()

    // survivor parity: the released corpus equals the BATCH pipeline on
    // the union (same knRef, same salt/splits -> same split labels)
    val union = Seq((1L, base), (2L, "xx"), (3L, s"$base $base"),
      (4L, "the quick brown fox has a bad phrase inside it now"),
      (5L, base), (6L, d6)).toDF("doc_id", "text")
    val batchRows = graft.text.Curate.survivors(union, "doc_id", "text",
        phrases, minTokens = 3L, maxMeanBitsMicro = 21000000L,
        knRef = Some(ref))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val streamRows = spark.read.parquet(out)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("split"))).toSet
    assert(streamRows == batchRows)
    assert(streamRows.map(_._1) == Set(1L, 6L))

    // attrition parity: per-stage drop totals across epochs equal the
    // batch datasheet's drop column
    val statDrops = spark.read.parquet(stats)
      .groupBy(col("stage_ord"))
      .agg(sum(col("docs")).as("d"), sum(col("tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batchDrops = graft.text.Curate.attrition(union, "doc_id", "text",
        phrases, minTokens = 3L, maxMeanBitsMicro = 21000000L,
        knRef = Some(ref))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(5), r.getLong(2))).toMap
    for (s <- Seq(1L, 2L, 3L, 5L)) {
      assert(statDrops.get(s).map(_._1).getOrElse(0L) == batchDrops(s)._1,
        s"stage $s docs")
      assert(statDrops.get(s).map(_._2).getOrElse(0L) == batchDrops(s)._2,
        s"stage $s tokens")
    }
    assert(statDrops.get(4L).isEmpty || statDrops(4L)._1 == 0L)
    // released line: sums across epochs = the batch released docs_in
    assert(statDrops(6L)._1 == batchDrops(6L)._3)
  }

  test("release pipeline sink: 8-stage streaming release matches batch " +
      "releaseVerdicts survivors and attritionRelease drop sums") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog today"
    val phrases = Seq("bad phrase")
    val ref = Seq((100L, base)).toDF("doc_id", "text")
    // a 13-token stopword-bearing run shared verbatim with the benchmark
    val contamTxt =
      "it was the best of times and it was the worst of times"
    val bench = Seq((900L, s"prefix words here $contamTxt suffix tail"))
      .toDF("doc_id", "text")
    // near-dup family: 20 words (with stopwords, so the gopher gates
    // pass), one-word tail variants — 3-shingle overlap well above the
    // 8/16 agreement bar
    val ndBase = "the cat sat near the road and saw one big dog that " +
      "ran fast over green hills toward town"
    val nd = (v: String) => s"$ndBase $v"
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (fph, sgh, out, stats, mark, ckp) = (tmp("rel-fp"), tmp("rel-sig"),
      tmp("rel-out"), tmp("rel-stats"), tmp("rel-mark"), tmp("rel-ckp"))
    Seq(fph, sgh, out, stats).foreach(d =>
      Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = Streams.releasePipelineSink(docs, "doc_id", "text", phrases,
        bench, ref, fph, sgh, out, stats, mark, ckp, minTokens = 3L,
        maxMeanBitsMicro = 21000000L, trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    // epoch 1: survivor, gate-fails, a PII doc, a contaminated doc, an
    // in-epoch near-dup pair (higher id drops)
    val e1 = Seq(
      1L -> base,
      2L -> "xx",                                   // stage 1
      3L -> s"$base $base",                         // stage 2
      4L -> (base + " mail me at bob@example.com now"), // stage 6
      5L -> s"intro $contamTxt",                    // stage 7
      6L -> nd("twenty"),                           // stage-8 cluster rep
      7L -> nd("thirty"))                           // stage 8 drop
    // epoch 2: exact cross-epoch copy, a near-dup of a KEPT doc, a
    // near-dup of a DROPPED doc (transitivity via the sig history),
    // and a genuinely new survivor
    val e2 = Seq(
      20L -> base,                                  // stage 5
      21L -> nd("forty"),                           // stage 8 (vs 6)
      22L -> nd("thirty"),                          // stage 8 (vs dropped 7)
      23L -> "and it was entirely a new different document today")
    mem.addData(e1: _*); run()
    mem.addData(e2: _*); run()

    val union = (e1 ++ e2).toDF("doc_id", "text")
    val batchV = graft.text.Curate.releaseVerdicts(union, "doc_id",
      "text", phrases, bench, minTokens = 3L,
      maxMeanBitsMicro = 21000000L, knRef = Some(ref)).persist()
    val batchSurv = batchV.filter(col("stage").isNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamSurv = spark.read.parquet(out)
      .select("doc_id", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamSurv == batchSurv, s"stream=$streamSurv batch=$batchSurv")
    assert(streamSurv.map(_._1) == Set(1L, 6L, 23L))
    // per-stage drop parity: sums across epochs == the batch datasheet
    val statDrops = spark.read.parquet(stats)
      .filter(col("stage_ord") <= 8L)
      .groupBy(col("stage_ord"))
      .agg(sum(col("docs")).as("d"), sum(col("tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val batchDrops = graft.text.Curate.attritionRelease(union, "doc_id",
        "text", phrases, bench, minTokens = 3L,
        maxMeanBitsMicro = 21000000L, knRef = Some(ref))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(5), r.getLong(2))).toMap
    for (s <- 1L to 8L) {
      assert(statDrops.get(s).map(_._1).getOrElse(0L) == batchDrops(s)._1,
        s"stage $s docs: stream=${statDrops.get(s)} batch=${batchDrops(s)}")
      assert(statDrops.get(s).map(_._2).getOrElse(0L) == batchDrops(s)._2,
        s"stage $s tokens")
    }
    // released line sums to the batch released corpus
    val rel = spark.read.parquet(stats).filter(col("stage_ord") === 9L)
      .agg(sum("docs")).head.getLong(0)
    assert(rel == batchDrops(9L)._3)
    batchV.unpersist()
    spark.catalog.clearCache()
  }

  test("mixture-control sink: accounting sums over epochs == batch; " +
      "rates applied from state == batch mixSample winners") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "source", "text")
    val (state, ckp) = (tmp("mix-state"), tmp("mix-ckp"))
    Files.delete(java.nio.file.Paths.get(state))

    def run(): Unit = {
      val q = StateSinks.mixtureControlSink(docs, "source", "text", state,
        ckp, trigger = Trigger.AvailableNow())
      // AvailableNow self-terminates; a false return means the epoch
      // never committed and every later assert would misfire — fail
      // HERE with the real cause instead (and stop the query so a
      // second run can't race a still-live one on the checkpoint).
      val done = q.awaitTermination(180000)
      if (!done) q.stop()
      assert(done, "mixture-control stream did not finish in 180s")
    }
    // two epochs, skewed toward web; code is the scarce target domain
    val e1 = (1L to 40L).map(i => (i, "web", s"web page $i with words")) ++
      (101L to 104L).map(i => (i, "code", s"fn main $i prints"))
    val e2 = (41L to 80L).map(i => (i, "web", s"another web doc $i here")) ++
      (105L to 108L).map(i => (i, "code", s"def helper $i returns"))
    mem.addData(e1: _*); run()
    mem.addData(e2: _*); run()

    val union = (e1 ++ e2).toDF("doc_id", "source", "text")
    // accounting parity: state == the batch per-source sums on the union
    val st = StateSinks.latestMixState(spark, state)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val batchAcct = union.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(st == batchAcct)
    assert(st("web")._1 == 80L && st("code")._1 == 8L)

    // rate parity: applying the state-derived rates to the union picks
    // EXACTLY the batch mixSample winners (same integers end to end)
    val targets = Map("code" -> (1L, 2L))
    val default = (1L, 2L)
    val rates = StateSinks.mixRatesFromState(
      StateSinks.latestMixState(spark, state), targets, default,
      totalNum = 1L, totalDen = 2L)
    // name-based access: both sampled frames lead with the JOIN KEY
    // (source), so positional getLong(0) would read a string
    val fromState = StateSinks.mixSampleFromState(union, col("doc_id"),
        "source", rates, salt = "mx")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val batch = graft.ops.Sampling.mixSample(union, col("doc_id"),
        "source", targets, default, totalNum = 1L, totalDen = 2L,
        salt = "mx")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(fromState == batch && fromState.nonEmpty)
    // scarce domain rate caps at 1: every code doc survives
    assert((101L to 108L).forall(fromState.contains))
  }

  /** Simulate a crash between a foreachBatch's state write and the
    * checkpoint commit: delete the newest commit marker, so the next
    * start REPLAYS that micro-batch with the same epoch id — the
    * recovery path every epoch-snapshot sink claims to survive
    * (state re-merges from the snapshot STRICTLY OLDER than the
    * replayed epoch, then overwrites its own idempotently). */
  private def tearLastCommit(ckp: String): Unit = {
    val dir = new java.io.File(ckp, "commits")
    val commits = dir.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty, s"no commits under $ckp")
    val crc = new java.io.File(dir, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) { crc.delete(); () }
  }

  test("restart: incremental rollup + DP release replay a torn epoch " +
      "without double-count") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Long)]
    val ev = mem.toDF().toDF("key", "cents")
    val (stateDir, ckp) = (tmp("rr-state"), tmp("rr-ckp"))
    def run(): Unit = {
      val q = StateSinks.incrementalRollupSink(ev, Seq("key"), "cents",
        stateDir, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData(("a", 10L), ("b", 5L)); run()
    mem.addData(("a", 20L), ("c", 7L)); run()
    val before = StateSinks.dpReleaseFromState(spark, stateDir,
      Seq("key"), "dp-rs").collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    tearLastCommit(ckp)
    run() // epoch 1 replays against the epoch-0 snapshot
    val after = StateSinks.dpReleaseFromState(spark, stateDir,
      Seq("key"), "dp-rs").collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(after == before, s"after=$after before=$before")
    assert(after("a")._1 == 2L, "n would be 3 on a double-count")
  }

  test("restart: mixture-control state replays a torn epoch without " +
      "double-count") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, String)]
    val docs = mem.toDF().toDF("doc_id", "source", "text")
    val (state, ckp) = (tmp("mr-state"), tmp("mr-ckp"))
    def run(): Unit = {
      val q = StateSinks.mixtureControlSink(docs, "source", "text",
        state, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData((1L, "web", "one two"), (2L, "code", "three")); run()
    mem.addData((3L, "web", "four five six")); run()
    val before = StateSinks.latestMixState(spark, state)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    tearLastCommit(ckp)
    run()
    val after = StateSinks.latestMixState(spark, state)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(after == before && after("web") == ((2L, 5L)),
      s"after=$after before=$before")
  }

  test("restart: shard-layout counters replay a torn epoch without " +
      "shifting committed positions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (layout, state, ckp) =
      (tmp("sr-layout"), tmp("sr-state"), tmp("sr-ckp"))
    def run(): Unit = {
      val q = StateSinks.shardLayoutSink(docs, "doc_id", "text",
        nShards = 4, salt = "sl", layout, state, ckp,
        Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData((1L to 8L).map(i => (i, s"doc $i")): _*); run()
    mem.addData((9L to 12L).map(i => (i, s"doc $i")): _*); run()
    val before = spark.read.parquet(state + "/" +
        new java.io.File(state).listFiles().map(_.getName)
          .filter(_.startsWith("epoch=")).max)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tearLastCommit(ckp)
    run()
    val after = spark.read.parquet(state + "/" +
        new java.io.File(state).listFiles().map(_.getName)
          .filter(_.startsWith("epoch=")).max)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-shard counters identical — a double-count would inflate them
    assert(after == before, s"after=$after before=$before")
    assert(after.values.sum == 12L)
  }

  test("restart: late-data audit high-water mark replays a torn epoch " +
      "without advancing twice") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[java.sql.Timestamp]
    val ev = mem.toDF().toDF("ts")
    val (audit, state, ckp) =
      (tmp("lr-audit"), tmp("lr-state"), tmp("lr-ckp"))
    def run(): Unit = {
      val q = StateSinks.lateDataAuditSink(ev, "ts", delaySeconds = 10L,
        audit, state, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    mem.addData(ts(1000)); run()
    mem.addData(ts(985), ts(1100)); run()
    val markOf = () => spark.read.parquet(state + "/" +
        new java.io.File(state).listFiles().map(_.getName)
          .filter(_.startsWith("epoch=")).max)
      .head.getLong(0)
    val before = markOf()
    tearLastCommit(ckp)
    run()
    assert(markOf() == before && before == 1100L * 1000000L)
    // the replayed epoch re-audits against the epoch-0 mark (1000s),
    // so 985 is still the one late row of epoch 1 in its final audit
    val audits = StateSinks.readLateAudits(spark, audit)
      .filter(col("epoch") === 1L).select("n_late").collect()
      .map(_.getLong(0))
    assert(audits.forall(_ == 1L))
  }

  test("restart: heavy-hitters sketch replays a torn epoch without " +
      "double-merging counters") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val ev = mem.toDF().toDF("rid", "k")
    val (stateDir, ckp) = (tmp("hr-state"), tmp("hr-ckp"))
    def run(): Unit = {
      val q = StateSinks.heavyHittersSink(ev, "k", stateDir, ckp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData((1L to 40L).map(i => (i, "hot")): _*); run()
    mem.addData((41L to 70L).map(i => (i, "hot")) ++
      (71L to 80L).map(i => (i, s"t$i")): _*); run()
    val before = StateSinks.latestHeavyHitters(spark, stateDir, 0.3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tearLastCommit(ckp)
    run()
    val after = StateSinks.latestHeavyHitters(spark, stateDir, 0.3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a double-merge would read hot ~100, total ~110
    assert(after == before && after("hot") == 70L,
      s"after=$after before=$before")
  }

  test("restart: release pipeline sink replays a torn epoch without " +
      "re-releasing — the fp-history self-heal (round-12 item 6)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog today"
    val ref = Seq((100L, base)).toDF("doc_id", "text")
    val bench = Seq((900L, "nothing shared with the corpus over here"))
      .toDF("doc_id", "text")
    val ndBase = "the cat sat near the road and saw one big dog that " +
      "ran fast over green hills toward town"
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (fph, sgh, out, stats, mark, ckp) = (tmp("rt-fp"), tmp("rt-sig"),
      tmp("rt-out"), tmp("rt-stats"), tmp("rt-mark"), tmp("rt-ckp"))
    Seq(fph, sgh, out, stats).foreach(d =>
      Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = Streams.releasePipelineSink(docs, "doc_id", "text",
        Seq("bad phrase"), bench, ref, fph, sgh, out, stats, mark, ckp,
        minTokens = 3L, maxMeanBitsMicro = 21000000L,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    mem.addData(1L -> base, 6L -> s"$ndBase twenty",
      7L -> s"$ndBase thirty"); run()
    mem.addData(20L -> base,
      23L -> "and it was entirely a new different document today"); run()
    def released() = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    def fpCount() = spark.read.parquet(fph).count()
    def sigCount() = spark.read.parquet(sgh).count()
    val (relBefore, fpBefore, sigBefore) = (released(), fpCount(), sigCount())
    assert(relBefore == Seq(1L, 6L, 23L))
    // the torn-epoch shape the five StateSinks cases don't cover: the
    // crash lands AFTER both history appends but BEFORE the marker —
    // marker gone, commit gone, all state already written. The replayed
    // epoch's docs now hash-match the fp history, so stage 5 drops them
    // ALL: released output gains zero rows, `fresh` is empty, and both
    // history appends append nothing — the release set equals the clean
    // run exactly. (The documented weaker case — a crash BEFORE the fp
    // append — duplicates the torn epoch's output rows; outDir readers
    // needing more go through a dedup view, per the sink's scaladoc.)
    val ms = new java.io.File(mark).listFiles()
      .filter(_.getName.endsWith(".done")).sortBy(_.getName)
    assert(ms.nonEmpty && ms.last.delete())
    tearLastCommit(ckp)
    run()
    assert(released() == relBefore,
      s"released diverged: ${released()} vs $relBefore")
    assert(fpCount() == fpBefore && sigCount() == sigBefore,
      "a history append re-ran non-empty on replay")
  }

  test("compactHistory: corpus-sink fp history and output compact " +
      "mid-stream — epochs -> compact -> more epochs equals never " +
      "compacting, torn-replay duplicates physically drop") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (hist, out, mark, ckp) =
      (tmp("ch-hist"), tmp("ch-out"), tmp("ch-mark"), tmp("ch-ckp"))
    Seq(hist, out).foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = Streams.incrementalCorpusSink(docs, "doc_id", "text",
        hist, out, mark, ckp, Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData((1L, "the quick brown fox"), (2L, "something else"))
    run()
    // simulate a torn epoch's double-append: one duplicate row in each
    // dir (identical bytes — exactly what a replayed append writes)
    spark.read.parquet(hist).limit(1).write.mode("append").parquet(hist)
    spark.read.parquet(out).filter(col("doc_id") === 1L)
      .write.mode("append").parquet(out)
    assert(spark.read.parquet(hist).count() == 3L)
    Streams.compactHistory(spark, hist)               // whole-row distinct
    Streams.compactHistory(spark, out, Seq("doc_id")) // key dedup
    assert(spark.read.parquet(hist).count() == 2L)
    assert(spark.read.parquet(out).count() == 2L)
    // the stream continues over the compacted state: a cross-history
    // dup still drops, a new doc still lands — same as never compacting
    mem.addData((3L, "  The  QUICK brown fox "), (4L, "genuinely new"))
    run()
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L))
    assert(spark.read.parquet(hist).distinct().count() == 3L)
  }

  test("compactHistory: near-dup signature history compacts mid-stream " +
      "and cross-epoch near-dup verdicts are unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (hist, out, mark, ckp) =
      (tmp("cn-hist"), tmp("cn-out"), tmp("cn-mark"), tmp("cn-ckp"))
    Seq(hist, out).foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = Streams.incrementalNearDupSink(docs, "doc_id", "text",
        hist, out, mark, ckp, trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "completely different content about spark query engines"))
    run()
    spark.read.parquet(hist).limit(1).write.mode("append").parquet(hist)
    val before = spark.read.parquet(hist).count()
    Streams.compactHistory(spark, hist)
    assert(spark.read.parquet(hist).count() == before - 1L)
    // post-compaction: a token-identical re-send of doc 2 still drops
    // against the compacted history; a fresh doc still survives
    mem.addData(
      (3L, "Completely DIFFERENT content about spark query engines!"),
      (4L, "entirely new document with its own words"))
    run()
    assert(spark.read.parquet(out).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 4L))
  }

  test("compactHistory: release-sink fp+sig histories compact between " +
      "epochs — survivors equal the batch releaseVerdicts on the union") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog today"
    val ref = Seq((100L, base)).toDF("doc_id", "text")
    val bench = Seq((900L, "nothing shared with the corpus over here"))
      .toDF("doc_id", "text")
    val ndBase = "the cat sat near the road and saw one big dog that " +
      "ran fast over green hills toward town"
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val (fph, sgh, out, stats, mark, ckp) = (tmp("cr-fp"), tmp("cr-sig"),
      tmp("cr-out"), tmp("cr-stats"), tmp("cr-mark"), tmp("cr-ckp"))
    Seq(fph, sgh, out, stats).foreach(d =>
      Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = Streams.releasePipelineSink(docs, "doc_id", "text",
        Seq("bad phrase"), bench, ref, fph, sgh, out, stats, mark, ckp,
        minTokens = 3L, maxMeanBitsMicro = 21000000L,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    val e1 = Seq(1L -> base, 6L -> s"$ndBase twenty",
      7L -> s"$ndBase thirty")
    val e2 = Seq(20L -> base,                  // stage-5 vs compacted fp
      22L -> s"$ndBase forty",                 // stage-8 vs compacted sig
      23L -> "and it was entirely a new different document today")
    mem.addData(e1: _*); run()
    Streams.compactHistory(spark, fph)
    Streams.compactHistory(spark, sgh)
    mem.addData(e2: _*); run()
    val streamSurv = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchSurv = graft.text.Curate.releaseVerdicts(
        (e1 ++ e2).toDF("doc_id", "text"), "doc_id", "text",
        Seq("bad phrase"), bench, minTokens = 3L,
        maxMeanBitsMicro = 21000000L, knRef = Some(ref))
      .filter(col("stage").isNull)
      .collect().map(_.getLong(0)).toSet
    assert(streamSurv == batchSurv, s"stream=$streamSurv batch=$batchSurv")
    assert(streamSurv == Set(1L, 6L, 23L))
    spark.catalog.clearCache()
  }

  test("a compaction crash between renames is detected: missing live " +
      "dir with a leftover sibling fails loudly instead of reading " +
      "empty history") {
    import spark.implicits._
    val dir = tmp("cw-live")
    Seq((1L, "a"), (2L, "b")).toDF("id", "t")
      .write.mode("overwrite").parquet(dir)
    // simulate the window between swapRewrite's two renames: the live
    // dir has moved to .old, the compact copy never renamed in
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old")))
    val e = intercept[IllegalArgumentException] {
      Streams.compactHistory(spark, dir)
    }
    assert(e.getMessage.contains("compaction crashed between its renames"),
      e.getMessage)
    // recovery per the message: rename the complete copy back, proceed
    assert(new java.io.File(dir + ".old").renameTo(new java.io.File(dir)))
    Streams.compactHistory(spark, dir)
    assert(spark.read.parquet(dir).count() == 2L)
  }
}
