package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Operator unit tests, including the reference's only machine-checkable
  * fixtures: the three alert payloads of `test/test_alerts.py:30-70`
  * (FIXTURES.md A3) against the X2 severity gates. */
class OpsSpec extends SparkSuite {

  test("severity matches the reference alert fixtures (HIGH/MEDIUM/LOW)") {
    import spark.implicits._
    val alerts = Seq(
      ("TestPlayer_HIGH", 25, 4500.0, 4.2, 3.8, 4.5, "HIGH"),
      ("TestPlayer_MEDIUM", 16, 2800.0, 3.2, 2.8, 3.5, "MEDIUM"),
      ("TestPlayer_LOW", 5, 800.0, 1.2, 0.8, 1.5, "LOW"))
      .toDF("player_name", "kills", "damage_dealt", "kill_zscore",
        "damage_zscore", "headshot_zscore", "expected")
    val out = alerts.withColumn("severity",
      Anomaly.severity(col("kills"), col("damage_dealt"),
        Seq(col("kill_zscore"), col("damage_zscore"), col("headshot_zscore"))))
    assert(out.filter(col("severity") =!= col("expected")).count() == 0)
  }

  test("severity boundary: each gate alone triggers its level") {
    import spark.implicits._
    val rows = Seq(
      (20, 0.0, 0.0, "HIGH"),   // kills gate
      (0, 4000.0, 0.0, "HIGH"), // damage gate
      (0, 0.0, -4.0, "HIGH"),   // |z| gate
      (15, 0.0, 0.0, "MEDIUM"),
      (0, 2500.0, 0.0, "MEDIUM"),
      (0, 0.0, 3.0, "MEDIUM"),
      (14, 2499.0, 2.9, "LOW"))
      .toDF("kills", "damage", "z", "expected")
    val out = rows.withColumn("sev",
      Anomaly.severity(col("kills"), col("damage"), Seq(col("z"))))
    assert(out.filter(col("sev") =!= col("expected")).count() == 0)
  }

  test("kda guards division by zero deaths") {
    import spark.implicits._
    val df = Seq((5, 3, 0), (5, 3, 2)).toDF("kills", "assists", "deaths")
      .withColumn("kda", Anomaly.kda(col("kills"), col("assists"), col("deaths")))
    assert(df.orderBy("deaths").collect().map(_.getAs[Double]("kda")).toSeq ==
      Seq(8.0, 4.0))
  }

  test("zscoreFilter flags exactly the outlier") {
    import spark.implicits._
    // 20 values at 100 ± small noise, one at 100000
    val vals = (1 to 20).map(i => 100.0 + i * 0.01) :+ 100000.0
    val df = vals.toDF("v").withColumn("c", Exact.cents(col("v")))
    val out = Anomaly.zscoreFilter(df, "c", 2.5)
    assert(out.count() == 1)
    assert(out.first().getAs[Double]("v") == 100000.0)
  }

  test("zscoreFilter: zero variance flags nothing (NaN guard), stat names don't collide") {
    import spark.implicits._
    // constant column → sd = 0 → z = 0/0 = NaN; NaN ranks above every
    // double, so the unguarded filter would flag 100% of rows
    val const = Seq.fill(10)(42.0).toDF("v").withColumn("c", Exact.cents(col("v")))
    assert(Anomaly.zscoreFilter(const, "c", 2.5).count() == 0)
    assert(Anomaly.zscoreFilter(Seq(1.0).toDF("v")
      .withColumn("c", Exact.cents(col("v"))), "c", 2.5).count() == 0) // n = 1
    // input owning columns named n/s/ss must survive untouched
    val clash = ((1 to 20).map(i => (100.0 + i * 0.01, i)) :+ ((100000.0, 21)))
      .toDF("v", "n").withColumn("s", col("n") + 1).withColumn("ss", col("n") + 2)
      .withColumn("c", Exact.cents(col("v")))
    val out = Anomaly.zscoreFilter(clash, "c", 2.5)
    assert(out.columns.count(_ == "n") == 1 && out.count() == 1)
    assert(out.first().getAs[Int]("n") == 21) // caller's column, not the stat
  }

  test("severity: empty z-score list degrades to the kills/damage gates") {
    import spark.implicits._
    val out = Seq((25, 100.0), (1, 100.0)).toDF("kills", "damage")
      .select(Anomaly.severity(col("kills"), col("damage"), Seq.empty).as("sev"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("HIGH", "LOW"))
  }

  test("movingFrame: 5-row frame and sequence") {
    import spark.implicits._
    val df = (1 to 7).map(i => ("p", i, i * 10L)).toDF("k", "ord", "c")
    val framed = Windows.movingFrame(df, col("k"), Seq(col("ord")), Seq("c"))
    val rows = framed.orderBy("ord").collect()
    assert(rows.map(_.getAs[Long]("seq")).toSeq == (1L to 7L))
    // row 7: frame = rows 3..7 → sum = (3+4+5+6+7)*10 = 250, n = 5
    assert(rows.last.getAs[Long]("mov_sum_c") == 250L)
    assert(rows.last.getAs[Long]("frame_n") == 5L)
    // row 2: frame = rows 1..2
    assert(rows(1).getAs[Long]("mov_sum_c") == 30L)
    assert(rows(1).getAs[Long]("frame_n") == 2L)
  }

  test("rankTopK deterministic tie-break") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("b", 5.0), ("c", 4.0)).toDF("id", "score")
    val ranked = Ranking.rankTopK(df, "score", "id", 2).collect()
    assert(ranked.map(r => (r.getAs[String]("id"), r.getAs[Long]("rank"))).toSet ==
      Set(("a", 1L), ("b", 2L)))
  }

  test("topK equals rank-filter top-k on distinct scores") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 101).toDouble)).toDF("id", "score")
    val a = Ranking.topK(df, "score", "id", 10).select("id").collect().map(_.getLong(0)).toSet
    val b = Ranking.rankTopK(df, "score", "id", 10).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("Exact.cents survives 2-decimal doubles exactly") {
    import spark.implicits._
    val df = Seq(0.01, 123.45, 99999.99, -5.5).toDF("v")
    val out = df.select(Exact.cents(col("v"))).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 12345L, 9999999L, -550L))
  }

  test("morton interleave: known bit patterns, expression matches JVM path") {
    import spark.implicits._
    import graft.functions.Morton
    assert(Morton.interleave(0L, 0L) == 0L)
    assert(Morton.interleave(3L, 1L) == 7L)   // 0b101 | 0b010
    assert(Morton.interleave(0L, 3L) == 10L)  // odd positions only
    assert(Morton.interleave(0x7FFFFFFFL, 0L) == 0x1555555555555555L)
    // sign-bit safety: max inputs stay positive
    assert(Morton.interleave(0x7FFFFFFFL, 0x7FFFFFFFL) > 0L)
    val df = Seq((3L, 1L), (123456789L, 987654321L)).toDF("a", "b")
    val viaExpr = df.select(Morton.morton(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == Seq(Morton.interleave(3L, 1L),
      Morton.interleave(123456789L, 987654321L)))
  }

  test("skewReport: exact quantiles from the histogram, deterministic top key") {
    import spark.implicits._
    // key 1 x 6 rows, keys 2..5 x 1 — max share 6/10 over 5 keys = 3.0
    val df = (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("k")
    val r = Skew.skewReport(df, "k").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L) // n_keys, n_rows
    assert(r.getLong(2) == 6L && r.getLong(3) == 1L)  // max_c, top_key
    assert(r.getLong(4) == 1L) // p50 of counts {1,1,1,1,6}
    assert(r.getLong(5) == 6L) // p90 rank ceil(4.5)=5 → the heavy key
    assert(r.getDouble(6) == 3.0)
  }

  test("pageRank: sinks absorb rank from their fan-in, runs are bit-identical") {
    import spark.implicits._
    // Star into node 9 plus a 1→2 chain: 9 has fan-in 3, node 2 fan-in 1.
    val edges = Seq((1L, 9L), (3L, 9L), (4L, 9L), (1L, 2L)).toDF("s", "d")
    val pr = PageRank.pageRank(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L, 9L))
    assert(pr(9L) > pr(2L)) // more fan-in, more rank
    assert(pr(2L) > pr(1L)) // sources keep only the teleport share
    assert(pr(1L) == pr(3L) && pr(3L) == pr(4L))
    val again = PageRank.pageRank(edges.repartition(7), "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == pr) // integer arithmetic: partitioning-independent
  }

  test("personalizedPageRank: mass stays in the seed's component and " +
      "decays with hop distance") {
    import spark.implicits._
    // two disjoint chains: 1→2→3 and 10→11. Seed = {1}.
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("node")
    val ppr = PageRank.personalizedPageRank(edges, "s", "d", seeds,
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the other component never appears (r = 0 rows are dropped)
    assert(!ppr.contains(10L) && !ppr.contains(11L))
    // proximity ordering: seed > 1-hop > 2-hop
    assert(ppr(1L) > ppr(2L) && ppr(2L) > ppr(3L))
  }

  test("labelPropagation separates weakly-bridged cliques that CC fuses") {
    import spark.implicits._
    // two 4-cliques joined by ONE bridge edge: connected components fuses
    // them into one cluster; majority-vote LPA keeps them apart (each
    // bridge endpoint has 3 in-clique neighbors vs 1 across)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
      :+ ((4L, 10L))).toDF("s", "d")
    val lpa = PageRank.labelPropagation(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Seq(1L, 2L, 3L, 4L).map(lpa)
    val right = Seq(10L, 11L, 12L, 13L).map(lpa)
    assert(left.distinct.size == 1 && right.distinct.size == 1)
    assert(left.head != right.head)
    val cc = graft.dedup.NearDup.connectedComponents(edges.toDF("d1", "d2"))
      .select("cluster_id").distinct().count()
    assert(cc == 1) // the contrast: reachability fuses what LPA separates
    // determinism across partitionings (pure argmax recurrence)
    val again = PageRank.labelPropagation(edges.repartition(7), "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == lpa)
    // string node ids: the tie-break must not numeric-cast the label
    // (a `-label` tie-break silently nulls out on strings and turns the
    // argmax nondeterministic) — same structure, prefixed ids
    val sEdges = edges.select(
      concat(lit("n"), col("s")).as("s"), concat(lit("n"), col("d")).as("d"))
    val sLpa = PageRank.labelPropagation(sEdges, "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = lpa.map { case (n, c) => s"n$n" -> s"n$c" }
    assert(sLpa == expected)
  }

  test("degreeAssortativity: star is perfectly disassortative, regular graph has no verdict, self-loops drop") {
    import spark.implicits._
    // star: hub 0 -> leaves 1..5 (self-loop must be ignored); every
    // endpoint pair is (5,1) or (1,5) -> r = -1 exactly
    val star = ((1L to 5L).map((0L, _)) :+ ((0L, 0L))).toDF("s", "d")
    val r1 = PageRank.degreeAssortativity(star, "s", "d").collect().head
    assert(r1.getLong(0) == 6L && r1.getLong(1) == 5L)
    assert(math.abs(r1.getDouble(2) - (-1.0)) < 1e-12)
    // 4-cycle: all degrees 2, zero variance -> NULL verdict, not NaN
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val r2 = PageRank.degreeAssortativity(cyc, "s", "d").collect().head
    assert(r2.isNullAt(2) && r2.getLong(1) == 4L)
  }

  test("hits: curators and content separate, scores max-normalize, runs are bit-identical") {
    import spark.implicits._
    // bipartite curation graph: hub 1 endorses all three authorities,
    // hubs 2/3 endorse one each; authorities 101/102 have fan-in 2,
    // 103 fan-in 1
    val edges = Seq((1L, 101L), (1L, 102L), (1L, 103L), (2L, 101L),
      (3L, 102L)).toDF("s", "d")
    val r = PageRank.hits(edges, "s", "d", iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val hub = r.view.mapValues(_._1).toMap
    val auth = r.view.mapValues(_._2).toMap
    // the broadest curator is the top hub (max-normalized to scale)
    assert(hub(1L) == 1000000L && hub(2L) == hub(3L) && hub(2L) > 0)
    assert(hub(1L) > hub(2L))
    // pure authorities have zero hub score; pure hubs zero authority
    assert(Seq(101L, 102L, 103L).forall(hub(_) == 0L))
    assert(Seq(1L, 2L, 3L).forall(auth(_) == 0L))
    // fan-in 2 authorities tie at the top; fan-in-1 strictly below
    assert(auth(101L) == auth(102L) && auth(101L) == 1000000L)
    assert(auth(103L) > 0 && auth(103L) < auth(101L))
    // integer arithmetic: partitioning-independent
    val again = PageRank.hits(edges.repartition(7), "s", "d", iters = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(again == r)
  }

  test("Bloom: zero false negatives, real pruning, reduction equals exact semi join, empty set rejects all") {
    import spark.implicits._
    import graft.ops.Bloom
    val members = (1L to 500L).map(_ * 3).toDF("k")
    val words = Bloom.build(members, "k", mBits = 1 << 14, k = 5)
    // no false negatives: every member probes true
    assert(members.filter(!Bloom.mightContain(col("k"), words)).count() == 0)
    // pruning: non-members (disjoint range) mostly rejected — at
    // n=500, m=2^14, k=5 the FP rate is ~0.4%; allow 5% slack
    val nonMembers = (100001L to 102000L).toDF("k")
    val fp = nonMembers.filter(Bloom.mightContain(col("k"), words)).count()
    assert(fp < 100, s"fp=$fp of 2000")
    // composed reduction == exact semi join (FPs confirmed away)
    val big = (1L to 3000L).map(i => (i, s"row$i")).toDF("k", "v")
    val got = Bloom.semiJoinReduce(big, "k", members, "k", 1 << 14)
      .collect().map(_.getLong(0)).sorted
    val exact = big.join(members, Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == exact.toSeq && got.nonEmpty)
    // empty key set: all-zero bitset rejects everything
    val empty = Bloom.build(members.filter(col("k") < 0), "k", 1 << 10)
    assert(big.filter(Bloom.mightContain(col("k"), empty)).count() == 0)
  }

  test("lengthBucketedBatches: batches bounded, padding exact and below fixed-maxlen, empty docs drop, deterministic") {
    import spark.implicits._
    import graft.ops.Packing
    val rnd = new scala.util.Random(11)
    val docs = ((1 to 200).map { i =>
      val n = 1 + rnd.nextInt(120)
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    } :+ ((999L, ""))).toDF("doc_id", "text") // empty doc must drop
    val out = Packing.lengthBucketedBatches(docs, "doc_id", "text",
      batchSize = 8, shards = 2, salt = "t")
    val rows = out.collect().map(r => (r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)))
    assert(rows.forall(_._1 <= 8L)) // no batch over batchSize
    // padding identity: n_docs*batch_max - batch_tokens, non-negative
    assert(rows.forall { case (n, tok, mx, pad) => pad == n * mx - tok && pad >= 0 })
    assert(rows.map(_._1).sum == 200L) // every non-empty doc in exactly one batch
    // total bucketed padding beats padding to the corpus max
    val lens = docs.filter($"doc_id" =!= 999L)
      .select(graft.text.TextAnalysis.tokenCount($"text").cast("long"))
      .collect().map(_.getLong(0))
    val fixedPad = lens.map(lens.max - _).sum
    assert(rows.map(_._4).sum < fixedPad)
    val again = Packing.lengthBucketedBatches(docs.repartition(7), "doc_id",
      "text", batchSize = 8, shards = 2, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).sorted
    val first = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).sorted
    assert(again.toSeq == first.toSeq)
  }

  test("clusteringCoefficients: clique corners read 1, bridge reads 1/3, pendant has no verdict") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 hanging off 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val out = Triangles.clusteringCoefficients(edges, "s", "d")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((2L, 1L, Some(1.0))))
    assert(out(2L) == ((2L, 1L, Some(1.0))))
    assert(out(3L) == ((3L, 1L, Some(1.0 / 3.0))))
    assert(out(4L) == ((1L, 0L, None))) // degree 1: no pair to close
  }

  test("rollingMedian: spikes never move the lower median, every output is an input value") {
    import spark.implicits._
    import graft.ops.Windows
    val rows = Seq(10L, 100L, 10L, 10L, 1000L, 10L).zipWithIndex
      .map { case (v, i) => (1L, i.toLong, i.toLong, v) }
      .toDF("k", "ts", "id", "cents")
    val out = Windows.rollingMedian(rows, col("k"), Seq(col("ts"), col("id")),
        "cents", lookback = 4)
      .collect().map(r => r.getLong(4) -> r.getLong(5)).toMap
    // the two spikes (100 at seq2, 1000 at seq5) never surface
    assert((1L to 6L).forall(out(_) == 10L), out.toString)
    // contrast: the 5-row moving MEAN at seq 5 would read 226
  }

  test("burstiness: periodic reads -1, volley-firing reads positive, singletons drop") {
    import spark.implicits._
    import graft.ops.Journey
    def ev(u: Long, ss: Seq[Long]) = ss.zipWithIndex.map { case (s, i) =>
      (u, s, u * 1000 + i)
    }
    val events = (ev(1L, Seq(0L, 10L, 20L, 30L, 40L)) ++ // metronome
      ev(2L, Seq(0L, 1L, 2L, 3L, 4L, 5L, 500L)) ++ // one long volley + jump
      ev(3L, Seq(5L)))                                   // one event: no gap
      .toDF("user_id", "s", "event_id")
      .select($"user_id", $"s".cast("timestamp").as("ts"), $"event_id")
    val out = Journey.burstiness(events, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L)._1 == 4L && out(1L)._2 == Some(-1.0)) // sigma 0, exact
    assert(out(2L)._2.exists(_ > 0.3), out.toString)     // bursty
    assert(!out.contains(3L))
  }

  test("cusumAlarms: sustained shift crosses once at onset, flat series never alarms, runs are bit-identical") {
    import spark.implicits._
    // user 1: 10 points at 0 then 10 at 100 (mean target 50) — deviations
    // −50×10 then +50×10; S = max(0, ...) stays 0 through the low
    // segment, then climbs 50/point: crosses h=120 exactly at i=13
    // (S=150) and never re-crosses. user 2: constant — no alarm ever.
    val rows = ((1 to 10).map(i => (1L, i.toLong, i.toLong, 0L)) ++
      (11 to 20).map(i => (1L, i.toLong, i.toLong, 100L)) ++
      (1 to 20).map(i => (2L, i.toLong, i.toLong, 7L)))
      .toDF("user_id", "ts", "event_id", "v")
    val out = Anomaly.cusumAlarms(rows, "user_id", "ts", "event_id",
        col("v"), slackCents = 0L, thresholdCents = 120L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 13L, 150L)))
    val again = Anomaly.cusumAlarms(rows.repartition(7), "user_id", "ts",
        "event_id", col("v"), 0L, 120L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(again.toSeq == out.toSeq)
  }

  test("BinPack FFD: no bin overflows, every eligible doc packs once, beats greedy, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sizes = (1L to 120L).map(i => i -> (1 + rnd.nextInt(15)))
    val docs = sizes
      .map { case (i, n) => (i, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val cap = 20
    val out = BinPack.packBinsFFD(docs, "doc_id", "text",
        capacity = cap, shards = 3, salt = "bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 120) // every doc (all fit) packed exactly once
    assert(out.map(_._1).distinct.length == 120)
    // the load-bearing invariant: no bin over capacity
    val binLoads = out.groupBy(r => (r._2, r._4)).map(_._2.map(_._3).sum)
    assert(binLoads.forall(_ <= cap))
    // FFD uses no more bins (= no more padding) than the greedy
    // sequential packer (id order, only the last bin open) most
    // pipelines start with
    val ffdBins = out.groupBy(_._2).map { case (_, rs) =>
      rs.map(_._4).distinct.length }.sum
    val greedyBins = out.groupBy(_._2).map { case (_, rs) =>
      var (bins, load) = (0, 0L)
      rs.sortBy(_._1).foreach { r =>
        if (bins == 0 || load + r._3 > cap) { bins += 1; load = r._3 }
        else load += r._3
      }
      bins
    }.sum
    assert(ffdBins < greedyBins, s"ffd=$ffdBins greedy=$greedyBins")
    // oversize and empty docs are excluded by contract
    val edge = Seq((200L, Seq.fill(25)("w").mkString(" ")), (201L, ""))
      .toDF("doc_id", "text")
    assert(BinPack.packBinsFFD(edge, "doc_id", "text", cap, 3, "bp").count() == 0)
    // deterministic across partitionings (pure function of content)
    val again = BinPack.packBinsFFD(docs.repartition(11), "doc_id", "text",
        capacity = cap, shards = 3, salt = "bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("robustOutliers catches what the dragged mean hides; constant groups flag nothing") {
    import spark.implicits._
    val df = (
      // group a: mean 208, sd ~440 -> z(1000) ≈ 1.8 misses at 3σ;
      // median 10, MAD 0 -> 1000 flags
      Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L), (4L, "a", 10L),
        (5L, "a", 1000L))
      // group b: MAD > 0 — only the 100 exceeds 3·MAD around median 3
      ++ Seq((6L, "b", 1L), (7L, "b", 2L), (8L, "b", 3L), (9L, "b", 4L),
        (10L, "b", 100L))
      // group c: constant -> MAD 0, zero deviation, nothing flags
      ++ Seq((11L, "c", 5L), (12L, "c", 5L))
    ).toDF("id", "g", "cents")
    val out = Anomaly.robustOutliers(df, Seq("g"), "cents")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("med"), r.getAs[Long]("mad"), r.getAs[Boolean]("is_outlier"))).toMap
    assert(out(5L) == ((10L, 0L, true)))
    assert((1L to 4L).forall(out(_) == ((10L, 0L, false))))
    assert(out(10L) == ((3L, 1L, true)))
    assert((6L to 9L).forall(!out(_)._3))
    assert(out(11L) == ((5L, 0L, false)) && out(12L) == ((5L, 0L, false)))
    // the z-score sibling genuinely misses group a's outlier at 3σ
    val z = Anomaly.zscoreFilter(
      df.filter(col("g") === "a").select(col("id"), col("cents")), "cents", 3.0)
    assert(z.count() == 0)
  }

  test("transitionMatrix: hand sequence counts, row-stochastic micro " +
      "probs, first event never a target") {
    import spark.implicits._
    // user 1: a a b a  → (a,a) (a,b) (b,a); user 2: b b → (b,b)
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 1L, "b"), (2L, 2L, "b")).toDF("u", "t", "e")
    val m = TimeSeries.transitionMatrix(ev, col("u"), col("e"),
      Seq(col("t")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(("a", "a")) == ((1L, 2L, 500000L)))
    assert(m(("a", "b")) == ((1L, 2L, 500000L)))
    assert(m(("b", "a")) == ((1L, 2L, 500000L)))
    assert(m(("b", "b")) == ((1L, 2L, 500000L)))
    assert(m.size == 4)
  }

  test("autocorr: alternating series reads -1, constant reads NULL, " +
      "gaps form no pair") {
    import spark.implicits._
    val series = (
      (1L to 10L).map(t => ("alt", t, if (t % 2 == 0) 10L else 20L)) ++
      (1L to 10L).map(t => ("const", t, 7L)) ++
      // gapped: only t = 1, 3, 5 — no consecutive pair exists at lag 1
      Seq(("gap", 1L, 1L), ("gap", 3L, 2L), ("gap", 5L, 3L))
    ).toDF("k", "t", "x")
    val out = TimeSeries.autocorr(series, Seq("k"), "t", "x", 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    assert(out("alt")._1 == 9L && math.abs(out("alt")._2.get + 1.0) < 1e-12)
    assert(out("const") == ((9L, None)))
    assert(!out.contains("gap")) // zero pairs → no group row
  }

  test("associationRules: hand baskets give exact support/confidence/" +
      "lift, within-basket duplicates collapse, min-support prunes") {
    import spark.implicits._
    // baskets: {A,B,C}, {A,B}, {A,B,B}, {C} → AB pair in 3 of 4 baskets
    val rows = Seq((1L, "A"), (1L, "B"), (1L, "C"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "B"), (4L, "C")).toDF("b", "i")
    val out = Basket.associationRules(rows, "b", "i", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    // AC and BC each co-occur once → pruned at minSupport 2
    assert(out.keySet == Set(("A", "B")))
    val (nPair, nA, nB, nBaskets, confAB, confBA, lift) = out(("A", "B"))
    assert((nPair, nA, nB, nBaskets) == ((3L, 3L, 3L, 4L)))
    assert(confAB == 1.0 && confBA == 1.0)
    assert(lift == 3.0 * 4 / 3 / 3) // > 1: genuinely associated
  }

  test("seasonalZ: planted off-season spike flags, in-season equals " +
      "baseline, singleton season groups never NaN-compare") {
    import spark.implicits._
    // season key "h": 10 cells at 100, one spiked cell at 200
    val cells = ((1L to 10L).map(d => ("m1", 0L, d, 100L)) :+
      ("m1", 0L, 11L, 200L)) ++
      Seq(("m2", 5L, 1L, 42L)) // singleton group: sd undefined
    val out = Anomaly.seasonalZ(cells.toDF("k", "hod", "day", "c"),
      Seq("k", "hod"), "c", threshold = 2.0)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("day")))
    assert(out.toSet == Set(("m1", 11L))) // only the spike fires
  }

  test("globalOrdinals: identical to the single-partition row_number, " +
      "dense 1..n, stable across repartitioning") {
    import spark.implicits._
    val df = Seq(("s2", 5L), ("s1", 9L), ("s1", 2L), ("s3", 1L),
      ("s2", 3L), ("s1", 4L)).toDF("src", "id").repartition(5)
    val out = Ranking.globalOrdinals(df, "src", Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val expected = Seq(("s1", 2L), ("s1", 4L), ("s1", 9L), ("s2", 3L),
      ("s2", 5L), ("s3", 1L)).zipWithIndex.map { case (k, i) => k -> (i + 1L) }
    assert(out == expected.toMap)
  }

  test("jsonKeyProfile: key frequencies over ragged JSON, null rows in " +
      "the denominator only") {
    import spark.implicits._
    val df = Seq(Some("""{"a": 1, "b": 2}"""), Some("""{"a": 3}"""),
      Some("""{"c": {"x": 1}}"""), None).toDF("js")
    val out = graft.ingest.Ingest.jsonKeyProfile(df, "js")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      "a" -> ((2L, 4L, 0.5)), "b" -> ((1L, 4L, 0.25)),
      "c" -> ((1L, 4L, 0.25)))) // nested keys are NOT flattened
  }

  test("stickiness: daily user reads 1.0 once the week fills, one-shot " +
      "users dilute the trailing WAU") {
    import spark.implicits._
    import java.sql.Timestamp
    // user 1 active on days 0..9; user 2 only on day 3
    val ev = ((0 to 9).map(d => (1L, Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"))) :+
      (2L, Timestamp.valueOf("2024-01-04 12:00:00"))).toDF("user_id", "ts")
    val out = Journey.stickiness(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val day0 = out.keys.min
    assert(out(day0) == ((1L, 1L, 1.0)))        // only user 1 so far
    assert(out(day0 + 3) == ((2L, 2L, 1.0)))    // both active that day
    assert(out(day0 + 4) == ((1L, 2L, 0.5)))    // user 2 lingers in WAU
    assert(out(day0 + 9) == ((1L, 2L, 0.5)))    // day 3 + 6 = day 9: still in
  }

  test("stickiness: one-shot user leaves the trailing window after 7 days") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = ((0 to 10).map(d =>
      (1L, Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"))) :+
      (2L, Timestamp.valueOf("2024-01-01 12:00:00"))).toDF("user_id", "ts")
    val out = Journey.stickiness(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val day0 = out.keys.min
    assert(out(day0 + 6) == 2L)  // last day user 2 still counts
    assert(out(day0 + 7) == 1L)  // aged out
  }

  test("chiSquareIndependence: independent table reads ~0, determined " +
      "table reads n·min(r,c expansion), dof exact") {
    import spark.implicits._
    // independent: every (a, b) cell has the same count
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 10 } yield (a, b)).toDF("a", "b")
    val i = ABTest.chiSquareIndependence(ind, "a", "b").collect().head
    assert(i.getAs[Long]("dof") == 1L && i.getAs[Long]("chi2_q") == 0L)
    // fully determined 2x2: chi2 = n
    val dep = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val d = ABTest.chiSquareIndependence(dep, "a", "b").collect().head
    assert(d.getAs[Long]("n") == 20L)
    assert(math.abs(d.getAs[Double]("chi2") - 20.0) < 1e-6)
  }

  test("bhSelect: ladder matches literature criticals, statistics " +
      "match a hand ledger, the step-up rule carries borderline ranks") {
    import spark.implicits._
    // A: 50 rows 40 flagged; B,C,D: 50 rows 15 flagged each.
    // Hand ledger (python replay): chi2_q(A)=38363171, chi2_q(B)=4262574;
    // ladder m=4, alpha=.05: 6238532 / 5023886 / 4327558 / 3841458
    // (rank-4 value is the classic 3.8415 chi2_1 critical).
    // B's stat fails its OWN rank-2/3 thresholds but passes rank 4 ->
    // i* = 4 -> BH's STEP-UP rejects ALL FOUR (the behavior that
    // distinguishes it from per-rank step-down).
    def mk(n: Int, f: Int, g: String) =
      (1 to n).map(i => (g, if (i <= f) 1L else 0L))
    val df = (mk(50, 40, "A") ++ mk(50, 15, "B") ++ mk(50, 15, "C") ++
      mk(50, 15, "D")).toDF("g", "f")
    val out = ABTest.bhSelect(df, "g", col("f"), m = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
        r.getLong(7))).toMap
    assert(out("A") == ((50L, 40L, 38363171L, 1L, 6238532L, true, 4L)))
    assert(out("B") == ((50L, 15L, 4262574L, 2L, 5023886L, true, 4L)))
    assert(out("C") == ((50L, 15L, 4262574L, 3L, 4327558L, true, 4L)))
    assert(out("D") == ((50L, 15L, 4262574L, 4L, 3841458L, true, 4L)))
    // identical rates: every one-vs-rest cross term is 0 -> no rejection
    val flat = (mk(50, 10, "A") ++ mk(50, 10, "B") ++ mk(50, 10, "C") ++
      mk(50, 10, "D")).toDF("g", "f")
    val fo = ABTest.bhSelect(flat, "g", col("f"), m = 4).collect()
    assert(fo.forall(r => r.getLong(3) == 0L && !r.getBoolean(6)))
    // degenerate margin: zero flags anywhere -> guarded to 0, no reject
    val none = (mk(50, 0, "A") ++ mk(50, 0, "B")).toDF("g", "f")
    val no = ABTest.bhSelect(none, "g", col("f"), m = 2).collect()
    assert(no.forall(r => r.getLong(3) == 0L && !r.getBoolean(6)))
  }

  test("rocAuc: separation 1.0, reversal 0.0, all-ties 0.5, " +
      "single-class NULL — all exact") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): Option[Double] = {
      val r = Eval.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      if (r.isNullAt(4)) None else Some(r.getDouble(4))
    }
    val pos = (11L to 15L).map((_, 1L)); val neg = (1L to 5L).map((_, 0L))
    assert(auc(pos ++ neg) == Some(1.0))
    assert(auc(pos.map { case (s, _) => (s, 0L) } ++
      neg.map { case (s, _) => (s, 1L) }) == Some(0.0))
    assert(auc(Seq((7L, 1L), (7L, 0L), (7L, 1L), (7L, 0L))) == Some(0.5))
    assert(auc(Seq((1L, 1L), (2L, 1L))).isEmpty)
  }

  test("joinExplosionReport: exact multiplied cardinality per key plus " +
      "the TOTAL row, keys missing on one side contribute nothing") {
    import spark.implicits._
    val left = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("orphan"))
      .toDF("k")
    val right = (Seq.fill(4)("a") ++ Seq.fill(5)("b")).toDF("k")
    val out = Skew.joinExplosionReport(left, "k", right, "k", topK = 5)
      .collect().map(r =>
        (if (r.isNullAt(0)) null else r.getString(0)) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("a") == ((3L, 4L, 12L, 1L)))
    assert(out("b") == ((2L, 5L, 10L, 2L)))
    assert(out(null) == ((5L, 9L, 22L, 0L))) // orphan never joins
  }

  test("twap: duration weighting beats the chatty-period mean, last " +
      "observation carries no weight, singletons drop") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    // value 100 holds for 9s, then three rapid 0s in the last second
    val ev = Seq(
      ("u", t("10:00:00"), 1L, 100L), ("u", t("10:00:09"), 2L, 0L),
      ("u", t("10:00:09.5"), 3L, 0L), ("u", t("10:00:10"), 4L, 0L),
      ("solo", t("10:00:00"), 9L, 42L))
      .toDF("k", "ts", "tie", "x")
    val out = graft.ops.TimeSeries.twap(ev, Seq("k"), "ts", "tie", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    // vdt = 100·9e6; span = 10e6 → twap = 90 (plain mean would be 25)
    assert(out("u") == ((3L, 10000000L, 90.0)))
    assert(!out.contains("solo"))
  }

  test("withinWindowConversion: strict lower bound, inclusive upper " +
      "bound, per-trigger counting") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val ev = Seq(
      // u1: click at 10:00 converts (purchase 10:30 ≤ +1h);
      //     click at 12:00 does NOT (purchase at exactly 12:00 is not
      //     strictly after; next purchase 13:30 beyond the hour)
      (1L, "click", t("10:00:00"), 1L), (1L, "purchase", t("10:30:00"), 2L),
      (1L, "click", t("12:00:00"), 3L), (1L, "purchase", t("12:00:00"), 4L),
      (1L, "purchase", t("13:30:00"), 5L),
      // u2: boundary exactly +1h converts (inclusive)
      (2L, "click", t("09:00:00"), 6L), (2L, "purchase", t("10:00:00"), 7L),
      // u3: clicks, never purchases
      (3L, "click", t("09:00:00"), 8L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Journey.withinWindowConversion(ev, "user_id", "event_type",
      "ts", "event_id", "click", "purchase", 3600L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("prCurve: perfect separation sweeps precision 1.0, recall " +
      "steps by class mass, F1 peaks at the boundary") {
    import spark.implicits._
    val rows = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))
    val out = Eval.prCurve(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out(10L) == ((1L, 0L, 1.0, 0.5)))
    assert(out(9L) == ((2L, 0L, 1.0, 1.0)))   // the perfect threshold
    assert(out(1L) == ((2L, 2L, 0.5, 1.0)))   // everything predicted +
  }

  test("negativeSamples: never an existing edge or self, within the " +
      "node set, deterministic across runs") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val edgeSet = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    def run() = LinkPredict.negativeSamples(edges, "src", "dst", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run()
    assert(out.nonEmpty)
    out.foreach { case (a, b, i) =>
      assert(a != b && i >= 1 && i <= 3)
      val key = (math.min(a, b), math.max(a, b))
      assert(!edgeSet.contains(key), s"sampled a real edge: $key")
      assert((1L to 6L).contains(b))
    }
    assert(run().toSet == out.toSet) // reproducible
  }

  test("deterministicWalks: exact replay of the hash recurrence, walks " +
      "follow edges, sinks end walks early, reruns identical") {
    import spark.implicits._
    // 4 is a sink: any walk stepping into it stops there.
    val edgeSeq = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L))
    val edges = edgeSeq.toDF("src", "dst")
    val (wpn, steps, salt) = (2, 3, "spec-walk")
    def run() = graft.ops.Walks
      .deterministicWalks(edges, "src", "dst", wpn, steps, salt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val out = run()
    // Scala-side replay of the identical recurrence.
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15),
      16)
    val nbrs = edgeSeq.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._2).sorted }
    val expect = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    for (start <- Seq(1L, 2L, 3L); w <- 1L to wpn.toLong) {
      var cur = start
      expect += ((start, w, 0L, cur))
      var alive = true
      (1 to steps).foreach { t =>
        if (alive) nbrs.get(cur) match {
          case Some(ns) =>
            cur = ns((h60(s"$salt:$start:$w:$t") % ns.length).toInt)
            expect += ((start, w, t.toLong, cur))
          case None => alive = false
        }
      }
    }
    assert(out == expect.toSet)
    assert(run() == out) // reproducible
  }

  test("averagePrecisionAtK: hand-derived staircase micros, k cutoff " +
      "divides by min(R,k), relevance-free queries read NULL") {
    import spark.implicits._
    // ranked A(1) B(0) C(1) D(0) E(1): AP = (1 + 2/3 + 3/5)/3
    val rows = Seq(("q", 1L, 1L, 50L), ("q", 2L, 0L, 40L),
      ("q", 3L, 1L, 30L), ("q", 4L, 0L, 20L), ("q", 5L, 1L, 10L),
      ("z", 9L, 0L, 5L))
      .toDF("qid", "i", "r", "s")
    val out = Eval.averagePrecisionAtK(rows, "qid", col("i"), col("r"),
        col("s"), k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // terms: 1e6 + 2e6 div 3 + 3e6 div 5 = 2266666; div 3 = 755555
    assert(out("q") == ((5L, 3L, 755555L)))
    assert(out("z") == ((1L, 0L, -1L)))
    // k=2: only rank-1 term, min(R,k)=2 → 500000
    val cut = Eval.averagePrecisionAtK(rows.filter(col("qid") === "q"),
        "qid", col("i"), col("r"), col("s"), k = 2)
      .collect().head
    assert(cut.getLong(3) == 500000L)
  }

  test("eccentricity: path-graph values, horizon truncation visible " +
      "in n_reached, disconnected components unreached") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
      .toDF("src", "dst")
    val out = graft.ops.Bfs.eccentricity(es, "src", "dst",
        Seq(1L, 3L).toDF("node"), hops = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // seed 1: reaches 2,3,4,5 with ecc 4; seed 3: ecc 2, reaches 4
    assert(out == Map(1L -> ((4L, 4L)), 3L -> ((2L, 4L))))
    // hops=2 truncates seed 1: ecc floor 2, only 2 reached
    val t = graft.ops.Bfs.eccentricity(es, "src", "dst",
        Seq(1L).toDF("node"), hops = 2)
      .collect().head
    assert(t.getLong(1) == 2L && t.getLong(2) == 2L)
  }

  test("cemAtt: hand-derived matched-cell ATT, single-arm cells " +
      "excluded from matching but counted") {
    import spark.implicits._
    val rows = Seq(
      ("A", true, 10L), ("A", true, 20L), ("A", false, 5L),
      ("B", true, 7L),                    // treated-only cell
      ("C", false, 9L))                   // control-only cell
      .toDF("cov", "t", "y")
    val out = graft.ops.Causal.cemAtt(rows, Seq("cov"), col("t"),
      col("y")).collect().head
    // cell A: cm_q = 5e6; num = 30e6 - 2*5e6 = 20e6; att = 10e6
    assert(out.getLong(0) == 3L && out.getLong(1) == 1L)
    assert(out.getLong(2) == 3L && out.getLong(3) == 2L &&
      out.getLong(4) == 1L)
    assert(out.getLong(5) == 10000000L)
    // nothing matched → NULL att
    val none = Seq(("A", true, 1L), ("B", false, 2L)).toDF("cov", "t", "y")
    assert(graft.ops.Causal.cemAtt(none, Seq("cov"), col("t"), col("y"))
      .collect().head.isNullAt(5))
  }

  test("harmonicCentrality: path-graph micros sum 1/d per seed, " +
      "unreachable nodes contribute zero, seeds excluded at d=0") {
    import spark.implicits._
    // path 1-2-3-4 plus isolated pair 9-10; seeds {1, 4}, hops 3
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("src", "dst")
    val out = graft.ops.Bfs.harmonicCentrality(es, "src", "dst",
        Seq(1L, 4L).toDF("node"), hops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node2: d(1)=1, d(4)=2 → 1e6 + 5e5; node3 symmetric;
    // node1: d(4)=3 → 333333; node4: d(1)=3 → 333333; 9/10 absent
    assert(out == Map(
      2L -> 1500000L, 3L -> 1500000L, 1L -> 333333L, 4L -> 333333L))
  }

  test("robustDecompose: a 10x spike leaves the median trend untouched " +
      "and lands wholly in the residual; truncated edges pick lower " +
      "medians") {
    import spark.implicits._
    val rows = Seq(10L, 10L, 100L, 10L, 10L, 10L).zipWithIndex
      .map { case (v, t) => ("k", t.toLong, v) }
    val out = graft.ops.TimeSeries.robustDecompose(
        rows.toDF("key", "t", "x"), "key", "t", col("x"),
        period = 2, trendWindow = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    (0L to 5L).foreach { t =>
      val (trend, seasonal, resid) = out(t)
      assert(trend == 10L && seasonal == 0L)
      assert(resid == (if (t == 2L) 90L else 0L))
    }
  }

  test("kTruss: supports counted per edge, peel cascades, K4 is its " +
      "own 4-truss, untriangled edges drop immediately") {
    import spark.implicits._
    def truss(es: Seq[(Long, Long)], k: Int) = graft.ops.Truss
      .kTruss(es.toDF("src", "dst"), "src", "dst", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // two triangles sharing edge (1,2), plus pendant (1,5)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (2L, 4L),
      (5L, 1L))
    assert(truss(g, 3) == Map((1L, 2L) -> 2L, (2L, 3L) -> 1L,
      (1L, 3L) -> 1L, (1L, 4L) -> 1L, (2L, 4L) -> 1L))
    // k=4: only (1,2) has support 2, but alone it closes nothing →
    // the cascade empties the graph
    assert(truss(g, 4) == Map.empty)
    // K4: every edge in exactly 2 triangles → its own 4-truss
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(truss(k4, 4).values.toSeq.sorted == Seq.fill(6)(2L))
  }

  test("betweenness: hand-derived path-graph deltas, diamond splits " +
      "credit over equal shortest paths, seeds excluded at their rows") {
    import spark.implicits._
    def bc(es: Seq[(Long, Long)], seeds: Seq[Long], hops: Int) =
      graft.ops.Betweenness.fromSeeds(es.toDF("src", "dst"), "src",
        "dst", seeds.toDF("node"), hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // path 1-2-3-4-5 from seed 1: delta = 3e6, 2e6, 1e6 along the chain
    assert(bc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L), 4) ==
      Map(2L -> 3000000L, 3L -> 2000000L, 4L -> 1000000L))
    // diamond 1-{2,3}-4: sigma(4)=2, each middle node gets 1e6/2
    assert(bc(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), Seq(1L), 2) ==
      Map(2L -> 500000L, 3L -> 500000L))
    // both endpoints as seeds: middle credit doubles, endpoints 0
    assert(bc(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)),
      Seq(1L, 4L), 2) ==
      Map(2L -> 1000000L, 3L -> 1000000L))
  }

  test("bCubed: hand-derived per-item precision/recall, perfect " +
      "clustering reads exactly 1.0") {
    import spark.implicits._
    // C1={1,2,3} C2={4,5} vs G1={1,2,4} G2={3,5}
    val rows = Seq(("C1", "G1"), ("C1", "G1"), ("C1", "G2"),
      ("C2", "G1"), ("C2", "G2")).toDF("c", "g")
    val out = graft.ops.Eval.bCubed(rows, "c", "g").collect().head
    // p_q = 4e6 div 3 + 1e6 div 3 + 1e6 div 2 + 1e6 div 2 = 2666666
    assert(out.getLong(0) == 5L)
    assert(out.getLong(1) == 2666666L && out.getLong(2) == 2666666L)
    assert(out.getDouble(3) == 2666666.0 / 5 / 1000000.0)
    val perfect = Seq(("A", "X"), ("A", "X"), ("B", "Y"))
      .toDF("c", "g")
    val p = graft.ops.Eval.bCubed(perfect, "c", "g").collect().head
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 1.0 &&
      p.getDouble(5) == 1.0)
  }

  test("greedySelect: hand-derived marginal gains, early stop on zero " +
      "gain, ties to smallest source") {
    import spark.implicits._
    val pairs = Seq(
      "s1" -> "a", "s1" -> "b", "s1" -> "c", "s1" -> "d",
      "s2" -> "c", "s2" -> "d", "s2" -> "e",
      "s3" -> "e", "s3" -> "f",
      "s4" -> "a").toDF("src", "unit")
    // round 1: s1 covers 4; round 2: s3 adds {e,f}=2 (s2 adds only e);
    // round 3: nothing left → stop before k
    val out = graft.ops.Coverage.greedySelect(pairs, "src", "unit", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq((1L, "s1", 4L, 4L), (2L, "s3", 2L, 6L)))
    // tie on gain → lexicographically smallest source
    val tied = Seq("t2" -> "x", "t2" -> "y", "t1" -> "p", "t1" -> "q")
      .toDF("src", "unit")
    val t = graft.ops.Coverage.greedySelect(tied, "src", "unit", k = 1)
      .collect().head
    assert(t.getString(1) == "t1")
  }

  test("kneserNey: hand-derived probabilities, contexts sum to a " +
      "proper simplex over the full vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = graft.text.LangModel.kneserNey(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // bigrams: (a,b)x2 (b,a)x2 (a,c)x1; c1: a->3 b->2; n1f: a->2 b->1;
    // n1b: a->1 b->1 c->1; n1tot=3
    assert(out(("a", "b")) ==
      ((2L, 3L, 2L, 1L, 5.0 / (4 * 3) + (3.0 * 2) / (4 * 3) * (1.0 / 3))))
    assert(out(("b", "a")) ==
      ((2L, 2L, 1L, 1L, 5.0 / (4 * 2) + (3.0 * 1) / (4 * 2) * (1.0 / 3))))
    assert(out(("a", "c")) ==
      ((1L, 3L, 2L, 1L, 1.0 / (4 * 3) + (3.0 * 2) / (4 * 3) * (1.0 / 3))))
    // simplex: P(b|a) + P(c|a) + P_unseen(a|a) = 1 (interpolated KN
    // allocates ALL discounted mass); unseen term = D·n1f/c1 · cont(a)
    val pUnseenAGivenA = (3.0 * 2) / (4 * 3) * (1.0 / 3)
    val simplex = out(("a", "b"))._5 + out(("a", "c"))._5 + pUnseenAGivenA
    assert(math.abs(simplex - 1.0) < 1e-12)
  }

  test("boruvka: hand-derived MST, cycle edges excluded, forests " +
      "handled, (w,a,b) tie-break, parallel edges collapse to min") {
    import spark.implicits._
    def mst(es: Seq[(Long, Long, Long)]) = graft.ops.Mst
      .boruvka(es.toDF("src", "dst", "w"), "src", "dst", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Kruskal by hand: (1,2,1) (2,3,2) keep; (1,3,3) cycle;
    // (3,4,4) (4,5,5) keep; (2,5,7) cycle.
    assert(mst(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L), (3L, 4L, 4L),
      (4L, 5L, 5L), (2L, 5L, 7L))) ==
      Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 4L), (4L, 5L, 5L)))
    // forest: two components, one tree each
    assert(mst(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 5L),
      (10L, 11L, 9L))) ==
      Set((1L, 2L, 1L), (2L, 3L, 2L), (10L, 11L, 9L)))
    // all-equal weights: (w,a,b) order keeps (1,2) and (1,3)
    assert(mst(Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L))) ==
      Set((1L, 2L, 5L), (1L, 3L, 5L)))
    // parallel edges (both directions) collapse to the min weight
    assert(mst(Seq((1L, 2L, 4L), (2L, 1L, 3L))) == Set((1L, 2L, 3L)))
  }

  test("calibrationCurve: perfectly calibrated bins read ece 0, an " +
      "overconfident bin pays exactly its gap, p=1.0 lands in the top bin") {
    import spark.implicits._
    val rows =
      // bin 2 (p=0.25): 4 rows, 1 positive → acc = conf = 0.25
      Seq.fill(3)((250000L, 0L)) ++ Seq(((250000L, 1L))) ++
      // bin 9 via clamp (p=1.0): 2 rows, 1 positive → overconfident
      Seq((1000000L, 1L), (1000000L, 0L))
    val out = Eval.calibrationCurve(rows.toDF("p", "y"), col("p"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(out(2L) == ((4L, 0.25, 0.25, 0L)))
    // |1e6·1 − 2e6| = 1e6 = n_b·1e6·|0.5 − 1.0|
    assert(out(9L) == ((2L, 1.0, 0.5, 1000000L)))
    assert(out.keySet == Set(2L, 9L))
  }

  test("isotonicCalibration: adjacent violators pool to their weighted " +
      "mean, monotone rates pass through, pooling respects weights") {
    import spark.implicits._
    def mk(binP: Long, n: Int, pos: Int): Seq[(Long, Long)] =
      Seq.fill(pos)((binP, 1L)) ++ Seq.fill(n - pos)((binP, 0L))
    // raw rates by bin: 0→0.1, 1→0.6, 2→0.4, 3→0.9; PAVA pools bins
    // 1,2 (equal weight 10) to 10/20 = 0.5 and leaves the rest alone.
    val rows = mk(50000L, 10, 1) ++ mk(150000L, 10, 6) ++
      mk(250000L, 10, 4) ++ mk(350000L, 10, 9)
    val out = Eval.isotonicCalibration(rows.toDF("p", "y"),
        col("p"), col("y"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out(0L) == ((0.1, 0.1)))
    assert(out(1L) == ((0.6, 0.5)))
    assert(out(2L) == ((0.4, 0.5)))
    assert(out(3L) == ((0.9, 0.9)))

    // weighted pool: (n=2, rate 1.0) then (n=6, rate 0.0) → 2/8 = 0.25
    val w = mk(50000L, 2, 2) ++ mk(150000L, 6, 0)
    val wOut = Eval.isotonicCalibration(w.toDF("p", "y"), col("p"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(wOut == Map(0L -> 0.25, 1L -> 0.25))

    // already monotone: fitted == rate everywhere
    val mono = mk(50000L, 5, 1) ++ mk(150000L, 5, 3) ++ mk(250000L, 5, 5)
    Eval.isotonicCalibration(mono.toDF("p", "y"), col("p"), col("y"))
      .collect().foreach(r => assert(r.getDouble(3) == r.getDouble(4)))
  }

  test("giniByGroup: uniform reads 0, single-holder reads (n-1)/n, " +
      "zero-mass group gets NULL") {
    import spark.implicits._
    val rows =
      (1L to 8L).map(u => ("uniform", u, 5L)) ++
      (("mono", 1L, 80L) +: (2L to 8L).map(u => ("mono", u, 0L))) ++
      (1L to 4L).map(u => ("zero", u, 0L))
    val out = Quantiles.giniByGroup(rows.toDF("g", "u", "v"), Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out("uniform") == ((8L, Some(0.0))))
    assert(out("mono") == ((8L, Some(7.0 / 8.0))))
    assert(out("zero") == ((4L, None)))
  }

  test("lifetimeSurvival: hand spans produce the descending cumulative " +
      "curve with exact fractions") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: 0-day span; users 2,3: 2-day span; user 4: 5-day span
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (2L, t("2024-01-01 00:00:00")), (2L, t("2024-01-03 00:00:00")),
      (3L, t("2024-01-02 08:00:00")), (3L, t("2024-01-04 08:00:00")),
      (4L, t("2024-01-01 00:00:00")), (4L, t("2024-01-06 00:00:00")))
      .toDF("user_id", "ts")
    val out = Journey.lifetimeSurvival(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) == ((1L, 4L, 1.0)))
    assert(out(2L) == ((2L, 3L, 0.75)))
    assert(out(5L) == ((1L, 1L, 0.25)))
  }

  test("linearTrend: exact fit on a noiseless line, degenerate single " +
      "point yields NULL") {
    import spark.implicits._
    val series = ((1L to 10L).map(t => ("line", t, 3 * t + 7)) :+
      ("pt", 5L, 42L)).toDF("k", "t", "x")
    val out = TimeSeries.linearTrend(series, Seq("k"), "t", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out("line") == ((10L, Some(3.0), Some(7.0))))
    assert(out("pt") == ((1L, None, None)))
  }

  test("changepoint: planted level shift found at its exact boundary " +
      "with near-total gain; flat-noise series gains little") {
    import spark.implicits._
    // 20 points at 100, then 20 at 500 → boundary b = 20
    val series = (((1L to 20L).map(t => ("shift", t, 100L)) ++
      (21L to 40L).map(t => ("shift", t, 500L))) ++
      (1L to 40L).map(t => ("flat", t, 100L + (t % 2)))).toDF("k", "t", "x")
    val out = TimeSeries.changepoint(series, Seq("k"), "t", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(5)))).toMap
    assert(out("shift")._1 == 20L)
    assert(out("shift")._2 > 0.999)
    assert(out("flat")._2 < 0.1)
  }

  test("weightedDistances: a heavier direct edge loses to a lighter " +
      "two-hop route within the horizon") {
    import spark.implicits._
    // 1-3 direct costs 10; 1-2-3 costs 2+3 = 5
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
      .toDF("src", "dst", "w")
    val out = Bfs.weightedDistances(edges, "src", "dst", "w",
      Seq(1L).toDF("node"), hops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("fdViolations: multi-valued RHS flagged with NULL counted as a " +
      "value, clean keys silent") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")), (1L, Some("a")),          // clean
      (2L, Some("a")), (2L, Some("b")),          // violation: 2 values
      (3L, Some("x")), (3L, None)                // violation: {x, NULL}
    ).toDF("k", "r")
    val out = Integrity.fdViolations(df, Seq("k"), "r")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map(2L -> ((2L, 2L)), 3L -> ((2L, 2L))))
  }

  test("kHopDistances: path graph truncates at the horizon, diamond " +
      "takes the shortest route, disconnected nodes absent") {
    import spark.implicits._
    // path 1-2-3-4-5, diamond shortcut 1-6, 6-4, island 9-10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (1L, 6L), (6L, 4L), (9L, 10L)).toDF("src", "dst")
    val out = Bfs.kHopDistances(edges, "src", "dst",
      Seq(1L).toDF("node"), hops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 is reachable in 2 via the diamond (1-6-4), not 3 via the path
    assert(out == Map(1L -> 0L, 2L -> 1L, 6L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("decayedSum: exact power-of-two weights per half-life bucket, " +
      "horizon cutoff, future events clamp to full weight") {
    import spark.implicits._
    import java.sql.Timestamp
    val asOf = Timestamp.valueOf("2024-01-10 00:00:00")
    val asOfMicros = asOf.getTime * 1000L
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      ("k", t("2024-01-09 23:59:59"), 100L),  // bucket 0 → weight 1
      ("k", t("2024-01-08 23:59:59"), 100L),  // 1 day + 1s → bucket 1 → 1/2
      ("k", t("2023-12-01 00:00:00"), 100L),  // 40 days → beyond horizon
      ("k", t("2024-01-10 05:00:00"), 100L))  // future → clamp bucket 0
      .toDF("key", "ts", "cents")
    val out = graft.ops.TimeSeries.decayedSum(ev, Seq("key"), "ts",
      "cents", asOfMicros, halflifeSeconds = 86400L, maxBuckets = 20)
      .collect().head
    assert(out.getAs[Long]("n_events") == 4L)
    assert(out.getAs[Long]("n_live") == 3L)
    assert(out.getAs[Double]("decayed") == 100.0 + 50.0 + 0.0 + 100.0)
  }

  test("proportionTest: hand counts give the textbook z, empty and " +
      "all-converting cells yield NULL verdicts") {
    import spark.implicits._
    // group g: arm A 4 trials 1 conv, arm B 4 trials 3 conv
    val rows =
      (1 to 4).map(i => ("g", false, i == 1)) ++
      (1 to 4).map(i => ("g", true, i <= 3)) ++
      // group empty_b: only arm A rows
      (1 to 3).map(_ => ("empty_b", false, true)) ++
      // group all_conv: both arms convert 100% → zero pooled variance
      Seq(("all_conv", false, true), ("all_conv", true, true))
    val out = ABTest.proportionTest(rows.toDF("g", "b", "c"),
      Seq("g"), col("b"), col("c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(7)) None else Some(r.getDouble(7))))).toMap
    val (na, ca, nb, cb, z) = out("g")
    assert((na, ca, nb, cb) == ((4L, 1L, 4L, 3L)))
    // pooled p = 0.5 → se = sqrt(0.25 * 0.5) ≈ 0.35355; z = 0.5/se
    assert(math.abs(z.get - 0.5 / math.sqrt(0.125)) < 1e-12)
    assert(out("empty_b")._5.isEmpty && out("all_conv")._5.isEmpty)
  }

  test("psiDrift: identical batches read zero PSI, a planted shift " +
      "reads positive, empty bins survive via smoothing") {
    import spark.implicits._
    val ref = (1L to 1000L).toDF("v")
    val same = (1L to 1000L).toDF("v")
    // shifted: all mass in the top decile of the reference range
    val shifted = (901L to 1000L).map(v => Seq.fill(10)(v)).flatten.toDF("v")
    val qs = (1 to 9).map(i => (i, 10))
    def psi(cur: org.apache.spark.sql.DataFrame) =
      Profiling.psiDrift(ref, cur, col("v"), qs)
        .agg(sum("term_q")).collect().head.getLong(0)
    assert(psi(same) == 0L)
    assert(psi(shifted) > 1000000L, s"shift must dominate: ${psi(shifted)}")
  }

  test("mannKendall: monotone series hit ±max S, shuffled-flat reads " +
      "no_trend, n recovered exactly") {
    import spark.implicits._
    val series = (
      (1L to 20L).map(t => ("up", t, t * 3)) ++
      (1L to 20L).map(t => ("down", t, 100L - t)) ++
      (1L to 20L).map(t => ("flat", t, 5L))
    ).toDF("k", "t", "x")
    val out = TimeSeries.mannKendall(series, Seq("k"), "t", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5)))).toMap
    val maxS = 20L * 19L / 2L
    val var18 = 20L * 19L * 45L
    assert(out("up") == ((20L, maxS, var18, "increasing")))
    assert(out("down") == ((20L, -maxS, var18, "decreasing")))
    assert(out("flat") == ((20L, 0L, var18, "no_trend")))
  }

  test("mannKendall: duplicate t values per key keep n exact (counted, " +
      "not inverted from n_pairs) and same-time pairs add 0 to S") {
    import spark.implicits._
    // 5 points, two sharing t=2: n_pairs = 9 < C(5,2) = 10, so the old
    // sqrt inversion would read n = (1+sqrt(73))/2 = 4 (truncated)
    val series = Seq(
      ("dup", 1L, 1L), ("dup", 2L, 2L), ("dup", 2L, 3L),
      ("dup", 3L, 4L), ("dup", 4L, 0L)).toDF("k", "t", "x")
    val out = TimeSeries.mannKendall(series, Seq("k"), "t", "x").head()
    assert(out.getAs[Long]("n") == 5L)
    assert(out.getAs[Long]("var18") == 5L * 4L * 15L)
    // strict t1<t2 pairs: 5 rises, 4 falls -> S = +1
    assert(out.getAs[Long]("s_stat") == 1L)
  }

  test("mannKendall: the documented per-key cap magnitude (n = 4096, " +
      "~8.4M pair rows in one key) runs exact — the pair-ledger gate") {
    import spark.implicits._
    // sawtooth: x = t for even t, x = -t for odd t. S has a closed
    // form: pairs (i<j) with both even or both odd are concordant with
    // sign +1 and -1 respectively (equal counts cancel to 0 with n
    // even); mixed pairs compare t2 vs -t1 style signs — brute-check
    // a small prefix, then assert the big run agrees with the exact
    // pairwise definition computed locally.
    val n = 4096
    val xs = (1 to n).map(t => (t.toLong, if (t % 2 == 0) t.toLong else -t.toLong))
    val series = xs.map { case (t, x) => ("big", t, x) }.toDF("k", "t", "x")
    var sLocal = 0L
    var i = 0
    while (i < n) { // O(n^2) local reference — 8.4M sign compares
      var j = i + 1
      while (j < n) {
        sLocal += java.lang.Long.signum(xs(j)._2 - xs(i)._2); j += 1
      }
      i += 1
    }
    val out = TimeSeries.mannKendall(series, Seq("k"), "t", "x").head()
    assert(out.getAs[Long]("n") == n.toLong)
    assert(out.getAs[Long]("s_stat") == sLocal)
    assert(out.getAs[Long]("var18") == n.toLong * (n - 1L) * (2L * n + 5L))
  }

  test("ndcgAtK: perfect ranking 1.0, worst ranking below it, " +
      "zero-relevance NULL, k truncates") {
    import spark.implicits._
    // qA: score order == relevance order → dcg = idcg.
    // qB: score order EXACTLY inverts relevance → dcg < idcg.
    // qC: all relevance 0 → idcg 0 → ndcg NULL.
    val rows = Seq(
      ("qA", 1L, 3L, 30L), ("qA", 2L, 2L, 20L), ("qA", 3L, 0L, 10L),
      ("qB", 1L, 3L, 10L), ("qB", 2L, 2L, 20L), ("qB", 3L, 0L, 30L),
      ("qC", 1L, 0L, 5L), ("qC", 2L, 0L, 4L))
      .toDF("q", "i", "r", "s")
    val out = Eval.ndcgAtK(rows, "q", col("i"), col("r"), col("s"), k = 10)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3), Option(x.get(4))))).toMap
    assert(out("qA")._1 == out("qA")._2 && out("qA")._3.contains(1.0))
    assert(out("qB")._1 < out("qB")._2)
    assert(out("qC") == ((0L, 0L, None)))
    // k=1 keeps only the top position: qA dcg = 3 * (1e6 div blog(2))
    val k1 = Eval.ndcgAtK(rows, "q", col("i"), col("r"), col("s"), k = 1)
      .filter(col("q") === "qA").head()
    assert(k1.getLong(2) == 3L * (1000000L / 2L))
  }

  test("skylineMax: dominated points drop, frontier is the staircase, " +
      "equal-x collapses to max y with multiplicity") {
    import spark.implicits._
    val pts = Seq(
      (5L, 10L), (5L, 7L),  // (5,7) dominated at equal x
      (3L, 20L),            // frontier: more y, less x
      (4L, 15L), (2L, 19L), // dominated by (5,10)? no — (4,15) has
                            // y>10: frontier; (2,19) dominated by (3,20)
      (5L, 10L),            // duplicate frontier point → n_at 2
      (1L, 1L))             // dominated
      .toDF("x", "y")
    val out = Pareto.skylineMax(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((5L, 10L, 2L), (4L, 15L, 1L), (3L, 20L, 1L)))
  }

  test("modularity: two disjoint triangles score Q = 0.5, " +
      "one clique scores Q = 0") {
    import spark.implicits._
    val twoTriangles = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val out = PageRank.modularity(twoTriangles, "src", "dst")
      .collect()
    // LPA on a triangle converges to the min label per component;
    // m = 6, per community m_c = 3, d_c = 6 → q_num = 72 − 36 = 36,
    // contribution 36/144 = 0.25 each, Q = 0.5.
    assert(out.length == 2)
    assert(out.forall(r => r.getLong(1) == 3L && r.getLong(2) == 6L &&
      r.getLong(3) == 3L && r.getLong(4) == 36L))
    assert(math.abs(out.map(_.getDouble(5)).sum - 0.5) < 1e-12)
    // One community holding everything: Q = m_c/m − 1 = 0 exactly.
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val one = PageRank.modularity(clique, "src", "dst").collect()
    assert(one.length == 1 && one.head.getLong(4) == 0L)
  }

  test("targetEncodeLoo: self excluded from the mean, singleton NULL") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L))
      .toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(rows, "cat", "id", col("y"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("loo_mean"))).toMap
    assert(out(1L).contains(25.0)) // (20+30)/2
    assert(out(2L).contains(20.0)) // (10+30)/2
    assert(out(3L).contains(15.0)) // (10+20)/2
    assert(out(4L).isEmpty)        // singleton category
  }

  test("intervalGaps: one gap per island pair, overlapping inputs merge " +
      "first, fully-covered key yields no rows") {
    import spark.implicits._
    val iv = Seq(
      ("u1", 0L, 10L), ("u1", 5L, 12L), ("u1", 20L, 30L), ("u1", 40L, 41L),
      ("u2", 0L, 5L), ("u2", 5L, 9L)) // touching → one island, no gap
      .toDF("k", "s", "e")
    val out = RangeJoin.intervalGaps(iv, Seq("k"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(("u1", 12L, 20L, 8L), ("u1", 30L, 40L, 10L)))
  }

  test("attribution: first/last to the right touches, linear splits, " +
      "out-of-window touch ignored") {
    import spark.implicits._
    // u1: touches A@1s B@2s, conversion @3s (window 10s) → n=2;
    // an A@-100s touch is outside the window; u2: single touch C.
    val ev = Seq(
      (11L, "A", "2024-01-01 00:00:01", 1L),
      (12L, "B", "2024-01-01 00:00:02", 1L),
      (13L, "buy", "2024-01-01 00:00:03", 1L),
      (10L, "A", "2023-12-31 23:00:00", 1L),
      (21L, "C", "2024-01-01 00:00:05", 2L),
      (22L, "buy", "2024-01-01 00:00:06", 2L))
      .toDF("id", "typ", "ts", "uid")
      .select(col("uid"), col("typ"), col("ts").cast("timestamp").as("ts"),
        col("id"))
    val out = Journey.attribution(ev, "uid", "typ", "ts", "id",
        conversionType = "buy", windowSeconds = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") == ((1L, 1000000L, 0L, 500000L)))
    assert(out("B") == ((1L, 0L, 1000000L, 500000L)))
    assert(out("C") == ((1L, 1000000L, 1000000L, 1000000L)))
  }

  test("diffInDiff: planted cell means recover the known effect, " +
      "empty cell nulls the estimate") {
    import spark.implicits._
    val rows =
      Seq.fill(3)((true, false, 10L)) ++ Seq.fill(3)((true, true, 25L)) ++
      Seq.fill(2)((false, false, 5L)) ++ Seq.fill(2)((false, true, 8L))
    val out = Causal.diffInDiff(rows.toDF("t", "p", "y"),
      col("t"), col("p"), col("y")).head()
    assert(out.getAs[Double]("mean_t1") == 25.0 &&
      out.getAs[Double]("mean_c0") == 5.0)
    assert(out.getAs[Double]("did") == 12.0) // (25−10) − (8−5)
    val missing = Causal.diffInDiff(
      rows.filterNot(r => r._1 && r._2).toDF("t", "p", "y"),
      col("t"), col("p"), col("y")).head()
    assert(missing.isNullAt(missing.fieldIndex("did")))
  }

  test("liftTable: two-tile planted lift/gain, base rate recovers") {
    import spark.implicits._
    val rows = (1 to 10).map(i => (100L, if (i <= 8) 1L else 0L)) ++
      (1 to 10).map(i => (50L, if (i <= 2) 1L else 0L))
    val out = Eval.liftTable(rows.toDF("s", "y"), col("s"), col("y"),
        tiles = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getDouble(6)))).toMap
    assert(out(0L) == ((10L, 8L, 0.8, 1.6, 8L, 0.8)))
    assert(out(1L) == ((10L, 2L, 0.2, 0.4, 10L, 1.0)))
  }

  test("rendezvousAssign: in-range, deterministic under repartitioning; " +
      "stability moves roughly 1/9 on 8 to 9") {
    import spark.implicits._
    val ids = (1L to 1000L).toDF("id")
    val a = Sharding.rendezvousAssign(ids, "id", 8)
    assert(a.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    val b = Sharding.rendezvousAssign(ids.repartition(7), "id", 8)
    assert(a.join(b.withColumnRenamed("shard", "s2"), "id")
      .filter(col("shard") =!= col("s2")).count() == 0)
    val stab = Sharding.rendezvousStability(ids, "id", 8, 9)
      .agg(sum("n_docs"), sum("n_moved")).head()
    assert(stab.getLong(0) == 1000L)
    val moved = stab.getLong(1)
    assert(moved > 0 && moved < 350, s"moved=$moved") // ≈ 1000/9 ± noise
  }

  test("shardLayout: per-shard positions are a contiguous permutation, " +
      "deterministic under repartitioning, salt-keyed") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, i * 10)).toDF("id", "tok")
    val out = Sharding.shardLayout(docs, "id", col("tok"), 8, "s1")
    // every doc exactly once, tokens carried
    assert(out.count() == 500L &&
      out.select("id").distinct().count() == 500L)
    assert(out.filter(col("n_tokens") =!= col("id") * 10).count() == 0)
    // positions within a shard are exactly 1..size
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() == 0)
    // deterministic under physical layout changes
    val again = Sharding.shardLayout(docs.repartition(7), "id",
      col("tok"), 8, "s1").withColumnRenamed("pos", "p2")
      .withColumnRenamed("shard", "sh2")
    assert(out.join(again, "id")
      .filter(col("pos") =!= col("p2") || col("shard") =!= col("sh2"))
      .count() == 0)
    // a different salt is a different permutation
    val other = Sharding.shardLayout(docs, "id", col("tok"), 8, "s2")
      .withColumnRenamed("pos", "p2").withColumnRenamed("shard", "sh2")
    assert(out.join(other, "id")
      .filter(col("pos") =!= col("p2") || col("shard") =!= col("sh2"))
      .count() > 0)
  }

  test("curriculumShardLayout: shards match shardLayout, buckets are " +
      "staged within shard, within-bucket order is hash-sequence-stable") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, i * 10, (i % 3))).toDF("id", "tok", "q")
    val cur = Sharding.curriculumShardLayout(docs, "id", col("tok"),
      col("q"), 8, "s1")
    val plain = Sharding.shardLayout(docs, "id", col("tok"), 8, "s1")
    // identical shard assignment (same salt -> same hash)
    assert(cur.select("id", "shard").except(
      plain.select("id", "shard")).count() == 0)
    // positions within a shard are exactly 1..size
    val bad = cur.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() == 0)
    // bucket is monotone non-decreasing along pos within every shard
    val rows = cur.collect().map(r =>
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(0)))
    for ((_, sh) <- rows.groupBy(_._1)) {
      val byPos = sh.sortBy(_._2)
      assert(byPos.map(_._3).toSeq == byPos.map(_._3).sorted.toSeq,
        "curriculum stages out of order within a shard")
    }
    // sequence stability: within one (shard, bucket) the relative order
    // is exactly shardLayout's hash order restricted to that bucket
    val plainPos = plain.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((_, grp) <- rows.groupBy(r => (r._1, r._3))) {
      val byCurPos = grp.sortBy(_._2).map(_._4).toSeq
      val byPlain = grp.sortBy(r => plainPos(r._4)._2).map(_._4).toSeq
      assert(byCurPos == byPlain, "within-bucket hash order not preserved")
    }
    // deterministic under physical layout changes
    val again = Sharding.curriculumShardLayout(docs.repartition(7), "id",
      col("tok"), col("q"), 8, "s1")
      .withColumnRenamed("pos", "p2").withColumnRenamed("shard", "sh2")
      .select("id", "sh2", "p2")
    assert(cur.join(again, "id")
      .filter(col("pos") =!= col("p2") || col("shard") =!= col("sh2"))
      .count() == 0)
  }

  test("interleaveAudit: stride keys hold every block within one doc " +
      "of the target share; totals reconcile") {
    import spark.implicits._
    // sources of 64 and 32 docs, 8 blocks: widths divide exactly, so
    // every block must hold EXACTLY 8 of 'a' and 4 of 'b'
    val docs = ((1L to 64L).map(i => ("a", i)) ++
      (1L to 32L).map(i => ("b", i + 1000))).toDF("src", "id")
    val out = Sharding.interleaveAudit(docs, "src", "id", 8, "ilv")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == 16)
    for (b <- 0L to 7L) {
      assert(out((b, "a")) == ((8L, 12L, 64L, 0L)), s"block $b src a")
      assert(out((b, "b")) == ((4L, 12L, 32L, 0L)), s"block $b src b")
    }
    // ragged sizes: deviation stays within one doc per block
    val ragged = ((1L to 61L).map(i => ("a", i)) ++
      (1L to 29L).map(i => ("b", i + 1000))).toDF("src", "id")
    val r2 = Sharding.interleaveAudit(ragged, "src", "id", 8, "ilv")
      .collect()
    // |n_bs - n_s/nBlocks| <= 1  <=>  |n_bs*8 - n_s| <= 8
    assert(r2.forall(r =>
      math.abs(r.getLong(2) * 8 - r.getLong(4)) <= 8))
    // per-source totals reconcile
    val sums = r2.groupBy(_.getString(1))
      .map { case (s, rows) => s -> rows.map(_.getLong(2)).sum }
    assert(sums == Map("a" -> 61L, "b" -> 29L))
    // banded mega-key-safe ranks: every band count yields the identical
    // audit (bands=1 degenerates to the single-window form)
    def auditAt(bands: Int) = Sharding
      .interleaveAudit(ragged, "src", "id", 8, "ilv", bands)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(auditAt(1) == auditAt(64) && auditAt(64) == auditAt(4096))
    def tokAuditAt(bands: Int) = Sharding
      .interleaveTokensAudit(ragged, "src", "id",
        (col("id") % 7 + 1), 8, "ilv", bands)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(tokAuditAt(1) == tokAuditAt(64))
  }

  test("clusteringDepthHistogram: endpoint sweep matches a hand-drawn " +
      "overlap profile; disjoint files read depth 1") {
    import spark.implicits._
    import graft.ops.Layout
    // files A[0,10], B[5,15], C[20,30]:
    //   [0,5) depth 1, [5,11) depth 2, [11,16) depth 1, gap, [20,31) 1
    val rows = Seq(("A", 0L), ("A", 10L), ("B", 5L), ("B", 15L),
      ("C", 20L), ("C", 30L)).toDF("f", "k")
    val out = Layout.clusteringDepthHistogram(rows, col("f"), col("k"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out == Map(1L -> ((3L, 21L)), 2L -> ((1L, 6L))))
    // perfectly clustered: disjoint files never exceed depth 1
    val disjoint = Seq(("A", 0L), ("A", 9L), ("B", 10L), ("B", 19L))
      .toDF("f", "k")
    val d2 = Layout.clusteringDepthHistogram(disjoint, col("f"), col("k"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(d2 == Map(1L -> ((2L, 20L))))
  }

  test("interleaveTokensAudit: every block's token mass stays within " +
      "one document of the source's target share; totals reconcile") {
    import spark.implicits._
    // source a: 40 docs of 10 tokens (T=400); source b: 10 docs of 37
    // tokens (T=370) — doc-count striding would misplace b's mass.
    val docs = ((1L to 40L).map(i => ("a", i, 10L)) ++
      (1L to 10L).map(i => ("b", i + 1000, 37L)))
      .toDF("src", "id", "tok")
    val out = Sharding.interleaveTokensAudit(docs, "src", "id",
      col("tok"), 8, "ilv").collect()
    // bound: |t_bs * nBlocks - t_s| <= nBlocks * max_tok per source
    for (r <- out) {
      val (src, tbs, ts) = (r.getString(1), r.getLong(2), r.getLong(4))
      val maxTok = if (src == "a") 10L else 37L
      assert(math.abs(tbs * 8 - ts) <= 8 * maxTok,
        s"block ${r.getLong(0)} src $src t_bs=$tbs t_s=$ts")
    }
    // per-source token totals reconcile
    val sums = out.groupBy(_.getString(1))
      .map { case (s, rows) => s -> rows.map(_.getLong(2)).sum }
    assert(sums == Map("a" -> 400L, "b" -> 370L))
    // zero-token docs are excluded, not NaN keys
    val withZero = docs.union(Seq(("a", 9999L, 0L)).toDF("src", "id", "tok"))
    val z = Sharding.interleaveTokensAudit(withZero, "src", "id",
      col("tok"), 8, "ilv").collect()
    assert(z.map(_.getLong(2)).sum == 770L)
  }

  test("contrastiveBatchAudit: planted identical pair collides in the " +
      "single batch; orthogonal fill does not") {
    import spark.implicits._
    // 6 vectors: ids 1,2 identical direction; 3..6 mutually orthogonal
    def unit(k: Int): Seq[Double] =
      (0 until 8).map(i => if (i == k) 1.0 else 0.0)
    val vecs = Seq(
      (1L, unit(0)), (2L, unit(0)),
      (3L, unit(1)), (4L, unit(2)), (5L, unit(3)), (6L, unit(4)))
      .toDF("id", "ev")
    val out = graft.similarity.Similarity.contrastiveBatchAudit(
      vecs, nShards = 1, batchSize = 6, minCosine = 0.95, salt = "cb")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 6L && r.getLong(2) == 15L)
    assert(r.getLong(3) == 1L, "exactly the planted pair collides")
    assert(r.getDouble(4) > 0.999)
    // batch chunking: 6 items, B=3, one shard -> two full batches,
    // 3 pairs each
    val chunked = graft.similarity.Similarity.contrastiveBatchAudit(
      vecs, nShards = 1, batchSize = 3, minCosine = 0.95, salt = "cb")
      .collect()
    assert(chunked.length == 2)
    assert(chunked.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L))
  }

  test("availability: overlaps never double-count, gaps reduce the " +
      "ratio exactly") {
    import spark.implicits._
    // islands [0,12] and [20,30]: covered 22 of span 30
    val iv = Seq(("u", 0L, 10L), ("u", 5L, 12L), ("u", 20L, 30L))
      .toDF("k", "s", "e")
    val out = RangeJoin.availability(iv, Seq("k"), "s", "e").head()
    assert(out.getAs[Long]("n_islands") == 2L)
    assert(out.getAs[Long]("covered") == 22L &&
      out.getAs[Long]("span") == 30L)
    assert(out.getAs[Long]("avail_micro") == 733333L)
  }

  test("effectiveSampleSize: uniform weights keep n_eff = n, one " +
      "dominant weight collapses it") {
    import spark.implicits._
    val even = Seq.fill(10)(Tuple1(5L)).toDF("w")
    val e1 = Sampling.effectiveSampleSize(even, col("w")).head()
    assert(e1.getAs[Double]("n_eff") == 10.0 &&
      e1.getAs[Double]("design_effect") == 1.0)
    val skew = (Seq.fill(9)(Tuple1(1L)) :+ Tuple1(1000L)).toDF("w")
    val e2 = Sampling.effectiveSampleSize(skew, col("w")).head()
    assert(e2.getAs[Double]("n_eff") < 1.1) // one row dominates
  }

  test("smdAudit: identical slices read zero, a one-sd shift reads " +
      "about one") {
    import spark.implicits._
    val a = (1L to 100L).map(Tuple1(_)).toDF("v")
    val same = Profiling.smdAudit(a, a, Seq("v")).head()
    assert(same.getAs[Double]("smd") == 0.0)
    val b = (1L to 100L).map(i => Tuple1(i + 29L)).toDF("v")
    val shifted = Profiling.smdAudit(a, b, Seq("v")).head()
    assert(math.abs(shifted.getAs[Double]("smd") + 1.0) < 0.01)
  }

  test("peakConcurrency: overlap counted, touching half-open " +
      "intervals do not overlap, earliest peak start reported") {
    import spark.implicits._
    val iv = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 10L, 20L),
      ("k", 30L, 40L)).toDF("g", "s", "e")
    val out = Windows.peakConcurrency(iv, "g", "s", "e").head()
    assert(out.getLong(1) == 4L)       // n_intervals
    assert(out.getLong(2) == 2L)       // [5,10) has 2; at t=10 one ends
    assert(out.getLong(3) == 5L)       // earliest peak start
  }

  test("stationaryDistribution: an absorbing state accumulates the " +
      "mass, total mass conserved up to truncation") {
    import spark.implicits._
    // u walks a -> b -> b -> b ... : b absorbs
    val ev = (1L to 20L).map(i =>
      (1L, if (i == 1) "a" else "b", i)).toDF("u", "t", "o")
    val out = TimeSeries.stationaryDistribution(ev, col("u"), col("t"),
        Seq(col("o")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("b") > 900000L) // nearly all mass
    assert(out.values.sum <= 1000000L) // leak only downward
  }

  test("userDiversity: single-type user scores zero, even split " +
      "scores the exact bit identity") {
    import spark.implicits._
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "b"), (2L, "b")).toDF("u", "t")
    val out = Journey.userDiversity(ev, "u", "t")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("h_q")).toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 4L) // 4·blog(4) − 2·(2·blog(2)) = 12 − 8
  }

  test("activationLag: kth-milestone day lags, non-activated users " +
      "excluded, discrete quantiles") {
    import spark.implicits._
    def ts(day: Long) = new java.sql.Timestamp(1700000000000L +
      day * 86400000L)
    val ev = Seq(
      (1L, "signup", ts(0), 1L), (1L, "purchase", ts(1), 2L),
      (1L, "purchase", ts(2), 3L), (1L, "purchase", ts(5), 4L),
      (2L, "signup", ts(0), 5L), (2L, "purchase", ts(0), 6L),
      (2L, "purchase", ts(10), 7L), (2L, "purchase", ts(20), 8L),
      (3L, "signup", ts(0), 9L), (3L, "purchase", ts(1), 10L))
      .toDF("u", "typ", "ts", "id")
    val out = Journey.activationLag(ev, "u", "typ", "ts", "id",
      "purchase", k = 3).head()
    assert(out.getLong(0) == 2L) // user 3 never hits 3 purchases
    assert(out.getAs[Long]("p50_days") == 5L)
    assert(out.getAs[Long]("p90_days") == 20L)
  }

  test("forecastBakeoff: hand-derived MAEs — drift wins a pure trend, " +
      "snaive wins a pure cycle, snaive falls back when out of reach") {
    import spark.implicits._
    // trend: x = 10t, n = 10, holdout 2 (period 4 >= holdout):
    // train 1..8 (c = 8), x0 = 10, xl = 80
    // h=1: naive 80 vs 90 -> 10; drift 80 + (1*70) div 7 = 90 -> 0
    //      snaive: p=9 -> p-4=5 -> x=50 vs 90 -> 40
    // h=2: naive 80 vs 100 -> 20; drift 80 + 140 div 7 = 100 -> 0
    //      snaive: x(6)=60 vs 100 -> 40
    val trend = (1L to 10L).map(t => ("k", t, t * 10))
    // cycle: period 4 pattern 0,100,0,100... n = 12, holdout 2:
    // snaive exact (0), naive wrong on alternating steps
    val cycle = (1L to 12L).map(t => ("c", t, if (t % 2 == 0) 100L else 0L))
    val df = (trend ++ cycle).toDF("k", "t", "x")
    val out = graft.ops.TimeSeries
      .forecastBakeoff(df, "k", "t", col("x"), period = 4, holdout = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6)))).toMap
    assert(out("k") == ((8L, 2L, 30L, 80L, 0L, "drift")))
    // cycle: c = 10, xl = x(10) = 100; h=1: actual x(11)=0 -> naive
    // 100, snaive x(7)=0 -> 0; h=2: actual 100 -> naive 0, snaive 0
    assert(out("c") == ((10L, 2L, 100L, 0L, 133L, "snaive")))
  }

  test("logBucketQuantiles: small values are exact singleton buckets, " +
      "large values bracket the true quantile within 2^-j relative, " +
      "zero handled, bounds always contain the exact rank value") {
    import spark.implicits._
    // j = 6: every v < 128 is its own bucket -> exact answers
    val small = (0L to 100L).toDF("v")
    val s50 = Quantiles.logBucketQuantiles(small, col("v"),
      Seq((1, 2), (1, 101))).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 101 values 0..100: rank ceil(101/2)=51 -> value 50 exactly
    assert(s50((1L, 2L)) == ((51L, 50L, 50L)))
    // rank ceil(101/101)=1 -> the zero bucket
    assert(s50((1L, 101L)) == ((1L, 0L, 0L)))

    // large skewed values: the exact quantile must sit inside
    // [est_lo, est_hi] and the bracket must be tight
    val vals = (1 to 5000).map(i => (i.toLong * i * 37) % 104729L + 1000)
    val exact = vals.sorted.apply(
      (math.ceil(vals.size * 0.9) - 1).toInt) // ceil-rank p90
    val r = Quantiles.logBucketQuantiles(vals.toDF("v"), col("v"),
      Seq((9, 10))).head()
    val (lo, hi) = (r.getLong(3), r.getLong(4))
    assert(lo <= exact && exact <= hi, s"[$lo, $hi] vs $exact")
    assert(hi - lo <= math.max(1L, lo / 64L + 1),
      s"bracket [$lo, $hi] wider than 2^-6 relative")
  }

  test("logBucketQuantilesBy: per-group sketches answer independently — " +
      "small group exact, large group bracketed, groups never mix") {
    import spark.implicits._
    val rows = (1L to 10L).map(v => ("a", v)) ++
      Seq(("b", 100000L), ("b", 200000L), ("b", 300000L))
    val out = Quantiles.logBucketQuantilesBy(rows.toDF("g", "v"),
        Seq("g"), col("v"), Seq((1, 2))).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a: 10 values 1..10, rank ceil(10/2)=5 -> exact singleton bucket 5
    assert(out("a") == ((5L, 5L, 5L)))
    // b: rank 2 -> 200000 must sit in its bucket's honest bounds
    val (rk, lo, hi) = out("b")
    assert(rk == 2L && lo <= 200000L && 200000L <= hi &&
      hi - lo <= lo / 64L + 1)
  }

  test("cmhTest: hand-derived two-strata 2x2 evidence pooling, " +
      "degenerate single-row stratum contributes zero") {
    import spark.implicits._
    // stratum X: B converts 3/4, A converts 1/4 -> a=3, E=2, V=4/7
    // stratum Y: B converts 1/2, A converts 0/2 -> a=1, E=0.5, V=0.25
    // stratum Z: one row (T=1) -> zero evidence
    val rows =
      Seq.fill(3)(("X", true, true)) ++ Seq(("X", true, false)) ++
      Seq(("X", false, true)) ++ Seq.fill(3)(("X", false, false)) ++
      Seq(("Y", true, true), ("Y", true, false),
        ("Y", false, false), ("Y", false, false),
        ("Z", true, true))
    val df = rows.toDF("s", "b", "o")
    val r = ABTest.cmhTest(df, "s", col("b"), col("o")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(2) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - (4.0 / 7.0 + 0.25)) < 1e-12)
    assert(math.abs(r.getDouble(4) -
      1.5 / math.sqrt(4.0 / 7.0 + 0.25)) < 1e-12)
  }

  test("pretrainBlocks: hand-derived cross-doc layout — blocks cross " +
      "boundaries, empty docs contribute their marker, last block ragged") {
    import spark.implicits._
    // stream: a b c <eod> | <eod> | d e <eod>  with B = 4:
    // block 0 = [a b c <eod>], block 1 = [<eod> d e <eod>]
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "d e"))
      .toDF("doc_id", "text")
    val out = graft.ops.Packing
      .pretrainBlocks(docs, "doc_id", "text", blockTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      (1L, "a", 0L, 0L), (1L, "b", 0L, 1L), (1L, "c", 0L, 2L),
      (1L, "<eod>", 0L, 3L),
      (2L, "<eod>", 1L, 0L),
      (3L, "d", 1L, 1L), (3L, "e", 1L, 2L), (3L, "<eod>", 1L, 3L)))
    // ragged tail: B = 3 leaves the last block short
    val o3 = graft.ops.Packing
      .pretrainBlocks(docs, "doc_id", "text", blockTokens = 3)
      .groupBy(col("block_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(o3 == Map(0L -> 3L, 1L -> 3L, 2L -> 2L))
  }

  test("mannWhitney: hand-derived U with ties (textbook ranks), " +
      "stochastic dominance reads r_rb = -1, all-ties z NULL") {
    import spark.implicits._
    // arm A (b=false): 1, 2, 2;  arm B (b=true): 2, 3
    // sorted: 1(r1), 2,2,2 (avg rank 3), 3 (r5)
    // R1(B) = 3 + 5 = 8 -> U1 = 8 - 2*3/2 = 5; u1_dbl = 10
    // r_rb = 1 - 2*5/(2*3) = -2/3
    val df = Seq((false, 1L), (false, 2L), (false, 2L),
      (true, 2L), (true, 3L)).toDF("b", "v")
    val r = ABTest.mannWhitney(df, col("b"), col("v")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 10L)))
    assert(math.abs(r.getDouble(3) - (-2.0 / 3.0)) < 1e-12)
    // z sign: positive U1-side excess means arm B ranks higher
    assert(r.getDouble(4) > 0)

    // complete dominance: every B above every A -> U1 = n1*n2, r = -1
    val dom = Seq((false, 1L), (false, 2L), (true, 10L), (true, 11L))
      .toDF("b", "v")
    val d = ABTest.mannWhitney(dom, col("b"), col("v")).head()
    assert(d.getLong(2) == 2L * 2L * 2L) // u1_dbl = 2*U1 = 2*n1*n2
    assert(math.abs(d.getDouble(3) - (-1.0)) < 1e-12)

    // all values tie: variance 0 -> z NULL, r_rb 0
    val tie = Seq((false, 5L), (true, 5L), (true, 5L)).toDF("b", "v")
    val t = ABTest.mannWhitney(tie, col("b"), col("v")).head()
    assert(t.isNullAt(4) && math.abs(t.getDouble(3)) < 1e-12)
  }

  test("ratioMetricTest: cluster-level ratios exact, zero-variance " +
      "arms yield NULL z, real spread yields a signed z") {
    import spark.implicits._
    val rows = Seq(
      (1L, false, 1L, 10L), (2L, false, 3L, 10L),
      (3L, true, 4L, 10L), (4L, true, 6L, 10L))
      .toDF("u", "b", "x", "y")
    val out = ABTest.ratioMetricTest(rows, "u", col("b"), col("x"),
      col("y")).head()
    assert(out.getAs[Double]("ratio_a") == 0.2) // 4/20
    assert(out.getAs[Double]("ratio_b") == 0.5) // 10/20
    assert(math.abs(out.getAs[Double]("diff") - 0.3) < 1e-12)
    assert(out.getAs[Double]("z") > 0)
  }

  test("ratioMetricTest: a degenerate arm (zero users) still yields " +
      "one row with n 0 and NULL ratio/z, not an empty frame") {
    import spark.implicits._
    val rows = Seq( // every user lands in arm a
      (1L, false, 1L, 10L), (2L, false, 3L, 10L))
      .toDF("u", "b", "x", "y")
    val out = ABTest.ratioMetricTest(rows, "u", col("b"), col("x"),
      col("y")).collect()
    assert(out.length == 1) // the silent-absence bug returned 0 rows
    assert(out.head.getAs[Long]("n_a") == 2L)
    assert(out.head.getAs[Long]("n_b") == 0L)
    assert(out.head.isNullAt(out.head.fieldIndex("ratio_b")))
    assert(out.head.isNullAt(out.head.fieldIndex("z")))
  }

  test("psiSeries: a reference-distributed day reads exactly zero, a " +
      "shifted day reads large") {
    import spark.implicits._
    val ref = (1L to 100L).toDF("v")
    val cur = (1L to 100L).map(i => ("d1", i)) ++
      (1L to 100L).map(i => ("d2", i + 1000L))
    val out = Profiling.psiSeries(ref, cur.toDF("w", "v"), col("v"),
        col("w"), (1 to 9).map(i => (i, 10)))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("d1") == 0L)
    assert(out("d2") > 1000000L)
  }

  test("newCategories: only genuinely novel values surface, with " +
      "their current-slice counts") {
    import spark.implicits._
    val ref = Seq(("a", 1L), ("b", 1L)).toDF("s", "k")
    val cur = Seq(("a", 1L), ("c", 2L), ("c", 2L)).toDF("s", "k")
    val out = Profiling.newCategories(ref, cur, Seq("s", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(out == Map(("s", "c") -> 2L, ("k", "2") -> 2L))
  }

  test("requiredSampleSize: textbook n for p=.5 mde=10%, degenerate " +
      "rates yield NULL") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("g", if (i <= 50) 1L else 0L)) ++
      (1 to 10).map(_ => ("allpos", 1L))
    val out = ABTest.requiredSampleSize(rows.toDF("g", "y"), "g",
        col("y"), mdeRelMicro = 100000L)
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[Any]("n_required_per_arm"))).toMap
    // 2·7.848886·0.25/0.05² = 1569.78 → 1570
    assert(out("g").contains(1570L))
    assert(out("allpos").isEmpty)
  }

  test("reconcileForecasts: reconciled bottoms sum to the top " +
      "forecast (up to milli truncation)") {
    import spark.implicits._
    val bottoms = Seq(("a", 30L), ("b", 60L), ("c", 10L)).toDF("k", "f")
    val top = Seq(Tuple1(200L)).toDF("t_total")
    val out = TimeSeries.reconcileForecasts(bottoms, Seq("k"), "f", top)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out == Map("a" -> 60000L, "b" -> 120000L, "c" -> 20000L))
    assert(out.values.sum == 200000L) // adds up to the top, in millis
  }

  test("shrunkRates: small-n keys pulled hard toward the global " +
      "prior, big-n keys barely move") {
    import spark.implicits._
    val rows = Seq.fill(900)((1L, 1L)) ++ Seq.fill(100)((1L, 0L)) ++
      Seq((2L, 1L)) // user 2: one event, one success
    val out = Features.shrunkRates(rows.toDF("u", "y"), "u", col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("raw_micro"), r.getAs[Long]("shrunk_micro"))))
      .toMap
    val priorMicro = 901L * 1000000L / 1001L // ≈ 900099
    assert(out(2L)._1 == 1000000L) // raw: 100%
    // n=1 key lands ~20/21 of the way back to the prior...
    assert(math.abs(out(2L)._2 - priorMicro) <
      math.abs(out(2L)._1 - priorMicro) / 10)
    // ...while the n=1000 key moves by under 0.5 percentage points
    assert(math.abs(out(1L)._2 - out(1L)._1) < 5000L)
  }

  test("funnelSteps3: order and deadlines enforced — backwards or " +
      "late steps don't convert") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(100)),
      (1L, "purchase", ts(200)),                  // full chain
      (2L, "view", ts(0)), (2L, "click", ts(100)),
      (2L, "purchase", ts(100 + 7201)),           // step3 too late
      (3L, "click", ts(0)), (3L, "view", ts(100)),
      (3L, "purchase", ts(200)),                  // wrong order for s2
      (4L, "view", ts(0)))
      .toDF("uid", "typ", "ts")
    val out = Journey.funnelSteps3(ev, "uid", "typ", "ts",
      "view", "click", "purchase", windowSeconds = 7200L).head()
    assert(out.getLong(0) == 4L) // all four viewed (u3 views too)
    assert(out.getLong(1) == 2L) // u1, u2 clicked after viewing
    assert(out.getLong(2) == 1L) // only u1 completed in time
    assert(out.getAs[Double]("rate_13") == 0.25)
  }

  test("rmst: truncated-lifetime mean exact, horizon caps long lives") {
    import spark.implicits._
    def ts(day: Long) = new java.sql.Timestamp(1700000000000L +
      day * 86400000L)
    val ev = Seq((1L, ts(0)), (1L, ts(5)),   // lifetime 5
      (2L, ts(0)), (2L, ts(40)),             // capped at 14
      (3L, ts(0)))                           // lifetime 0
      .toDF("uid", "ts")
    val out = Journey.rmst(ev, "uid", "ts", horizonDays = 14L).head()
    assert(out.getLong(0) == 3L && out.getLong(2) == 19L) // 5 + 14 + 0
    assert(math.abs(out.getAs[Double]("rmst_days") - 19.0 / 3) < 1e-12)
  }

  test("mixDecomposition: pure mix shift shows zero rate terms and " +
      "reconstructs the overall delta") {
    import spark.implicits._
    val rows =
      (1 to 50).map(i => ("s1", false, i <= 10)) ++
      (1 to 50).map(i => ("s2", false, i <= 20)) ++
      (1 to 80).map(i => ("s1", true, i <= 16)) ++
      (1 to 20).map(i => ("s2", true, i <= 8))
    val out = Causal.mixDecomposition(rows.toDF("seg", "b", "y"),
        "seg", col("b"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(5), r.getLong(6)))).toMap
    assert(out("s1") == ((60000L, 0L)))   // (0.8−0.5)·0.2·1e6
    assert(out("s2") == ((-120000L, 0L))) // (0.2−0.5)·0.4·1e6
    // Σmix + Σrate = 1e6·(0.24 − 0.30)
    assert(out.values.map(t => t._1 + t._2).sum == -60000L)
  }

  test("qiniCurve: a top-tile-only treatment effect accumulates and " +
      "plateaus") {
    import spark.implicits._
    val rows =
      (1 to 5).map(_ => (100L, true, 1L)) ++
      (1 to 5).map(_ => (100L, false, 0L)) ++
      (1 to 5).map(_ => (50L, true, 0L)) ++
      (1 to 5).map(_ => (50L, false, 0L))
    val out = Eval.qiniCurve(rows.toDF("s", "t", "y"), col("s"),
        col("t"), col("y"), tiles = 2)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Double]("qini")).toMap
    assert(out(0L) == 5.0 && out(1L) == 5.0)
  }

  test("columnEntropy: skewed binary scores below even binary, " +
      "constant column scores zero") {
    import spark.implicits._
    val rows = (1L to 100L).map(i =>
      (if (i <= 50) "a" else "b",       // even 50/50
        if (i <= 99) "x" else "y",      // skewed 99/1
        "const")).toDF("even", "skew", "k")
    val out = Profiling.columnEntropy(rows.toDF("even", "skew", "k"),
        Seq("even", "skew", "k"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("k") == 0L) // n·blog(n) − n·blog(n)
    assert(out("even") > out("skew") && out("skew") > 0L)
  }

  test("cohensKappa: perfect agreement 1, majority-vote flattery " +
      "corrected toward zero") {
    import spark.implicits._
    val perfect = (1L to 20L).map(i => (s"c${i % 3}", s"c${i % 3}"))
      .toDF("a", "b")
    assert(Profiling.cohensKappa(perfect, col("a"), col("b")).head()
      .getAs[Double]("kappa") == 1.0)
    // b always predicts the 90% majority: accuracy .9, kappa 0
    val lazyRater = ((1L to 18L).map(_ => ("maj", "maj")) ++
      Seq(("min", "maj"), ("min", "maj"))).toDF("a", "b")
    val k = Profiling.cohensKappa(lazyRater, col("a"), col("b")).head()
    assert(k.getAs[Double]("po") == 0.9)
    assert(k.getAs[Double]("kappa") == 0.0)
  }

  test("jaroWinkler: textbook fixtures, DuckDB empty-string " +
      "convention, SQL registration") {
    import graft.functions.JaroWinkler.similarity
    assert(similarity("martha", "marhta") == 0.9611111111111111)
    assert(similarity("dixon", "dicksonx") == 0.8133333333333332)
    assert(similarity("", "") == 0.0 && similarity("a", "") == 0.0)
    assert(similarity("abc", "abc") == 1.0)
    assert(similarity("ab", "ba") == 0.0) // window 0: no matches
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT jaro_winkler('martha', 'marhta') AS j")
      .head().getDouble(0) == 0.9611111111111111)
  }

  test("adjustedRandIndex: label-renamed partitions score 1, a " +
      "checkerboard split scores below chance-corrected zero-ish") {
    import spark.implicits._
    val items = (1L to 40L)
    val same = items.map(i => (i % 4, s"c${i % 4}")).toDF("a", "b")
    val ari1 = Features.adjustedRandIndex(same, col("a"), col("b"))
      .head().getAs[Double]("ari")
    assert(ari1 == 1.0)
    // a splits by parity, b by halves → near-independent
    val cross = items.map(i => (i % 2, if (i <= 20) "x" else "y"))
      .toDF("a", "b")
    val ari0 = Features.adjustedRandIndex(cross, col("a"), col("b"))
      .head().getAs[Double]("ari")
    assert(math.abs(ari0) < 0.1)
  }

  test("ols2: exact plane recovered, collinear design yields NULLs") {
    import spark.implicits._
    val rows = for { a <- 0L to 3L; b <- 0L to 3L }
      yield (3 + 2 * a + 5 * b, a, b)
    val out = Features.ols2(rows.toDF("y", "a", "b"),
      col("y"), col("a"), col("b")).head()
    assert(math.abs(out.getAs[Double]("b0") - 3.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("b1") - 2.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("b2") - 5.0) < 1e-9)
    val coll = (1L to 10L).map(i => (i, i, i)).toDF("y", "a", "b")
    val bad = Features.ols2(coll, col("y"), col("a"), col("b")).head()
    assert(bad.isNullAt(1) && bad.getAs[Double]("det") == 0.0)
  }

  test("spearman: monotone nonlinear reads 1, reversal -1, " +
      "tie-averaged doubled ranks stay exact") {
    import spark.implicits._
    val cube = (1L to 20L).map(i => ("up", i, i * i * i)) ++
      (1L to 20L).map(i => ("down", i, -i * i * i)) ++
      Seq(("tie", 1L, 5L), ("tie", 1L, 7L), ("tie", 2L, 9L))
    val out = Features.spearman(cube.toDF("g", "x", "y"), Seq("g"),
        col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(out("up") == 1.0)
    assert(out("down") == -1.0)
    assert(out("tie") > 0.5 && out("tie") < 1.0) // x-ties damp rho
  }

  test("kendallTauB: textbook permutation, tie-corrected denominator, " +
      "and the constant-margin NULL — all hand-derived") {
    import spark.implicits._
    // g=perm: x 1..5, y (2,1,4,3,5): 10 pairs, D counts the two
    //   adjacent swaps -> C=8, D=2, tau = 0.6 (no ties).
    // g=ties: x (1,1,2), y (1,2,2): cross-x pairs are (1,1)-(2,2)
    //   concordant and (1,2)-(2,2) tied-y -> C=1, D=0; n0=3, n1=1
    //   (the x=1 pair), n2=1 (the y=2 pair) -> tau = 1/sqrt(2*2) = 0.5.
    // g=flat: constant x -> denominator 0 -> tau NULL.
    val rows = Seq(("perm", 1L, 2L), ("perm", 2L, 1L), ("perm", 3L, 4L),
      ("perm", 4L, 3L), ("perm", 5L, 5L),
      ("ties", 1L, 1L), ("ties", 1L, 2L), ("ties", 2L, 2L),
      ("flat", 7L, 1L), ("flat", 7L, 2L))
    val out = Features.kendallTauB(rows.toDF("g", "x", "y"), Seq("g"),
        col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) null else r.getDouble(5)))).toMap
    assert(out("perm") == ((5L, 5L, 8.0, 2.0, 0.6)))
    assert(out("ties") == ((3L, 3L, 1.0, 0.0, 0.5)))
    assert(out("flat")._5 == null)
  }

  test("bordaFusion: doubled tie-averaged ranks, direction-normalized, " +
      "sum exactly — hand-derived") {
    import spark.implicits._
    // m_a (higher better) asc histogram: 5->2, 10->4, 20(x2)->7
    // m_b (lower better) desc histogram: 9->2, 7(x2)->5, 3->8
    val rows = Seq((1L, 10L, 7L), (2L, 20L, 3L), (3L, 20L, 9L),
      (4L, 5L, 7L))
    val out = Features.bordaFusion(rows.toDF("id", "m_a", "m_b"), "id",
        Seq(("m_a", true), ("m_b", false)))
      .select("id", "r2_m_a", "r2_m_b", "borda2")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((4L, 5L, 9L)), 2L -> ((7L, 8L, 15L)),
      3L -> ((7L, 2L, 9L)), 4L -> ((2L, 5L, 7L))))
  }

  test("excessLossTilt: easiest source keeps tilt 1, hard source gains " +
      "eta*excess, micros renormalize — hand-derived") {
    import spark.implicits._
    // a: mean 1e6 micro-bits (the min, excess 0, tilt 1e6)
    // b: mean 3e6 -> excess 2e6 -> tilt 1.4e6 at eta=1/5
    // w: a=1e7, b=1.4e7, tot=2.4e7 -> micros 416666 / 583333
    val perDoc = Seq(("a", 10L, 10L), ("b", 30L, 10L))
      .toDF("src", "bits", "mass")
    val out = graft.ops.Sampling.excessLossTilt(perDoc, "src",
        "bits", "mass")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(out("a") == ((1000000L, 0L, 1000000L, 416666L)))
    assert(out("b") == ((3000000L, 2000000L, 1400000L, 583333L)))
  }

  test("conformalAudit: zero-residual calibration gives zero width, " +
      "coverage counts the held-out outlier") {
    import spark.implicits._
    val series = (0L to 19L).map(t => ("k", t, 10 * t)) ++
      (20L to 29L).map(t => ("k", t,
        if (t == 25L) 10 * t + 5 else 10 * t))
    val out = TimeSeries.conformalAudit(series.toDF("k", "t", "x"),
      Seq("k"), "t", "x", cutoff = 20L).head()
    assert(out.getAs[Long]("n_cal") == 20L &&
      out.getAs[Long]("width_milli") == 0L)
    assert(out.getAs[Long]("n_test") == 10L &&
      out.getAs[Long]("n_covered") == 9L)
    assert(out.getAs[Double]("coverage") == 0.9)
  }

  test("eventStudy: pre-period gap normalizes to zero at t = -1, " +
      "post-period effect reads against that baseline") {
    import spark.implicits._
    val rows = Seq(
      (true, -1L, 10L), (false, -1L, 5L),
      (true, 0L, 25L), (false, 0L, 8L))
      .toDF("t", "w", "y")
    val out = Causal.eventStudy(rows, col("t"), col("w"), col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Double]("gap"),
          r.getAs[Double]("gap_vs_baseline")))).toMap
    assert(out(-1L) == ((5.0, 0.0)))
    assert(out(0L) == ((17.0, 12.0)))
  }

  test("growthAccounting: new/retained/resurrected/churned ledger " +
      "satisfies the accounting identity") {
    import spark.implicits._
    val ev = Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 2L))
      .toDF("u", "w")
    val out = Journey.growthAccounting(ev, "u", col("w"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out(1L) == ((1L, 1L, 0L, 0L, 0L)))
    assert(out(2L) == ((2L, 1L, 1L, 0L, 0L))) // u2 new, u1 retained
    assert(out(3L) == ((0L, 0L, 0L, 0L, 2L))) // both skip w3
    assert(out(4L) == ((1L, 0L, 0L, 1L, 0L))) // u1 resurrects
    assert(out(5L) == ((0L, 0L, 0L, 0L, 1L))) // u1 gone after w4
  }

  test("priceIndex: base month reads 1.0, doubled item price moves " +
      "the index by its base-basket weight") {
    import spark.implicits._
    val li = Seq(
      (1L, "A", 2L, 2000L), (1L, "B", 4L, 2000L),  // p=10, p=5 (cents)
      (2L, "A", 1L, 2000L), (2L, "B", 10L, 5000L)) // p=20, p=5
      .toDF("p", "i", "q", "e")
    val out = Rollups.priceIndex(li, col("p"), col("i"), col("q"),
        col("e"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("index")).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 1.5) // (20·2 + 5·4) / (10·2 + 5·4)
  }

  test("aggConsistency: exact, ppm-banded, and detail-less headers " +
      "each land in their bucket") {
    import spark.implicits._
    val h = Seq((1L, 1000000L), (2L, 1000000L), (3L, 1000000L),
      (4L, 500L)).toDF("k", "ht")
    val d = Seq((1L, 1000000L), (2L, 999500L), (4L, 100L))
      .toDF("k", "da")
    val out = Integrity.aggConsistency(h, d, Seq("k"), col("ht"),
        col("da"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("exact") == ((1L, 0L)))
    assert(out("le_1000ppm") == ((1L, 500L)))   // 500/1e6 = 500 ppm
    assert(out("no_detail") == ((1L, 1000000L)))
    assert(out("gt_10000ppm") == ((1L, 400L)))  // 400/500 = 800000 ppm
  }

  test("pairedDiff: between-unit variance cancels, one-sided units " +
      "counted out, textbook t") {
    import spark.implicits._
    val rows = Seq(
      (1L, false, 10L), (1L, false, 20L), (1L, true, 25L), (1L, true, 35L),
      (2L, false, 10L), (2L, true, 22L),
      (3L, false, 99L)) // pre-only
      .toDF("u", "p", "y")
    val out = Causal.pairedDiff(rows, "u", col("p"), col("y")).head()
    assert(out.getLong(0) == 2L && out.getLong(1) == 1L &&
      out.getLong(2) == 0L)
    assert(out.getAs[Double]("mean_diff") == 13.5) // (15 + 12) / 2
    assert(math.abs(out.getAs[Double]("t") - 9.0) < 1e-9)
  }

  test("kmvJaccard: small sets read exactly, identical sets J=1, " +
      "disjoint J=0") {
    import spark.implicits._
    val a = (1L to 100L).toDF("v")
    val b = (51L to 150L).toDF("v")
    val out = Sketches.kmvJaccard(a, b, col("v"), k = 256).head()
    assert(out.getLong(0) == 150L && out.getLong(1) == 50L)
    assert(math.abs(out.getAs[Double]("jaccard_est") - 50.0 / 150.0)
      < 1e-12)
    assert(out.getAs[Double]("union_est") == 150.0) // exact: union < k
    val same = Sketches.kmvJaccard(a, a, col("v"), k = 256).head()
    assert(same.getAs[Double]("jaccard_est") == 1.0)
    val disj = Sketches.kmvJaccard(a, (200L to 300L).toDF("v"),
      col("v"), k = 256).head()
    assert(disj.getAs[Double]("jaccard_est") == 0.0)
  }

  test("topKWithOther: per-group totals reconcile, tail collapses " +
      "into one labeled bucket") {
    import spark.implicits._
    val rows = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
      ++ Seq("d")).map(d => ("g", d)).toDF("grp", "dim")
    val out = Ranking.topKWithOther(rows, "grp", "dim", k = 2)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((5L, 1L)) && out("b") == ((3L, 1L)))
    assert(out("__other__") == ((3L, 2L))) // c + d
    assert(out.values.map(_._1).sum == 11L)
  }

  test("rowSurprisal: rarest combination ranks first, NULL counts as " +
      "a value") {
    import spark.implicits._
    val rows = (1L to 9L).map(i => (i, "common", Some(1L))) :+
      ((10L, "rare", Some(1L))) :+ ((11L, "common", None: Option[Long]))
    val out = Profiling.rowSurprisal(rows.toDF("id", "s", "v"),
        "id", Seq("s", "v"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // N=11 (blog 4); rare s has n=1 (blog 1), NULL v has n=1
    assert(out.head._1 == 10L || out.head._1 == 11L)
    assert(out.take(2).map(_._1).toSet == Set(10L, 11L))
    assert(out.head._2 == out(1)._2) // both carry one rare column
  }

  test("wasserstein1: a constant shift reads as exactly that shift, " +
      "identical samples read zero") {
    import spark.implicits._
    val a = (1L to 100L).toDF("v")
    val b = (6L to 105L).toDF("v")
    val out = Profiling.wasserstein1(a, b, col("v")).head()
    assert(out.getAs[Double]("w1") == 5.0)
    assert(Profiling.wasserstein1(a, a, col("v")).head()
      .getAs[Long]("w1_num") == 0L)
  }

  test("tableDigest: order/partitioning-invariant, sensitive to a " +
      "single changed row") {
    import spark.implicits._
    val t1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val d1 = Profiling.tableDigest(t1, Seq("id", "s")).head()
    val d2 = Profiling.tableDigest(t1.repartition(5).orderBy(col("s").desc),
      Seq("id", "s")).head()
    assert(d1.getLong(0) == 3L && d1.getLong(1) == d2.getLong(1))
    val t2 = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "s")
    assert(Profiling.tableDigest(t2, Seq("id", "s")).head()
      .getLong(1) != d1.getLong(1))
  }

  test("interpolateLinear: straight line through gaps, truncating " +
      "division on downward slopes, observed rows untouched") {
    import spark.implicits._
    val s = Seq(("k", 0L, 10L), ("k", 4L, 18L),
      ("m", 0L, 10L), ("m", 2L, 5L)).toDF("g", "t", "x")
    val out = TimeSeries.interpolateLinear(s, Seq("g"), "t", "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(("k", 0L)) == ((10000L, false)))
    assert(out(("k", 1L)) == ((12000L, true)))
    assert(out(("k", 2L)) == ((14000L, true)))
    assert(out(("k", 3L)) == ((16000L, true)))
    assert(out(("k", 4L)) == ((18000L, false)))
    assert(out(("m", 1L)) == ((7500L, true))) // 10000 − 2500
  }

  test("exactGlobalRatio: bisection equals the window form on random " +
      "data, survives all-equal skew and negative values") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(997)(rng.nextLong() % 100000L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val ps = Seq((1, 2), (9, 10), (99, 100))
    val bis = Quantiles.exactGlobalRatio(df, col("v"), ps,
      buckets = 16).head() // tiny bucket count forces several rounds
    val win = Quantiles.exactRatio(df, Seq(lit(1)), col("v"), ps).head()
    assert(bis.getAs[Long]("n") == 997L)
    Seq("p50", "p90", "p99").foreach { c =>
      assert(bis.getAs[Long](c) == win.getAs[Long](c), c)
    }
    // pathological skew: every value equal — resolves without blowup
    val flat = (1L to 500L).map(i => (i, 42L)).toDF("id", "v")
    val f = Quantiles.exactGlobalRatio(flat, col("v"), Seq((1, 2))).head()
    assert(f.getAs[Long]("p50") == 42L)
  }

  test("weightedQuantiles: weight mass moves the median where row " +
      "counts would not") {
    import spark.implicits._
    val rows = Seq(("g", 10L, 1L), ("g", 20L, 9L),
      ("h", 10L, 5L), ("h", 20L, 5L)).toDF("k", "v", "w")
    val out = Quantiles.weightedQuantiles(rows, Seq("k"), col("v"),
        col("w"), Seq((1, 2)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("g") == ((10L, 20L))) // 90% of mass at 20
    assert(out("h") == ((10L, 10L))) // even mass → lower value
  }

  test("ksTest: identical samples accept with D=0, disjoint samples " +
      "reject with D=1") {
    import spark.implicits._
    val a = (1L to 100L).toDF("v")
    val same = Profiling.ksTest(a, a, col("v")).head()
    assert(same.getLong(2) == 0L && !same.getBoolean(6))
    val b = (101L to 200L).toDF("v")
    val disj = Profiling.ksTest(a, b, col("v")).head()
    assert(disj.getAs[Double]("d") == 1.0 && disj.getBoolean(6))
  }

  test("chapmanEstimate: textbook overlap arithmetic, empty overlap " +
      "yields NULL") {
    import spark.implicits._
    val a = (1L to 50L).toDF("id")
    val b = (26L to 75L).toDF("id")
    val out = Profiling.chapmanEstimate(a, b, Seq("id")).head()
    assert(out.getLong(0) == 50L && out.getLong(1) == 50L &&
      out.getLong(2) == 25L)
    assert(out.getLong(3) == 99L) // 51·51 div 26 − 1
    val none = Profiling.chapmanEstimate(a, (100L to 120L).toDF("id"),
      Seq("id")).head()
    assert(none.isNullAt(3))
  }

  test("peakWindowRate: burst straddling bucket boundaries found, " +
      "value-ranged frame ignores gaps") {
    import spark.implicits._
    val ev = Seq(0L, 10L, 59L, 60L, 200L).map(sec =>
      (1L, new java.sql.Timestamp(1700000000000L + sec * 1000L)))
      .toDF("uid", "ts")
    val out = Windows.peakWindowRate(ev, "uid", "ts", 60L).head()
    assert(out.getLong(1) == 5L)                     // n_events
    assert(out.getLong(2) == 3L)                     // peak: {0,10,59}
    assert(out.getLong(3) == 1700000000L)            // earliest peak start
  }

  test("bootstrapMeans: constant metric gives constant replicate " +
      "means, weights Poisson-plausible, deterministic") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, 10L)).toDF("id", "y")
    val out = Sampling.bootstrapMeans(rows, "id", col("y"), b = 16)
      .collect()
    assert(out.length == 16)
    assert(out.forall(r => r.isNullAt(3) ||
      r.getDouble(3) == 10.0))
    val totalW = out.map(_.getLong(1)).sum
    assert(totalW > 16L * 500 / 2 && totalW < 16L * 500 * 3 / 2)
    val again = Sampling.bootstrapMeans(rows.repartition(7), "id",
      col("y"), b = 16).collect().map(_.getLong(1)).sum
    assert(again == totalW)
  }

  test("mrr: first-relevant rank exact, reciprocal in integer micros, " +
      "relevance-free queries absent") {
    import spark.implicits._
    val rows = Seq(
      ("qA", 1L, 0L, 30L), ("qA", 2L, 0L, 20L), ("qA", 3L, 1L, 10L),
      ("qB", 4L, 1L, 9L), ("qB", 5L, 0L, 8L),
      ("qC", 6L, 0L, 7L))
      .toDF("q", "i", "r", "s")
    val out = Eval.mrr(rows, "q", col("i"), col("r"), col("s"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2)))).toMap
    assert(out("qA") == ((3L, 333333L)))
    assert(out("qB") == ((1L, 1000000L)))
    assert(!out.contains("qC"))
  }

  test("cooccurrenceWindow: in-window ordered pair counted once, " +
      "out-of-window and same-type pairs excluded") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A", "2024-01-01 00:00:00"),
      (1L, "B", "2024-01-01 00:30:00"),
      (1L, "C", "2024-01-01 02:00:00"),
      (1L, "A", "2024-01-01 00:10:00")) // A→A excluded by type
      .toDF("uid", "typ", "ts")
      .select(col("uid"), col("typ"), col("ts").cast("timestamp").as("ts"))
    val out = Journey.cooccurrenceWindow(ev, "uid", "typ", "ts", 3600L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(("A", "B") -> ((2L, 1L)))) // both A's precede B
  }

  test("recListAudit: full coverage on the planted catalog, " +
      "uncoupled list pair contributes zero similarity") {
    import spark.implicits._
    val baskets = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L)).toDF("b", "i")
    val out = Basket.recListAudit(baskets, "b", "i", k = 2).head()
    spark.catalog.clearCache()
    assert(out.getAs[Long]("n_lists") == 3L)
    assert(out.getAs[Double]("coverage") == 1.0)
    assert(out.getAs[Long]("n_list_pairs") == 1L) // item1's (2,3)
    assert(out.getAs[Long]("ils_micro_sum") == 0L) // 2,3 never co-occur
  }

  test("confusionMatrix: cells, margins, diagonal precision/recall") {
    import spark.implicits._
    val rows = Seq(("a", "a"), ("a", "b"), ("b", "b")).toDF("y", "p")
    val out = Eval.confusionMatrix(rows, col("y"), col("p"))
      .collect().map(r => (r.getAs[String]("actual"),
        r.getAs[String]("predicted")) ->
        ((r.getAs[Long]("n"), Option(r.getAs[Any]("precision")),
          Option(r.getAs[Any]("recall"))))).toMap
    assert(out(("a", "a")) == ((1L, Some(1.0), Some(0.5))))
    assert(out(("b", "b")) == ((1L, Some(0.5), Some(1.0))))
    assert(out(("a", "b")) == ((1L, None, None)))
  }

  test("detrendedOutliers: a spike on a steep ramp is flagged, the " +
      "ramp itself is not") {
    import spark.implicits._
    val series = (1L to 20L).map(t =>
      ("k", t, if (t == 10L) 10 * t + 1000L else 10 * t)).toDF("k", "t", "x")
    val out = TimeSeries.detrendedOutliers(series, Seq("k"), "t", "x",
      zThreshold = 3.0).collect()
    assert(out.length == 1 && out.head.getLong(1) == 10L)
    // global z over the ramp would flag the endpoints instead:
    // sanity — endpoints are NOT in the detrended output (checked above
    // by the single-row assertion)
  }

  test("fellegiSunter: rare-field agreement outweighs common fields, " +
      "weights are exact micro-log2 of the odds") {
    import spark.implicits._
    // log2(0.5/0.25) = 1 → exactly 1e6 micros
    assert(Linkage.FsField("f", 0.5, 0.25).wAgree == 1000000L)
    val a = Seq((101L, 1L, "alice", "A"), (102L, 1L, "zed", "B"))
      .toDF("id", "blk", "name", "seg")
    val b = Seq((1L, 1L, "alice", "B"), (2L, 1L, "bob", "A"))
      .toDF("id", "blk", "name", "seg")
    val fields = Seq(Linkage.FsField("name", 0.9, 0.001),
      Linkage.FsField("seg", 0.9, 0.25))
    val out = Linkage.fellegiSunter(a, b, "id", "blk", fields,
        thresholdMicro = 5000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getBoolean(3)).toMap
    assert(out((101L, 1L))) // name agrees → far above threshold
    assert(!out((101L, 2L)) && !out((102L, 1L)) && !out((102L, 2L)))
  }

  test("kmvDistinct: small groups exact, large groups within KMV " +
      "error, deterministic under repartitioning") {
    import spark.implicits._
    val rows = (1L to 2000L).map(i => ("big", i)) ++
      (1L to 10L).map(i => ("small", i))
    val df = rows.toDF("g", "v")
    val out = Sketches.kmvDistinct(df, "g", col("v"), k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("small") == 10.0) // < k → exact
    assert(math.abs(out("big") - 2000.0) / 2000.0 < 0.3)
    val out2 = Sketches.kmvDistinct(df.repartition(13), "g", col("v"),
      k = 64).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out2 == out)
  }

  test("cuped: correlated covariate shrinks variance, arm difference " +
      "is preserved") {
    import spark.implicits._
    // y ≈ 2x + 5·arm: x explains most in-arm variance
    val rows = Seq((false, 20L, 10L), (false, 40L, 20L),
      (false, 61L, 30L), (true, 25L, 10L), (true, 45L, 20L),
      (true, 66L, 30L))
    val out = Causal.cuped(rows.toDF("b", "y", "x"),
      col("b"), col("y"), col("x")).head()
    val diffRaw = out.getAs[Double]("diff_raw")
    val diffCuped = out.getAs[Double]("diff_cuped")
    assert(math.abs(diffRaw - 5.0) < 0.4)
    assert(math.abs(diffCuped - 5.0) < 0.4)
    assert(out.getAs[Double]("var_reduction") < 0.2) // x soaks variance
  }

  test("rakeKeyphrases: stopword-split phrases, deg/freq scoring, " +
      "repeat phrase counted") {
    import spark.implicits._
    val docs = Seq((1L, "the big red car and the big red car"),
      (2L, "a tiny dog")).toDF("doc_id", "text")
    val out = graft.text.Retrieval.rakeKeyphrases(docs, "doc_id",
        "text", graft.text.TextAnalysis.stopEn, maxLen = 3, topK = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // big/red/car: freq 2, deg 6 → wscore 3e6 each → phrase 9e6
    assert(out("big red car") == ((2L, 9000000L)))
    // tiny/dog: freq 1, deg 2 → phrase 4e6
    assert(out("tiny dog") == ((1L, 4000000L)))
  }

  test("itemCosineTopK: planted baskets give known cosines, " +
      "neighborhoods symmetric, k truncates") {
    import spark.implicits._
    val baskets = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L)).toDF("b", "i")
    val out = Basket.itemCosineTopK(baskets, "b", "i", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(6)) ->
        ((r.getLong(1), r.getDouble(5)))).toMap
    // item 1: co(1,2)=2, n1=3, n2=2 → 2/√6; co(1,3)=1, n3=1 → 1/√3
    assert(out((1L, 1L))._1 == 2L &&
      math.abs(out((1L, 1L))._2 - 2.0 / math.sqrt(6.0)) < 1e-12)
    assert(out((1L, 2L))._1 == 3L)
    assert(out((2L, 1L))._1 == 1L) // symmetric: 1 is 2's best neighbor
  }

  test("fieldDiff: per-column mismatch counts, NULL-safe comparison") {
    import spark.implicits._
    val o = Seq((1L, Some("a"), Some(10L)), (2L, None, Some(20L)),
      (3L, Some("c"), None)).toDF("id", "s", "v")
    val n = Seq((1L, Some("a"), Some(11L)), (2L, Some("b"), Some(20L)),
      (3L, Some("c"), None)).toDF("id", "s", "v")
    val out = Merge.fieldDiff(o, n, Seq("id"), Seq("s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("s") == ((3L, 1L))) // NULL→'b' diffs; NULL=NULL doesn't
    assert(out("v") == ((3L, 1L)))
  }

  test("crossCorrelation: a series leading by 2 peaks at lag +2 " +
      "with r = 1") {
    import spark.implicits._
    val a = (1L to 10L).map(t => (t, t * t)).toDF("t", "x")
    val b = (3L to 12L).map(t => (t, (t - 2) * (t - 2))).toDF("t", "x")
    val out = TimeSeries.crossCorrelation(a, b, "t", "x", maxLag = 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(2L).contains(1.0))
    assert(out(0L).exists(_.asInstanceOf[Double] < 1.0))
  }

  test("seasonalityStrength: perfect daily profile scores 1, " +
      "constant series is NULL") {
    import spark.implicits._
    val s = (0L to 95L).map(t => ("p", t, t % 24)) ++
      (0L to 95L).map(t => ("flat", t, 7L))
    val out = TimeSeries.seasonalityStrength(s.toDF("k", "t", "x"),
        Seq("k"), "t", "x", season = 24L)
      .collect().map(r => r.getString(0) -> Option(r.get(4))).toMap
    assert(out("p").contains(1.0))
    assert(out("flat").isEmpty)
  }

  test("conversionLag: discrete p50/p90 of first-trigger-to-first-" +
      "outcome lags, non-converters excluded") {
    import spark.implicits._
    val ev = Seq(
      (1L, "click", 0L), (1L, "purchase", 10L), (1L, "purchase", 99L),
      (2L, "click", 0L), (2L, "purchase", 20L),
      (3L, "click", 0L), (3L, "purchase", 30L),
      (4L, "click", 0L)) // never converts
      .map { case (u, ty, sec) => (u, ty,
        new java.sql.Timestamp(1700000000000L + sec * 1000L)) }
      .toDF("uid", "typ", "ts")
    val out = Journey.conversionLag(ev, "uid", "typ", "ts",
      "click", "purchase").head()
    assert(out.getLong(0) == 3L)
    assert(out.getAs[Long]("p50_sec") == 20L)
    assert(out.getAs[Long]("p90_sec") == 30L)
  }

  test("jumpHash: in-range, n=1 pins to 0, and keys move ONLY to the " +
      "new bucket when n grows (the consistency guarantee)") {
    val keys = (1 to 1000).map(i =>
      graft.functions.Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"k$i")))
    assert(keys.forall(k => graft.functions.JumpHash.hash(k, 1) == 0L))
    var moved = 0
    keys.foreach { k =>
      val b8 = graft.functions.JumpHash.hash(k, 64)
      val b9 = graft.functions.JumpHash.hash(k, 65)
      assert(b8 >= 0 && b8 < 64)
      if (b9 != b8) { assert(b9 == 64L); moved += 1 }
    }
    // expected ~ 1000/65 ≈ 15
    assert(moved > 0 && moved < 60, s"moved=$moved")
    // SQL registration routes to the same codegen expression
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      s"SELECT jump_hash(CAST(${keys.head} AS BIGINT), 64) AS b")
      .head().getLong(0)
    assert(viaSql == graft.functions.JumpHash.hash(keys.head, 64))
  }

  test("incrementalPageRank: empty delta equals one extra full " +
      "iteration; a new node starts cold with NULL r_prev") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val inc = PageRank.incrementalPageRank(e, e.limit(0), "src", "dst",
        iters = 2)
      .select(col("node"), col("r_new"))
    val full = PageRank.pageRank(e, "src", "dst", iters = 3)
      .select(col("node"), col("r"))
    assert(inc.join(full, "node").filter(col("r_new") =!= col("r"))
      .count() == 0)
    val delta = Seq((3L, 9L)).toDF("src", "dst")
    val withNew = PageRank.incrementalPageRank(e, delta, "src", "dst",
      iters = 2).collect().map(r => r.getLong(0) -> r).toMap
    assert(withNew(9L).isNullAt(1)) // r_prev NULL for the new node
    assert(withNew(1L).getLong(1) > 0L)
  }

  test("miRanking: a label-identical feature scores positive, a " +
      "constant feature scores exactly zero") {
    import spark.implicits._
    val rows = (1L to 64L).map(i => (i, s"t${i % 4}")).toDF("id", "lab")
    val out = Features.miRanking(rows, col("lab"),
      Seq("perfect" -> col("lab"), "constant" -> lit(1L)))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("mi_q")).toMap
    assert(out("perfect") > 0L)
    assert(out("constant") == 0L)
  }

  test("theilSen: one wild outlier leaves the median slope untouched") {
    import spark.implicits._
    val series = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("a", 4L, 1000L)).toDF("k", "t", "x")
    val out = TimeSeries.theilSen(series, Seq("k"), "t", "x").head()
    // pairwise slopes [10,10,10,330,490,970] → rank-3 median = 10
    assert(out.getLong(1) == 6L && out.getDouble(2) == 10.0)
    val ols = TimeSeries.linearTrend(series, Seq("k"), "t", "x").head()
    assert(ols.getAs[Double]("slope") > 100.0) // OLS dragged by outlier
  }

  test("maseBacktest: perfectly seasonal series scores MASE 0") {
    import spark.implicits._
    val series = (0L to 71L).map(t => ("a", t, t % 24)).toDF("k", "t", "x")
    val out = TimeSeries.maseBacktest(series, Seq("k"), "t", "x",
      season = 24L, cutoff = 48L).head()
    assert(out.getAs[Long]("n_test") == 24L &&
      out.getAs[Long]("sae_test") == 0L)
    assert(out.getAs[Long]("sae_naive") == 69L) // 46·1 + |0−23|·1
    assert(out.getAs[Double]("mase") == 0.0)
  }

  test("holtLinear: hand-derived level/trend fold; trend tracks a ramp " +
      "a level-only smoother lags") {
    import spark.implicits._
    // x = 100,200,300,400 with α=1/2, β=1/4:
    //   h: 100 → 150 → 231 → 330;  b: 0 → 12 → 29 → 46
    val series = Seq(("a", 1L, 1L, 100L), ("a", 2L, 2L, 200L),
      ("a", 3L, 3L, 300L), ("a", 4L, 4L, 400L)).toDF("k", "t", "u", "x")
    val out = TimeSeries.holtLinear(series, "k", "t", "u", col("x")).head()
    assert(out.getAs[Long]("n") == 4L)
    assert(out.getAs[Long]("level") == 330L)
    assert(out.getAs[Long]("trend") == 46L)
    assert(out.getAs[Long]("forecast") == 376L)
    // single-point series: level = the point, no trend
    val one = Seq(("b", 1L, 1L, 77L)).toDF("k", "t", "u", "x")
    val o1 = TimeSeries.holtLinear(one, "k", "t", "u", col("x")).head()
    assert(o1.getAs[Long]("level") == 77L && o1.getAs[Long]("trend") == 0L)
  }

  test("holtWinters: hand-derived seasonal fold (period 2) and the " +
      "short-series drop-out") {
    import spark.implicits._
    // x = 10,20,14,24,18,28: season-1 init h=15, ss=[-5,5]; the ramp
    // +4/period keeps level climbing while seasonals stay ±5
    val series = Seq(10L, 20L, 14L, 24L, 18L, 28L).zipWithIndex
      .map { case (x, i) => ("a", i.toLong, i.toLong, x) }
      .toDF("k", "t", "u", "x")
    val out = TimeSeries.holtWinters(series, "k", "t", "u", col("x"),
      period = 2).head()
    assert(out.getAs[Long]("n") == 6L)
    assert(out.getAs[Long]("level") == 21L)
    assert(out.getAs[Long]("trend") == 0L)
    assert(out.getAs[Long]("s_next") == -5L) // obs 7 is season slot 1
    assert(out.getAs[Long]("forecast") == 16L)
    // a key without a full season + 1 observations yields no row
    val short = Seq(("b", 1L, 1L, 5L), ("b", 2L, 2L, 6L))
      .toDF("k", "t", "u", "x")
    assert(TimeSeries.holtWinters(short, "k", "t", "u", col("x"),
      period = 2).count() == 0L)
  }

  test("apportion: seats sum exactly, largest remainders win, " +
      "ties break by weight then group") {
    import spark.implicits._
    val w = Seq(("a", 5L), ("b", 3L), ("c", 3L)).toDF("g", "w")
    val out = Sampling.apportion(w, "g", "w", seats = 10L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("seats")).toMap
    assert(out == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // exactness property on awkward weights
    val w2 = Seq(("x", 1L), ("y", 1L), ("z", 1L), ("u", 4L))
      .toDF("g", "w")
    val total = Sampling.apportion(w2, "g", "w", seats = 101L)
      .agg(sum("seats")).head().getLong(0)
    assert(total == 101L)
  }

  test("lDiversityViolations: homogeneous group flagged even when " +
      "k-anonymous, diverse group passes") {
    import spark.implicits._
    val rows = Seq(("g1", "A", 1L), ("g1", "A", 2L), ("g1", "A", 3L),
      ("g2", "A", 4L), ("g2", "B", 5L), ("g2", "C", 6L))
      .toDF("qid", "sens", "id")
    assert(Integrity.kAnonymityViolations(rows, Seq("qid"), 3).count() == 0)
    val v = Integrity.lDiversityViolations(rows, Seq("qid"), "sens", 2L)
      .collect()
    assert(v.length == 1 && v.head.getString(0) == "g1" &&
      v.head.getAs[Long]("n_sensitive") == 1L)
  }

  test("abcClassify: 80/95 head-share classes, ties share a class") {
    import spark.implicits._
    val rows = Seq(
      (1L, 80L),          // cum 80/100 → A (boundary inclusive)
      (2L, 15L),          // cum 95/100 → B (boundary inclusive)
      (3L, 3L), (4L, 1L), (5L, 1L)) // tail → C; ties (1,1) same class
      .toDF("id", "v")
    val out = Quantiles.abcClassify(rows, "id", "v")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("abc_class")).toMap
    assert(out == Map(1L -> "A", 2L -> "B", 3L -> "C", 4L -> "C",
      5L -> "C"))
  }

  test("bucketedCum: two-phase running sum ≡ single window, asc and " +
      "desc, across buckets") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // values spread across the full long range so the range bucketing
    // exercises many buckets AND collisions (both 2-bucket and 1024)
    val vals = (Seq(-900000L, -1L, 0L, 3L, 7L, 12L, 999L, 40000L,
      777777L, 900001L) ++ (1 to 50).map(i => i * 13L)).distinct
    val hist = vals.map(v => (v, v % 7 + 1))
      .toDF("v", "k").localCheckpoint()
    for (desc <- Seq(false, true); buckets <- Seq(2, 16, 1024)) {
      val got = Quantiles.bucketedCum(hist, "v", col("k"), desc, "cum",
          buckets)
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("cum"))
        .toMap
      val w = Window.orderBy(if (desc) col("v").desc else col("v").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val want = hist.withColumn("cum", sum(col("k")).over(w))
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("cum"))
        .toMap
      assert(got == want, s"desc=$desc buckets=$buckets")
    }
  }

  test("packedMaskAccounting: hand-derived fragments, pair sums, and leak share") {
    import spark.implicits._
    import graft.ops.Packing
    // one shard, capacity 10; doc lengths 4, 4, 5 -> stream of 13:
    //   window 0 holds frags 4, 4, 2 (doc 3 splits); window 1 holds 3
    val docs = Seq(
      (1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l m"))
      .toDF("doc_id", "text")
    val out = Packing.packedMaskAccounting(docs, "doc_id", "text",
        capacity = 10, shards = 1, salt = "pm")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // w0: T=10 causal 55; masked 10+10+3 = 23; leak 32/55 = 0.581818..
    assert(out(0L) == (3L, 10L, 55L, 23L, 581818L))
    // w1: one 3-token fragment; fully masked, zero leak
    assert(out(1L) == (1L, 3L, 6L, 6L, 0L))
    // conservation: fragment tokens sum to the corpus token count
    assert(out.values.map(_._2).sum == 13L)
  }
}
