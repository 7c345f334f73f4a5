package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.similarity.{GraphANN, IVF, Similarity}
import graft.streaming.VectorSinks

/** The streaming face of the vector/ANN family: incremental k-NN-graph
  * maintenance and incremental IVF assignment, each gated by BATCH
  * PARITY (N streamed epochs ≡ the batch operator on the union of all
  * epochs) plus the torn-commit restart cases every epoch-snapshot sink
  * carries.
  */
class VectorSinksSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Deterministic corpus: 3 loose clusters in 8-d so the LSH bands
    * produce real collisions and the graph has structure. */
  private def vec(i: Int): Seq[Double] = {
    val c = i % 3
    Seq.tabulate(8)(d => math.sin(c * 37 + d) * 2 + math.sin(i * 8 + d) * 0.3)
  }

  private val (dim, gk, bits, bands) = (8, 4, 3, 2)

  /** Delete the newest streaming commit so the source replays the last
    * epoch on restart (same device as StreamsSpec's restart cases). */
  private def tearLastCommit(ckp: String): Unit = {
    val dir = new java.io.File(ckp, "commits")
    val commits = dir.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty, s"no commits under $ckp")
    val crc = new java.io.File(dir, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) { crc.delete(); () }
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Long)] =
    df.select(col("src"), col("dst"), col("cosine"), col("rn"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  test("incrementalKnnGraphSink: three streamed epochs equal the batch " +
      "knnGraph on the union, rn included, and old nodes gain new edges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double])]
    val vecs = mem.toDF().toDF("id", "ev")
    val (bandsDir, vecsDir, edgesDir, markers, ckp) =
      (tmp("kg-bands"), tmp("kg-vecs"), tmp("kg-edges"),
        tmp("kg-mark"), tmp("kg-ckp"))
    Seq(bandsDir, vecsDir, edgesDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = VectorSinks.incrementalKnnGraphSink(vecs, dim, gk, bits,
        bands, bandsDir, vecsDir, edgesDir, markers, ckp,
        Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    val all = (0 until 36).map(i => (i.toLong, vec(i)))
    mem.addData(all.slice(0, 12): _*); run()
    val afterE0 = edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir))
    mem.addData(all.slice(12, 24): _*); run()
    mem.addData(all.slice(24, 36): _*); run()

    val streamed = edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir))
    val batch = edgeSet(GraphANN.knnGraph(
      all.toDF("id", "ev"), dim, gk, bits, bands))
    assert(streamed == batch,
      s"streamed-only=${(streamed -- batch).take(5)} " +
        s"batch-only=${(batch -- streamed).take(5)}")
    // an epoch-0 node picked up a strictly better later-epoch neighbour
    // (its epoch-0 edge set changed) — the old-node-gains-edges path ran
    val e0Srcs = afterE0.map(_._1)
    val changed = e0Srcs.exists(s =>
      afterE0.filter(_._1 == s) != streamed.filter(_._1 == s))
    assert(changed, "no epoch-0 node's edge list changed across epochs")
  }

  test("incrementalKnnGraphSink restart: a torn epoch replays without " +
      "corrupting the graph — committed marker skips, torn marker heals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double])]
    val vecs = mem.toDF().toDF("id", "ev")
    val (bandsDir, vecsDir, edgesDir, markers, ckp) =
      (tmp("kr-bands"), tmp("kr-vecs"), tmp("kr-edges"),
        tmp("kr-mark"), tmp("kr-ckp"))
    Seq(bandsDir, vecsDir, edgesDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = VectorSinks.incrementalKnnGraphSink(vecs, dim, gk, bits,
        bands, bandsDir, vecsDir, edgesDir, markers, ckp,
        Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    val all = (0 until 24).map(i => (i.toLong, vec(i)))
    mem.addData(all.slice(0, 12): _*); run()
    mem.addData(all.slice(12, 24): _*); run()
    val before = edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir))

    // case 1: commit torn, marker intact -> epoch body skipped entirely
    tearLastCommit(ckp); run()
    assert(edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir)) == before)

    // case 2: marker ALSO lost (crash before marker write, after the
    // history appends) -> full replay against history that already
    // contains the batch; dedup-on-read heals, graph unchanged
    tearLastCommit(ckp)
    val ms = new java.io.File(markers).listFiles()
      .filter(_.getName.endsWith(".done")).sortBy(_.getName)
    assert(ms.nonEmpty && ms.last.delete())
    run()
    val after = edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir))
    assert(after == before,
      s"replay diverged: only-after=${(after -- before).take(5)} " +
        s"only-before=${(before -- after).take(5)}")
  }

  test("incrementalIvfAssignSink: streamed assignments equal the batch " +
      "IVF.assign on the union; beam search runs off the streamed graph") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double])]
    val vecs = mem.toDF().toDF("id", "ev")
    val (assignDir, markers, ckp) =
      (tmp("ia-assign"), tmp("ia-mark"), tmp("ia-ckp"))
    Files.delete(java.nio.file.Paths.get(assignDir))
    val all = (0 until 30).map(i => (i.toLong, vec(i)))
    val cents = IVF.collectCentroids(
      Seq((0L, vec(0)), (1L, vec(1)), (2L, vec(2))).toDF("cid", "cv"),
      "cid", "cv")
    def run(): Unit = {
      val q = VectorSinks.incrementalIvfAssignSink(vecs, cents,
        assignDir, markers, ckp, Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    mem.addData(all.slice(0, 10): _*); run()
    mem.addData(all.slice(10, 30): _*); run()
    // read through the canonical dedup readout (no tombstone dir here)
    val streamed = VectorSinks
      .liveAssignments(spark, assignDir, tmp("ia-no-tombs") + "/none")
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = IVF.assign(all.toDF("id", "ev"), cents)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)

    // the composite: IVF seeds + the STREAMED graph serve a search
    val (bandsDir, vecsDir, edgesDir, gMark, gCkp) =
      (tmp("ic-bands"), tmp("ic-vecs"), tmp("ic-edges"),
        tmp("ic-mark"), tmp("ic-ckp"))
    Seq(bandsDir, vecsDir, edgesDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    val gm = MemoryStream[(Long, Seq[Double])]
    val gq = VectorSinks.incrementalKnnGraphSink(
      gm.toDF().toDF("id", "ev"), dim, gk, bits, bands,
      bandsDir, vecsDir, edgesDir, gMark, gCkp, Trigger.AvailableNow())
    gm.addData(all: _*)
    gq.awaitTermination(180000)
    val base = all.toDF("id", "ev")
    val queries = Seq((0L, vec(7))).toDF("qid", "qv")
    val (found, nScored) = GraphANN.beamSearchTopKFrom(base, queries,
      VectorSinks.latestKnnGraph(spark, edgesDir),
      queries.select(col("qid")).crossJoin(
        base.filter(col("id") < 3).select(col("id"))),
      beam = 6, rounds = 3, k = 3)
    val brute = Similarity.bruteForceTopK(base, queries, 3)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val got = found.select(col("id")).collect().map(_.getLong(0)).toSet
    assert((brute & got).nonEmpty)
    assert(nScored.collect().head.getLong(1) <= 30L)
  }

  test("topLayerSink: streamed entry layer equals the batch derivation; " +
      "a search served ENTIRELY from streamed state (layer + graph) " +
      "equals one served from batch-built state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = (0 until 40).map(i => (i.toLong, vec(i)))
    val mem = MemoryStream[(Long, Seq[Double])]
    val (layerState, lCkp) = (tmp("tl-state"), tmp("tl-ckp"))
    def run(): Unit = {
      val q = VectorSinks.topLayerSink(mem.toDF().toDF("id", "ev"),
        layerSize = 8, salt = "hier", layerState, lCkp,
        Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    mem.addData(all.slice(0, 15): _*); run()
    mem.addData(all.slice(15, 30): _*); run()
    mem.addData(all.slice(30, 40): _*); run()
    val streamedLayer = VectorSinks.latestTopLayer(spark, layerState)
      .collect().map(_.getLong(0)).toSet
    val base = all.toDF("id", "ev")
    val batchLayer = GraphANN.topLayer(base, 8, "hier")
      .collect().map(_.getLong(0)).toSet
    assert(streamedLayer == batchLayer,
      s"streamed=$streamedLayer batch=$batchLayer")

    // end-to-end: stream the graph too, then serve a search from
    // NOTHING but streamed state — must equal the batch-built answer
    val gm = MemoryStream[(Long, Seq[Double])]
    val (bandsDir, vecsDir, edgesDir, gMark, gCkp) =
      (tmp("tg-bands"), tmp("tg-vecs"), tmp("tg-edges"),
        tmp("tg-mark"), tmp("tg-ckp"))
    Seq(bandsDir, vecsDir, edgesDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    val gq = VectorSinks.incrementalKnnGraphSink(
      gm.toDF().toDF("id", "ev"), dim, gk, bits, bands,
      bandsDir, vecsDir, edgesDir, gMark, gCkp, Trigger.AvailableNow())
    gm.addData(all.slice(0, 20): _*)
    gm.addData(all.slice(20, 40): _*)
    gq.awaitTermination(180000)
    val queries = Seq((0L, vec(11)), (1L, vec(25))).toDF("qid", "qv")
    def search(edges: org.apache.spark.sql.DataFrame,
        layer: org.apache.spark.sql.DataFrame) = {
      val (found, _) = GraphANN.beamSearchTopKFrom(base, queries, edges,
        queries.select(col("qid")).crossJoin(layer), beam = 6,
        rounds = 2, k = 3)
      found.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    }
    val fromStream = search(VectorSinks.latestKnnGraph(spark, edgesDir),
      VectorSinks.latestTopLayer(spark, layerState))
    val fromBatch = search(GraphANN.knnGraph(base, dim, gk, bits, bands),
      GraphANN.topLayer(base, 8, "hier"))
    assert(fromStream == fromBatch,
      s"stream-only=${fromStream -- fromBatch} batch-only=${fromBatch -- fromStream}")
  }

  test("upsertKnnGraphSink: mixed insert/delete epochs equal the batch " +
      "graph on the live set; a torn epoch replays without corruption") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double], String)]
    val changes = mem.toDF().toDF("id", "ev", "op")
    val (bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp) =
      (tmp("up-bands"), tmp("up-vecs"), tmp("up-tombs"), tmp("up-edges"),
        tmp("up-mark"), tmp("up-ckp"))
    Seq(bandsDir, vecsDir, tombsDir, edgesDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = VectorSinks.upsertKnnGraphSink(changes, dim, gk, bits,
        bands, bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    def add(r: Range) = r.map(i => (i.toLong, vec(i), "add"))
    def del(ids: Long*) = ids.map(i => (i, Seq.empty[Double], "del"))
    // epoch 0: pure inserts; epoch 1: inserts + a delete of an OLD id;
    // epoch 2: delete-only epoch removing an id inserted the epoch
    // before plus one from epoch 0
    mem.addData(add(0 until 14): _*); run()
    mem.addData(add(14 until 26) ++ del(4L): _*); run()
    mem.addData(del(20L, 7L): _*); run()

    val liveIds = ((0 until 26).map(_.toLong).toSet -- Set(4L, 20L, 7L))
    val live = (0 until 26).map(i => (i.toLong, vec(i)))
      .filter(p => liveIds(p._1)).toDF("id", "ev")
    val streamed = edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir))
    val batch = edgeSet(GraphANN.knnGraph(live, dim, gk, bits, bands))
    assert(streamed == batch,
      s"streamed-only=${(streamed -- batch).take(5)} " +
        s"batch-only=${(batch -- streamed).take(5)}")
    // no ghost edges anywhere
    val ids = streamed.flatMap(e => Set(e._1, e._2))
    assert(ids.subsetOf(liveIds), s"ghosts: ${ids -- liveIds}")

    // torn replay of the delete-only epoch: marker + commit gone after
    // every append landed — dedup-on-read + tombstone anti-joins heal
    val ms = new java.io.File(markers).listFiles()
      .filter(_.getName.endsWith(".done")).sortBy(_.getName)
    assert(ms.nonEmpty && ms.last.delete())
    tearLastCommit(ckp)
    run()
    assert(edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir)) == batch)
  }

  test("plan shape: the epoch fold and the deletion repair build no " +
      "cartesian product — every join is keyed") {
    import spark.implicits._
    val hist = (0 until 200).map(i => (i.toLong, vec(i))).toDF("id", "ev")
    val delta = (200 until 210).map(i => (i.toLong, vec(i))).toDF("id", "ev")
    val histBands = GraphANN.bandedBuckets(hist, dim, bits, bands)
    val prev = GraphANN.knnGraph(hist, dim, gk, bits, bands)
    val epochPlan = VectorSinks.knnGraphEpoch(delta, histBands, hist,
      prev, dim, gk, bits, bands).queryExecution.executedPlan.toString
    assert(!epochPlan.contains("CartesianProduct"), epochPlan.take(500))
    val repairPlan = GraphANN.repairAfterDelete(histBands, hist, prev,
        hist.filter(col("id") < 5).select(col("id")), gk)
      .queryExecution.executedPlan.toString
    assert(!repairPlan.contains("CartesianProduct"), repairPlan.take(500))
  }

  test("upsertKnnGraphSink round 13: UPDATE (add of a live id) and " +
      "RE-ADD (add after delete) equal the batch graph on the latest " +
      "versions; a torn update epoch replays identically") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double], String)]
    val changes = mem.toDF().toDF("id", "ev", "op")
    val (bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp) =
      (tmp("ur-bands"), tmp("ur-vecs"), tmp("ur-tombs"), tmp("ur-edges"),
        tmp("ur-mark"), tmp("ur-ckp"))
    Seq(bandsDir, vecsDir, tombsDir, edgesDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = VectorSinks.upsertKnnGraphSink(changes, dim, gk, bits,
        bands, bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    def add(r: Range) = r.map(i => (i.toLong, vec(i), "add"))
    val (v5, v2) = (vec(105), vec(202))
    mem.addData(add(0 until 14): _*); run()
    mem.addData((add(14 until 20) :+ ((5L, Seq.empty[Double], "del"))): _*)
    run()
    // epoch 2: RE-ADD 5 with a NEW vector + UPDATE live id 2 in place
    mem.addData((5L, v5, "add"), (2L, v2, "add")); run()

    val latest = (0 until 20).map { i =>
      (i.toLong, i match { case 5 => v5; case 2 => v2; case _ => vec(i) })
    }
    val batch = edgeSet(GraphANN.knnGraph(
      latest.toDF("id", "ev"), dim, gk, bits, bands))
    val streamed = edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir))
    assert(streamed == batch,
      s"streamed-only=${(streamed -- batch).take(5)} " +
        s"batch-only=${(batch -- streamed).take(5)}")

    // torn replay of the update/re-add epoch: marker + commit gone
    // after every versioned append landed — the strictly-before epoch
    // filter must reconstruct the first run's state exactly
    val ms = new java.io.File(markers).listFiles()
      .filter(_.getName.endsWith(".done")).sortBy(_.getName)
    assert(ms.nonEmpty && ms.last.delete())
    tearLastCommit(ckp)
    run()
    assert(edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir)) == batch)
  }

  test("upsertKnnGraphSink assignment option: liveAssignmentsVersioned " +
      "sees deletes, updates and re-adds; enumerated compaction never " +
      "resurrects erased ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double], String)]
    val changes = mem.toDF().toDF("id", "ev", "op")
    val (bandsDir, vecsDir, tombsDir, edgesDir, assignDir, markers, ckp) =
      (tmp("ua-bands"), tmp("ua-vecs"), tmp("ua-tombs"), tmp("ua-edges"),
        tmp("ua-assign"), tmp("ua-mark"), tmp("ua-ckp"))
    Seq(bandsDir, vecsDir, tombsDir, edgesDir, assignDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    val cents = IVF.collectCentroids(
      Seq((0L, vec(0)), (1L, vec(1)), (2L, vec(2))).toDF("cid", "cv"),
      "cid", "cv")
    def run(): Unit = {
      val q = VectorSinks.upsertKnnGraphSink(changes, dim, gk, bits,
        bands, bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp,
        assignCents = cents, assignDir = assignDir,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    def add(r: Range) = r.map(i => (i.toLong, vec(i), "add"))
    val v4 = vec(204)
    mem.addData(add(0 until 10): _*); run()
    mem.addData((4L, v4, "add"), (3L, Seq.empty[Double], "del")); run()
    mem.addData((3L, vec(103), "add")); run() // re-add after delete

    val latest = (0 until 10).map { i =>
      (i.toLong, i match { case 3 => vec(103); case 4 => v4; case _ => vec(i) })
    }
    val expect = IVF.assign(latest.toDF("id", "ev"), cents)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val versioned = VectorSinks
      .liveAssignmentsVersioned(spark, assignDir, tombsDir)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(versioned == expect)
    // the conservative readout hides the once-tombstoned id 3 forever
    val conservative = VectorSinks
      .liveAssignments(spark, assignDir, tombsDir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(conservative == expect.keySet - 3L)

    // erase id 7, then compact with the assign dir ENUMERATED: the
    // erased id must be physically gone from every dir (no row for a
    // resurrect to come from), tombstones cleared, and the revived id 3
    // visible in BOTH readouts afterwards
    mem.addData((7L, Seq.empty[Double], "del")); run()
    VectorSinks.compactVectorState(spark, bandsDir, vecsDir, tombsDir,
      assignDirs = Seq(assignDir))
    assert(!new java.io.File(tombsDir).exists())
    assert(spark.read.parquet(assignDir)
      .filter(col("id") === 7L).count() == 0L)
    assert(spark.read.parquet(vecsDir)
      .filter(col("id") === 7L).count() == 0L)
    // the updated id 4 keeps exactly ONE (latest) assignment row
    assert(spark.read.parquet(assignDir)
      .filter(col("id") === 4L).count() == 1L)
    val afterCompact = VectorSinks
      .liveAssignments(spark, assignDir, tombsDir)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterCompact == expect - 7L)

    // the stream continues over the compacted state with full parity
    mem.addData(add(10 until 14): _*); run()
    val live2 = (latest.filter(_._1 != 7L) ++
      (10 until 14).map(i => (i.toLong, vec(i)))).toDF("id", "ev")
    assert(edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir)) ==
      edgeSet(GraphANN.knnGraph(live2, dim, gk, bits, bands)))
  }

  test("recenterVectorState in the combined layout: trains on the " +
      "conservative live view but preserves EVERY id's latest row — " +
      "revived ids stay visible to the versioned readout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double], String)]
    val changes = mem.toDF().toDF("id", "ev", "op")
    val (bandsDir, vecsDir, tombsDir, edgesDir, assignDir, markers, ckp) =
      (tmp("rl-bands"), tmp("rl-vecs"), tmp("rl-tombs"), tmp("rl-edges"),
        tmp("rl-assign"), tmp("rl-mark"), tmp("rl-ckp"))
    Seq(bandsDir, vecsDir, tombsDir, edgesDir, assignDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    val cents = IVF.collectCentroids(
      Seq((0L, vec(0)), (1L, vec(1)), (2L, vec(2))).toDF("cid", "cv"),
      "cid", "cv")
    def run(): Unit = {
      val q = VectorSinks.upsertKnnGraphSink(changes, dim, gk, bits,
        bands, bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp,
        assignCents = cents, assignDir = assignDir,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    mem.addData((0 until 10).map(i => (i.toLong, vec(i), "add")): _*)
    run()
    mem.addData((4L, Seq.empty[Double], "del")); run()
    mem.addData((4L, vec(104), "add")); run() // revived with a new vector

    val latest = (0 until 10).map { i =>
      (i.toLong, if (i == 4) vec(104) else vec(i))
    }
    val newCents =
      VectorSinks.recenterVectorState(spark, assignDir, tombsDir)
    // training excluded the tombstoned-once id 4 (erasure-safe view)...
    val lloyd = graft.similarity.KMeans
      .lloydStep(latest.filter(_._1 != 4L).toDF("id", "ev"), cents)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2).toVector)
      .toMap
    assert(newCents.toMap == lloyd)
    // ...but the REWRITE kept every id's latest row: the revived id is
    // still there, reassigned to the new model
    val versioned = VectorSinks
      .liveAssignmentsVersioned(spark, assignDir, tombsDir)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = IVF.assign(latest.toDF("id", "ev"), newCents)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(versioned == expect)
    // the conservative readout still hides it (tombstones untouched)
    assert(VectorSinks.liveAssignments(spark, assignDir, tombsDir)
      .select(col("id")).collect().map(_.getLong(0)).toSet ==
      expect.keySet - 4L)
  }

  test("recenterVectorState: post-recenter assignments equal batch " +
      "IVF.assign on the new centroids (= the Lloyd update), recall " +
      "under drift never degrades, and the relaunched sink keeps parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double])]
    val vecs = mem.toDF().toDF("id", "ev")
    val (assignDir, markers, ckp) =
      (tmp("rc-assign"), tmp("rc-mark"), tmp("rc-ckp"))
    Files.delete(java.nio.file.Paths.get(assignDir))
    val noTombs = tmp("rc-no-tombs") + "/none"
    val cents0 = IVF.collectCentroids(
      Seq((0L, vec(0)), (1L, vec(1)), (2L, vec(2))).toDF("cid", "cv"),
      "cid", "cv")
    // a drifted cluster the launch-time centroids never saw
    def drift(i: Int): Seq[Double] =
      Seq.tabulate(dim)(d => math.sin(77 + d) * 3 + math.sin(i * 8 + d) * 0.2)
    def run(c: Seq[(Long, Seq[Double])], cp: String): Unit = {
      val q = VectorSinks.incrementalIvfAssignSink(vecs, c,
        assignDir, markers, cp, Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    val orig = (0 until 18).map(i => (i.toLong, vec(i)))
    val drifted = (100 until 118).map(i => (i.toLong, drift(i)))
    mem.addData(orig: _*); run(cents0, ckp)
    mem.addData(drifted: _*); run(cents0, ckp)

    val union = (orig ++ drifted).toDF("id", "ev")
    val newCents = VectorSinks.recenterVectorState(spark, assignDir, noTombs)

    // parity 1: the returned model IS the Lloyd update on the union
    val lloyd = graft.similarity.KMeans.lloydStep(union, cents0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2).toVector)
      .toMap
    assert(newCents.toMap == lloyd)
    // parity 2: the rewritten dir IS batch IVF.assign on the new model
    val rewritten = VectorSinks.liveAssignments(spark, assignDir, noTombs)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchAssign = IVF.assign(union, newCents)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rewritten == batchAssign)

    // drift probe: a query inside the drifted cluster — the recentered
    // model's nProbe=1 recall@3 vs brute must not be worse than the
    // stale model's, and the probed centroid must have moved TOWARD the
    // drifted mass (cosine to the drifted mean strictly improves)
    val queries = Seq((0L, drift(200))).toDF("qid", "qv")
    def recall(c: Seq[(Long, Seq[Double])]): Int = {
      val got = IVF.topK(union, queries, c, nProbe = 1, k = 3)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val brute = Similarity.bruteForceTopK(union, queries, 3)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      (got & brute).size
    }
    val (rOld, rNew) = (recall(cents0), recall(newCents))
    assert(rNew >= rOld, s"recall degraded: stale=$rOld recentered=$rNew")
    val dMean = Seq.tabulate(dim)(d =>
      drifted.map(_._2(d)).sum / drifted.size)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / math.sqrt(a.map(x => x * x).sum) / math.sqrt(b.map(x => x * x).sum)
    }
    val dCell = IVF.assign(drifted.toDF("id", "ev"), newCents)
      .groupBy(col("cell")).count().orderBy(col("count").desc)
      .collect().head.getLong(0)
    assert(cos(newCents.toMap.apply(dCell), dMean) >
      cos(cents0.toMap.apply(dCell), dMean),
      "recenter did not move the drifted cell's centroid toward the drift")

    // relaunch with the returned model: subsequent epochs keep the
    // liveAssignments ≡ IVF.assign(live union, current model) invariant
    mem.addData((200 until 206).map(i => (i.toLong, drift(i))): _*)
    run(newCents, ckp)
    val union2 = (orig ++ drifted ++
      (200 until 206).map(i => (i.toLong, drift(i)))).toDF("id", "ev")
    val after = VectorSinks.liveAssignments(spark, assignDir, noTombs)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch2 = IVF.assign(union2, newCents)
      .select(col("id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == batch2)
  }

  test("compactVectorState: tombstoned/duplicate rows physically drop, " +
      "tombstones clear, and epochs AFTER compaction still reproduce " +
      "the batch graph") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Seq[Double], String)]
    val changes = mem.toDF().toDF("id", "ev", "op")
    val (bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp) =
      (tmp("cp-bands"), tmp("cp-vecs"), tmp("cp-tombs"), tmp("cp-edges"),
        tmp("cp-mark"), tmp("cp-ckp"))
    Seq(bandsDir, vecsDir, tombsDir, edgesDir)
      .foreach(d => Files.delete(java.nio.file.Paths.get(d)))
    def run(): Unit = {
      val q = VectorSinks.upsertKnnGraphSink(changes, dim, gk, bits,
        bands, bandsDir, vecsDir, tombsDir, edgesDir, markers, ckp,
        trigger = Trigger.AvailableNow())
      q.awaitTermination(180000)
    }
    def add(r: Range) = r.map(i => (i.toLong, vec(i), "add"))
    mem.addData(add(0 until 16): _*); run()
    mem.addData((add(16 until 24) :+ ((3L, Seq.empty[Double], "del"))): _*)
    run()
    VectorSinks.compactVectorState(spark, bandsDir, vecsDir, tombsDir)
    // tombstones cleared; histories physically reduced to live rows
    assert(!new java.io.File(tombsDir).exists())
    assert(spark.read.parquet(vecsDir).count() == 23L)
    assert(spark.read.parquet(bandsDir)
      .filter(col("id") === 3L).count() == 0L)
    // the stream continues over the compacted state
    mem.addData(add(24 until 30): _*); run()
    val live = (0 until 30).map(i => (i.toLong, vec(i)))
      .filter(_._1 != 3L).toDF("id", "ev")
    val streamed = edgeSet(VectorSinks.latestKnnGraph(spark, edgesDir))
    val batch = edgeSet(GraphANN.knnGraph(live, dim, gk, bits, bands))
    assert(streamed == batch,
      s"streamed-only=${(streamed -- batch).take(5)} " +
        s"batch-only=${(batch -- streamed).take(5)}")
  }
}
