package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.similarity.{GraphANN, IVF, TopK}

/** The STREAMING face of the vector/ANN family (round-12 item 1) —
  * embeddings arriving continuously maintain the same two structures
  * the batch operators build from scratch: the banded-LSH k-NN graph
  * ([[graft.similarity.GraphANN.knnGraph]]) and the IVF cell assignment
  * ([[graft.similarity.IVF.assign]]). Every other heavy family (exact
  * dedup, near-dup, release, rollups, sketches, layouts) already has an
  * epoch-snapshot sink; this closes the one that forced a from-scratch
  * rebuild per arrival batch.
  *
  * Re-expresses the reference's accumulate-per-batch streaming shape
  * (reference: spark_apps/pubg_streaming.py:236-244 — foreachBatch over
  * micro-batches with persisted state) for vector search state.
  *
  * Why the k-NN graph is incrementally maintainable at all: per-node
  * top-k edge lists form a merge monoid — topk(topk(A) ∪ B) =
  * topk(A ∪ B), because any edge evicted from A was dominated by k
  * still-present better edges — and the banded-LSH candidate set of the
  * union corpus is exactly the union of (in-epoch pairs) ∪ (epoch ×
  * history collisions), since a pair's bucket keys are pure functions
  * of the two vectors: the pair (a, b) is discovered in epoch
  * max(epoch_a, epoch_b), both directions. So the streamed graph after
  * N epochs EQUALS the batch graph on the union — VectorSinksSpec
  * asserts it row for row, rn included.
  *
  * Per-epoch cost (the scale contract): bucket keys for the DELTA only;
  * one (band, bucket)-keyed join of the delta against the banded
  * history (history is scanned, never broadcast, and never self-joined
  * again); exact re-rank of the delta's candidate mass only
  * (Σ|bucket ∩ delta| · |bucket| per band — proportional to the delta
  * at stable bucket occupancy); and a bounded-buffer top-k merge that
  * re-aggregates ONLY the affected src nodes — untouched nodes' edge
  * rows are copied forward without re-ranking. Nothing per-epoch is
  * quadratic in history size. Measured (ScaleProbe `knngraph_epoch`,
  * fixed delta): FLAT at 8× history (3.5 → 3.3 s); 8.4× at 32× — the
  * 32× case replicates exact copies, densifying every bucket 32× (the
  * adversarial occupancy case; a real stream's occupancy is stable).
  *
  * Two honest costs of the epoch-versioned replay discipline, with the
  * production answers: (1) the snapshot WRITE is O(n·k) I/O per epoch
  * even when few nodes changed — a deployment at corpus scale moves
  * the edge state to a partitioned table with dynamic partition
  * overwrite (src-hash partitions; only affected partitions rewrite),
  * which needs the ACID table jars absent from this container (the
  * carried round-2 seam); (2) the banded history SCAN grows with the
  * corpus — compact it periodically (it is plain parquet) and prune by
  * the delta's (band, bucket) set via partition/bucket pruning.
  */
object VectorSinks {

  import Streams.{epochSnapshots, stateDirExists => dirExists, stateFs}

  /** One epoch of incremental graph maintenance as a pure frame
    * transform — the sink wraps it in state IO; ScaleProbe times it
    * against an m×-grown history (the flat-per-epoch evidence).
    *
    * @param delta     this epoch's new vectors (id, ev)
    * @param histBands accumulated (id, band, bucket) of prior epochs
    * @param histVecs  accumulated (id, ev) of prior epochs
    * @param prevEdges the previous graph snapshot (src, dst, cosine, rn)
    * @return the merged graph (src, dst, cosine, rn ≤ k) */
  def knnGraphEpoch(delta: DataFrame, histBands: DataFrame,
      histVecs: DataFrame, prevEdges: DataFrame, dim: Int, k: Int,
      bits: Int, bands: Int): DataFrame = {
    val newBands = GraphANN.bandedBuckets(delta, dim, bits, bands)
    // in-epoch pairs (self-join of the delta's keys, both directions
    // via a.id =!= b.id) ∪ epoch×history collisions (both directions
    // emitted explicitly — an old node can gain a new neighbour).
    // distinct() collapses multi-band hits and, on a torn replay, the
    // self-join/history overlap.
    val inEpoch = newBands.as("a")
      .join(newBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
    val cross = newBands.as("a")
      .join(histBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"))
    val cand = inEpoch
      .union(cross)
      .union(cross.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val allVecs = delta.union(histVecs).dropDuplicates("id")
    val newEdges = cand
      .join(allVecs.select(col("id").as("src"), col("ev").as("__sv")),
        "src")
      .join(allVecs.select(col("id").as("dst"), col("ev").as("__dv")),
        "dst")
      .select(col("src"), col("dst"),
        graft.similarity.Similarity
          .cosineNative(col("__sv"), col("__dv")).as("cosine"))
    // re-rank ONLY nodes that gained candidates; everyone else's edge
    // rows carry forward untouched (no graph-wide re-agg)
    val affected = cand.select(col("src")).distinct()
    TopK.perGroup(
        prevEdges.join(affected, Seq("src"), "left_semi")
          .select(col("src"), col("dst"), col("cosine"))
          .unionByName(newEdges),
        Seq("src"), "dst", "cosine", k)
      .unionByName(
        prevEdges.join(affected, Seq("src"), "left_anti"))
  }

  /** Incremental k-NN-graph maintenance. State:
    *
    *  - `bandsDir` (append-only): (id, band, bucket) — `bands` slim
    *    rows per historical vector, the candidate index.
    *  - `vecsDir` (append-only): (id, ev) — exact-re-rank vectors.
    *  - `edgesDir` (epoch-versioned snapshots, `epoch=N`): the current
    *    graph (src, dst, cosine, rn ≤ k) — two-snapshot retention, the
    *    [[StateSinks.incrementalRollupSink]] protocol.
    *
    * Replay contract: a committed epoch is skipped by its durable
    * marker; a torn epoch (crash after the edge snapshot or between the
    * history appends) replays against the newest snapshot STRICTLY
    * older than itself and is self-healing — history reads dedup by id
    * (`bands.distinct`, `vecs.dropDuplicates(id)`), so a double-append
    * changes nothing but bytes (compaction is the production cleanup),
    * and candidate pairs the partial run already merged re-score to the
    * same cosine and re-rank to the same rn (top-k merge idempotence).
    * VectorSinksSpec tears the last commit and asserts the graph is
    * byte-identical.
    *
    * @param vecStream streaming (id: long, ev: array&lt;double&gt;) */
  def incrementalKnnGraphSink(vecStream: DataFrame, dim: Int, k: Int,
      bits: Int, bands: Int, bandsDir: String, vecsDir: String,
      edgesDir: String, markerDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val guarded = Streams.idempotentSink(markerDir) { (_, batch, epochId) =>
      val spark = batch.sparkSession
      val delta = batch.select(col("id"), col("ev")).persist()
      try {
        val newBands = GraphANN.bandedBuckets(delta, dim, bits, bands)
          .persist()
        try {
          val histBands =
            if (dirExists(spark, bandsDir))
              spark.read.parquet(bandsDir).distinct()
            else newBands.limit(0)
          val histVecs =
            if (dirExists(spark, vecsDir))
              spark.read.parquet(vecsDir).dropDuplicates("id")
            else delta.limit(0)
          val prev = epochSnapshots(spark, edgesDir)
            .filter(_._1 < epochId).lastOption
          val prevEdges = prev match {
            case Some((_, dir)) => spark.read.parquet(dir.toString)
            case None => delta.limit(0)
              .select(col("id").as("src"), col("id").as("dst"),
                lit(0.0).as("cosine"), lit(0L).as("rn"))
          }
          knnGraphEpoch(delta, histBands, histVecs, prevEdges, dim, k,
              bits, bands)
            .write.mode("overwrite").parquet(s"$edgesDir/epoch=$epochId")
          // history appends AFTER the snapshot: a crash between them
          // replays into the dedup-on-read healing path above
          newBands.write.mode("append").parquet(bandsDir)
          delta.write.mode("append").parquet(vecsDir)
          val fs = stateFs(spark, edgesDir)._1
          for ((e, dir) <- epochSnapshots(spark, edgesDir)
               if e < prev.map(_._1).getOrElse(epochId)) {
            fs.delete(dir, true); ()
          }
        } finally { newBands.unpersist(); () }
      } finally { delta.unpersist(); () }
    }
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) guarded("knngraph", batch, epochId)
      }
      .start()
  }

  /** The CDC form (round 12): ONE sink consuming a change stream of
    * inserts AND deletes — `op` = "add" rows carry (id, ev), `op` =
    * "del" rows carry the tombstoned id. Per epoch, inserts fold in
    * via [[knnGraphEpoch]] against the LIVE history (histories minus
    * all tombstones, so a new vector never edges to a ghost), then the
    * epoch's tombstones repair the result via
    * [[graft.similarity.GraphANN.repairAfterDelete]] (affected-src-only
    * re-rank over surviving candidates). State: the insert sink's
    * bands/vecs dirs plus an append-only `tombsDir` of deleted ids —
    * histories stay append-only (the parquet-tombstone recipe; a
    * compaction pass physically drops dead rows when wanted).
    *
    * Contracts: ids are unique across the stream's lifetime and never
    * re-added after deletion (the tombstone is permanent — same
    * uniqueness contract as the insert sink); an epoch's add and del
    * sets are disjoint. Parity (spec-asserted): N mixed epochs equal
    * the batch [[graft.similarity.GraphANN.knnGraph]] on the LIVE set
    * (inserted minus deleted) — the q450/q451 cross-engine arguments
    * composed. Replay: marker-guarded; a torn epoch replays
    * self-healingly exactly as the insert sink does (dedup-on-read +
    * anti-join of tombstones), since a replayed delete of an
    * already-tombstoned id repairs nothing twice (its edges are
    * already gone from the strictly-older snapshot... or re-derived
    * identically when the tear predates the edge write).
    *
    * @param changeStream (id: long, ev: array&lt;double&gt; nullable,
    *                     op: string "add" | "del") */
  def upsertKnnGraphSink(changeStream: DataFrame, dim: Int, k: Int,
      bits: Int, bands: Int, bandsDir: String, vecsDir: String,
      tombsDir: String, edgesDir: String, markerDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val guarded = Streams.idempotentSink(markerDir) { (_, batch, epochId) =>
      val spark = batch.sparkSession
      val delta = batch.filter(col("op") === "add")
        .select(col("id"), col("ev")).persist()
      val tomb = batch.filter(col("op") === "del")
        .select(col("id")).distinct().persist()
      try {
        val newBands = GraphANN.bandedBuckets(delta, dim, bits, bands)
          .persist()
        try {
          val prevTombs =
            if (dirExists(spark, tombsDir))
              spark.read.parquet(tombsDir).distinct()
            else tomb.limit(0)
          val allTombs = prevTombs.union(tomb).distinct()
          val histBands =
            (if (dirExists(spark, bandsDir))
               spark.read.parquet(bandsDir).distinct()
             else newBands.limit(0))
              .join(allTombs, Seq("id"), "left_anti")
          val histVecs =
            (if (dirExists(spark, vecsDir))
               spark.read.parquet(vecsDir).dropDuplicates("id")
             else delta.limit(0))
              .join(allTombs, Seq("id"), "left_anti")
          val prev = epochSnapshots(spark, edgesDir)
            .filter(_._1 < epochId).lastOption
          val prevEdges = prev match {
            case Some((_, dir)) => spark.read.parquet(dir.toString)
            case None => delta.limit(0)
              .select(col("id").as("src"), col("id").as("dst"),
                lit(0.0).as("cosine"), lit(0L).as("rn"))
          }
          val inserted = knnGraphEpoch(delta, histBands, histVecs,
            prevEdges, dim, k, bits, bands)
          // dedup both: on a torn replay the histories already contain
          // this epoch's delta, and a duplicate vector row would
          // double-occupy top-k slots in the repair's re-rank
          val liveBands = histBands.unionByName(newBands).distinct()
            .join(tomb, Seq("id"), "left_anti")
          val liveVecs = histVecs.unionByName(delta)
            .dropDuplicates("id")
            .join(tomb, Seq("id"), "left_anti")
          GraphANN.repairAfterDelete(liveBands, liveVecs, inserted,
              tomb, k)
            .write.mode("overwrite").parquet(s"$edgesDir/epoch=$epochId")
          newBands.write.mode("append").parquet(bandsDir)
          delta.write.mode("append").parquet(vecsDir)
          tomb.write.mode("append").parquet(tombsDir)
          val fs = stateFs(spark, edgesDir)._1
          for ((e, dir) <- epochSnapshots(spark, edgesDir)
               if e < prev.map(_._1).getOrElse(epochId)) {
            fs.delete(dir, true); ()
          }
        } finally { newBands.unpersist(); () }
      } finally { delta.unpersist(); tomb.unpersist(); () }
    }
    changeStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) guarded("upsertgraph", batch, epochId)
      }
      .start()
  }

  /** The newest graph snapshot written by [[incrementalKnnGraphSink]] —
    * (src, dst, cosine, rn), directly consumable by
    * [[graft.similarity.GraphANN.beamSearchTopKFrom]]. */
  def latestKnnGraph(spark: SparkSession, edgesDir: String): DataFrame = {
    val dirs = epochSnapshots(spark, edgesDir)
    require(dirs.nonEmpty, s"no epoch=N snapshots under $edgesDir")
    spark.read.parquet(dirs.last._2.toString)
  }

  /** Incremental maintenance of the HNSW-style entry layer
    * ([[graft.similarity.GraphANN.topLayer]]): the `layerSize` ids with
    * the smallest salted hash are a bottom-k monoid — bottomK(state ∪
    * delta's bottom-k) = bottomK(union corpus) — so the layer folds
    * epoch by epoch under the [[StateSinks.incrementalRollupSink]]
    * snapshot protocol (state = ≤ layerSize (id, __h) rows; re-runs
    * re-merge against the snapshot STRICTLY older than themselves and
    * overwrite idempotently). Together with [[incrementalKnnGraphSink]]
    * and [[incrementalIvfAssignSink]], every piece a graph-ANN search
    * needs — edges, cell assignments, entry points — is now maintained
    * online; VectorSinksSpec asserts the streamed layer equals the
    * batch derivation on the union, and that a search served entirely
    * from streamed state matches one served from batch-built state. */
  def topLayerSink(vecStream: DataFrame, layerSize: Int, salt: String,
      stateDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = batch.select(col("id"),
            graft.functions.Hash64.hash60(
              concat_ws("_", lit(salt), col("id").cast("string")))
              .as("__h"))
          val deltaTop = TopK.bottomKLongPerGroup(delta, Seq.empty,
            "id", "__h", layerSize).select(col("id"), col("__h"))
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val merged = prev match {
            case Some((_, dir)) => TopK.bottomKLongPerGroup(
                spark.read.parquet(dir.toString).unionByName(deltaTop),
                Seq.empty, "id", "__h", layerSize)
              .select(col("id"), col("__h"))
            case None => deltaTop
          }
          merged.write.mode("overwrite")
            .parquet(s"$stateDir/epoch=$epochId")
          val fs = stateFs(spark, stateDir)._1
          for ((e, dir) <- epochSnapshots(spark, stateDir)
               if e < prev.map(_._1).getOrElse(epochId)) {
            fs.delete(dir, true); ()
          }
        }
      }
      .start()
  }

  /** The newest entry layer from [[topLayerSink]] — (id) rows, the
    * [[graft.similarity.GraphANN.topLayer]] shape. */
  def latestTopLayer(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = epochSnapshots(spark, stateDir)
    require(dirs.nonEmpty, s"no epoch=N snapshots under $stateDir")
    spark.read.parquet(dirs.last._2.toString).select(col("id"))
  }

  /** COMPACTION — the operational pass the append-only state dirs
    * promise (run it quiesced: the sinks are single-writer and this
    * rewrites their inputs): physically drops tombstoned ids and
    * dedup rows from the bands/vecs histories, then clears the
    * tombstone dir — their information is now baked in, so subsequent
    * epochs read less and anti-join nothing. Swap discipline: the
    * compacted copy is fully written to `<dir>.compact` BEFORE the
    * live dir moves to `<dir>.old` and the copy renames in (both
    * renames are single-FS metadata ops); `.old` is removed last, so
    * every crash window leaves a complete copy on disk under one of
    * the three names — recovery is picking the newest complete one,
    * never re-deriving data. Parity contract (spec-asserted): epochs
    * -> compact -> more epochs produces the same graph as never
    * compacting.
    *
    * @param assignDir optional [[incrementalIvfAssignSink]] dir to
    *                  compact with the same tombstones */
  def compactVectorState(spark: SparkSession, bandsDir: String,
      vecsDir: String, tombsDir: String,
      assignDir: Option[String] = None): Unit = {
    val tombs =
      if (dirExists(spark, tombsDir))
        spark.read.parquet(tombsDir).distinct().localCheckpoint()
      else spark.range(0).select(col("id"))
    def rewrite(dir: String)(f: DataFrame => DataFrame): Unit =
      if (dirExists(spark, dir)) {
        val (fs, p) = stateFs(spark, dir)
        val compact = new org.apache.hadoop.fs.Path(dir + ".compact")
        val old = new org.apache.hadoop.fs.Path(dir + ".old")
        f(spark.read.parquet(dir))
          .write.mode("overwrite").parquet(compact.toString)
        if (fs.exists(old)) { fs.delete(old, true); () }
        // Hadoop rename signals most failures by returning FALSE, not
        // throwing — each must be checked, or a failed second rename
        // would fall through to deleting the only remaining copy
        require(fs.rename(p, old), s"compaction: rename $p -> $old failed")
        require(fs.rename(compact, p),
          s"compaction: rename $compact -> $p failed; original intact at $old")
        fs.delete(old, true)
        ()
      }
    rewrite(bandsDir)(df =>
      df.distinct().join(tombs, Seq("id"), "left_anti"))
    rewrite(vecsDir)(df =>
      df.dropDuplicates("id").join(tombs, Seq("id"), "left_anti"))
    assignDir.foreach(d => rewrite(d)(df =>
      df.dropDuplicates("id").join(tombs, Seq("id"), "left_anti")))
    // tombstones last: only cleared once no history row references them
    if (dirExists(spark, tombsDir)) {
      val (fs, p) = stateFs(spark, tombsDir)
      fs.delete(p, true)
      ()
    }
  }

  /** [[incrementalIvfAssignSink]]'s readout MINUS tombstones — the
    * live (id, cell, ev) assignments when deletes flow through
    * [[upsertKnnGraphSink]] beside the assignment sink. */
  def liveAssignments(spark: SparkSession, assignDir: String,
      tombsDir: String): DataFrame = {
    val assigned = spark.read.parquet(assignDir).dropDuplicates("id")
    if (dirExists(spark, tombsDir))
      assigned.join(spark.read.parquet(tombsDir).distinct(),
        Seq("id"), "left_anti")
    else assigned
  }

  /** Incremental IVF cell assignment — the coarse-quantizer face:
    * each arriving vector gets its nearest-centroid cell from the
    * LITERAL centroid expression ([[graft.similarity.IVF.cellExpr]] —
    * zero shuffle, zero join, pure codegen scan) and appends
    * (id, cell, ev) to `assignDir`, marker-guarded so a committed epoch
    * never re-appends. Read it through [[liveAssignments]] (which
    * dedups by id and subtracts tombstones): a crash between the
    * append and the marker write replays the epoch and duplicates its
    * rows in the raw dir — the same torn-epoch contract as the other
    * append-only histories, healed on read, physically dropped by
    * [[compactVectorState]]. Deduped, the table IS
    * [[graft.similarity.IVF.assign]] of the union corpus
    * (VectorSinksSpec asserts equality), so [[graft.similarity.IVF]]
    * probing — and the IVF-seeded graph search — runs against it at
    * any moment. */
  def incrementalIvfAssignSink(vecStream: DataFrame,
      cents: Seq[(Long, Seq[Double])], assignDir: String,
      markerDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val guarded = Streams.idempotentSink(markerDir) { (_, batch, _) =>
      IVF.assign(batch.select(col("id"), col("ev")), cents)
        .write.mode("append").parquet(assignDir)
    }
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) guarded("ivfassign", batch, epochId)
      }
      .start()
  }
}
