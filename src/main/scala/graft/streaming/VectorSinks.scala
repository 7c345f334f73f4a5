package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.similarity.{GraphANN, IVF, KMeans, TopK}

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
  * corpus — compact it periodically ([[compactVectorState]]) and prune
  * by the delta's (band, bucket) set via partition/bucket pruning.
  *
  * Round 13 lifecycle upgrades: the CDC sink's state is VERSIONED
  * (latest-event-wins), so updates and re-adds are first-class (the
  * permanent-tombstone contract is gone); compaction takes the full
  * consumer-dir enumeration and clears tombstones only because every
  * consumer baked them in; readouts list only `_SUCCESS`-complete
  * snapshots; a compaction crash between renames is detected loudly
  * ([[Streams.stateDirExists]]) instead of reading empty history; and
  * [[recenterVectorState]] closes the frozen-centroid drift gap.
  */
object VectorSinks {

  import Streams.{completeEpochSnapshots, epochSnapshots, stateDirExists => dirExists, stateFs, swapRewrite}

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

  /** One epoch of the CDC upsert as a pure frame transform over the
    * VERSIONED histories — [[upsertKnnGraphSink]] wraps it in state IO;
    * ScaleProbe (`upsert_epoch`) times it against an m×-grown history.
    * `pv`/`pb`/`pt` are the strictly-before-this-epoch, deduped rows of
    * the vecs/bands/tombs dirs ((id, ev, epoch) / (id, band, bucket,
    * epoch) / (id, epoch)). Exactness: latest-event-wins live view, then
    * repair down to live ∖ effTomb (the q451 argument — prevEdges IS
    * the exact graph on the pre-epoch live set), then fold the delta
    * (the q450 monoid argument); the composition equals the batch graph
    * on the latest live versions. The live-view derivation costs two
    * keyed aggs of slim (id, epoch) projections riding the history scan
    * the fold already pays. */
  def upsertGraphEpoch(delta: DataFrame, tomb: DataFrame, pv: DataFrame,
      pb: DataFrame, pt: DataFrame, prevEdges: DataFrame, dim: Int,
      k: Int, bits: Int, bands: Int): DataFrame = {
    val liveKeys = liveKeysOf(pv, pt)
    val liveVecs = pv.join(liveKeys, Seq("id", "epoch"), "left_semi")
      .select(col("id"), col("ev"))
    val liveBands = pb.join(liveKeys, Seq("id", "epoch"), "left_semi")
      .select(col("id"), col("band"), col("bucket"))
    // an add of a LIVE id is an update: implicitly delete the old
    // version before folding the new one in
    val replaced = delta.select(col("id"))
      .join(liveKeys.select(col("id")), Seq("id"), "left_semi")
    val effTomb = tomb.unionByName(replaced).distinct()
    val keptVecs = liveVecs.join(effTomb, Seq("id"), "left_anti")
    val keptBands = liveBands.join(effTomb, Seq("id"), "left_anti")
    // repair first (exact graph on live ∖ effTomb), then fold the
    // delta (exact graph on survivors ∪ delta's latest versions).
    // The fold consumes its prevEdges TWICE (affected-src semi +
    // untouched anti) — for the sink that is a cheap parquet re-scan,
    // but here the repair is a heavy lazy subtree, so materialize it
    // once (n·k rows, the same size the sink writes per epoch anyway;
    // measured: the epoch probe drops ~2x with the checkpoint)
    val repaired = GraphANN.repairAfterDelete(keptBands, keptVecs,
      prevEdges, effTomb, k).localCheckpoint()
    knnGraphEpoch(delta, keptBands, keptVecs, repaired, dim, k, bits,
      bands)
  }

  /** The CDC form (round 12; re-add/update support round 13): ONE sink
    * consuming a change stream of inserts AND deletes — `op` = "add"
    * rows carry (id, ev), `op` = "del" rows carry the tombstoned id.
    * State is VERSIONED: every history row (bands, vecs, tombstones,
    * optional assignments) carries the epoch that wrote it, and the
    * live view is LATEST-EVENT-WINS — an id is live iff its newest add
    * post-dates its newest delete, and its current vector is the
    * newest add's. That makes the full CDC vocabulary legal:
    *
    *  - add of a new id — insert;
    *  - del of a live id — delete (tombstone row);
    *  - add of a previously deleted id — RE-ADD (revival with the new
    *    vector; the old tombstone is out-versioned, not violated);
    *  - add of a currently LIVE id — UPDATE (implicit delete of the old
    *    version + insert of the new, in one step — the actual CDC
    *    upsert shape round 12's permanent-tombstone contract barred).
    *
    * Per epoch, in exactness-preserving order: (1) effective tombstones
    * = explicit dels ∪ replaced ids (live ids re-appearing in the
    * delta); (2) [[graft.similarity.GraphANN.repairAfterDelete]] takes
    * the previous snapshot — the exact graph on the pre-epoch live
    * set — down to the survivors (the q451 argument: repaired ≡
    * from-scratch on the reduced corpus); (3) [[knnGraphEpoch]] folds
    * the delta's latest versions in (the q450 monoid argument). The
    * composition is EXACT: N mixed epochs equal the batch
    * [[graft.similarity.GraphANN.knnGraph]] on the latest live
    * versions — VectorSinksSpec asserts it, update epochs included.
    *
    * Remaining contract: within ONE epoch an id appears at most once
    * among adds and at most once among dels, never both (ordering
    * inside an epoch is undefined — split conflicting changes across
    * epochs).
    *
    * Replay: marker-guarded; histories are read STRICTLY BELOW the
    * replaying epoch (`epoch < epochId`) plus dedup-on-read, so a torn
    * epoch replays against exactly the first run's state and
    * re-derives the identical snapshot (spec-asserted).
    *
    * Per-epoch cost over round 12's: two keyed aggs of the slim
    * (id, epoch) projections (last-add/last-del) — the history scan
    * they ride on was already paid; [[compactVectorState]] collapses
    * the histories back to one row per live id.
    *
    * Optional assignment maintenance: pass `assignCents` + `assignDir`
    * and each epoch also appends the delta's IVF cell assignments
    * under the SAME epoch counter, making
    * [[liveAssignmentsVersioned]]'s latest-wins read sound (one writer,
    * one counter — deletes, updates and re-adds all visible).
    *
    * @param changeStream (id: long, ev: array&lt;double&gt; nullable,
    *                     op: string "add" | "del") */
  def upsertKnnGraphSink(changeStream: DataFrame, dim: Int, k: Int,
      bits: Int, bands: Int, bandsDir: String, vecsDir: String,
      tombsDir: String, edgesDir: String, markerDir: String,
      checkpoint: String,
      assignCents: Seq[(Long, Seq[Double])] = Seq.empty,
      assignDir: String = "",
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    require(assignCents.isEmpty == assignDir.isEmpty,
      "assignCents and assignDir come together or not at all")
    val guarded = Streams.idempotentSink(markerDir) { (_, batch, epochId) =>
      val spark = batch.sparkSession
      val delta = batch.filter(col("op") === "add")
        .select(col("id"), col("ev")).persist()
      val tomb = batch.filter(col("op") === "del")
        .select(col("id")).distinct().persist()
      try {
        // versioned histories STRICTLY BEFORE this epoch — a torn
        // replay's own rows are excluded so the replay sees exactly the
        // first run's state; dedup-on-read heals double-appends
        val pv =
          (if (dirExists(spark, vecsDir)) readVersioned(spark, vecsDir)
           else delta.withColumn("epoch", lit(0L)).limit(0))
            .filter(col("epoch") < epochId)
            .dropDuplicates("id", "epoch")
        val pb =
          (if (dirExists(spark, bandsDir)) readVersioned(spark, bandsDir)
           else GraphANN.bandedBuckets(delta, dim, bits, bands)
             .withColumn("epoch", lit(0L)).limit(0))
            .filter(col("epoch") < epochId).distinct()
        val pt =
          (if (dirExists(spark, tombsDir)) readVersioned(spark, tombsDir)
           else tomb.withColumn("epoch", lit(0L)).limit(0))
            .filter(col("epoch") < epochId).distinct()
        val prev = epochSnapshots(spark, edgesDir)
          .filter(_._1 < epochId).lastOption
        val prevEdges = prev match {
          case Some((_, dir)) => spark.read.parquet(dir.toString)
          case None => delta.limit(0)
            .select(col("id").as("src"), col("id").as("dst"),
              lit(0.0).as("cosine"), lit(0L).as("rn"))
        }
        upsertGraphEpoch(delta, tomb, pv, pb, pt, prevEdges, dim, k,
            bits, bands)
          .write.mode("overwrite").parquet(s"$edgesDir/epoch=$epochId")
        // history appends AFTER the snapshot (torn replay heals on read)
        GraphANN.bandedBuckets(delta, dim, bits, bands)
          .withColumn("epoch", lit(epochId))
          .write.mode("append").parquet(bandsDir)
        delta.withColumn("epoch", lit(epochId))
          .write.mode("append").parquet(vecsDir)
        tomb.withColumn("epoch", lit(epochId))
          .write.mode("append").parquet(tombsDir)
        if (assignDir.nonEmpty)
          IVF.assign(delta, assignCents)
            .withColumn("epoch", lit(epochId))
            .write.mode("append").parquet(assignDir)
        val fs = stateFs(spark, edgesDir)._1
        for ((e, dir) <- epochSnapshots(spark, edgesDir)
             if e < prev.map(_._1).getOrElse(epochId)) {
          fs.delete(dir, true); ()
        }
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

  /** The newest COMPLETE graph snapshot written by
    * [[incrementalKnnGraphSink]] — (src, dst, cosine, rn), directly
    * consumable by [[graft.similarity.GraphANN.beamSearchTopKFrom]].
    * Lists through [[Streams.completeEpochSnapshots]]: in the window
    * where a crash tore the overwrite of epoch N, the partial dir has
    * no `_SUCCESS` and this serves the newest complete snapshot instead
    * of half-written edges. */
  def latestKnnGraph(spark: SparkSession, edgesDir: String): DataFrame = {
    val dirs = completeEpochSnapshots(spark, edgesDir)
    require(dirs.nonEmpty, s"no complete epoch=N snapshots under $edgesDir")
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

  /** The newest COMPLETE entry layer from [[topLayerSink]] — (id) rows,
    * the [[graft.similarity.GraphANN.topLayer]] shape ([[latestKnnGraph]]'s
    * `_SUCCESS` discipline). */
  def latestTopLayer(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = completeEpochSnapshots(spark, stateDir)
    require(dirs.nonEmpty, s"no complete epoch=N snapshots under $stateDir")
    spark.read.parquet(dirs.last._2.toString).select(col("id"))
  }

  /** Read a state dir with schema-merge across file generations and a
    * guaranteed `epoch` column: rows written before the round-13
    * versioning (no epoch column, or nulls in a mixed dir) coalesce to
    * epoch −1 — strictly older than every real epoch, which is exactly
    * their semantics (a −1 add beats nothing; a −1 tombstone kills a −1
    * add, the old permanent-tombstone contract). Plain
    * `spark.read.parquet` would pick ONE file's schema on a mixed dir
    * and silently drop or null the column for half the rows. The dir
    * must exist — [[Streams.stateDirExists]] runs first, so a
    * half-finished compaction fails with its recovery message instead
    * of a bare path error. */
  private def readVersioned(spark: SparkSession, dir: String): DataFrame = {
    require(dirExists(spark, dir), s"state dir $dir does not exist")
    val raw = spark.read.option("mergeSchema", "true").parquet(dir)
    if (raw.columns.contains("epoch"))
      raw.withColumn("epoch", coalesce(col("epoch"), lit(-1L)))
    else raw.withColumn("epoch", lit(-1L))
  }

  /** Newest-epoch row per id (torn-replay duplicates healed first) —
    * the latest-wins read every versioned dir shares. */
  private def latestPerId(df: DataFrame): DataFrame = {
    val deduped = df.dropDuplicates("id", "epoch")
    deduped.join(
      deduped.groupBy(col("id")).agg(max(col("epoch")).as("epoch")),
      Seq("id", "epoch"), "left_semi")
  }

  /** Latest-event-wins live keys (id, epoch-of-current-version) from
    * versioned add rows `pv` (id, epoch, ...) and tombstone rows `pt`
    * (id, epoch): live iff the newest add STRICTLY post-dates the
    * newest delete. THE liveness rule — [[upsertGraphEpoch]],
    * [[compactVectorState]] and [[liveAssignmentsVersioned]] all
    * derive from this one definition, so the sink's live view, the
    * compactor's keep set and the readout can never disagree on
    * strictness or dedup keys. */
  private def liveKeysOf(pv: DataFrame, pt: DataFrame): DataFrame =
    pv.groupBy(col("id")).agg(max(col("epoch")).as("epoch"))
      .join(pt.groupBy(col("id")).agg(max(col("epoch")).as("__de")),
        Seq("id"), "left")
      .filter(col("__de").isNull || col("epoch") > col("__de"))
      .select(col("id"), col("epoch"))

  /** COMPACTION — the operational pass the append-only state dirs
    * promise (run it quiesced: the sinks are single-writer and this
    * rewrites their inputs): physically drops dead ids, out-versioned
    * rows and torn-replay duplicates from the histories, then clears
    * the tombstone dir. Swap discipline: every dir rewrites under
    * [[Streams.swapRewrite]]'s require-checked three-name swap, so any
    * crash window leaves a complete copy on disk (and
    * [[Streams.stateDirExists]] refuses to run sinks past a
    * half-finished swap). Parity contract (spec-asserted): epochs →
    * compact → more epochs produces the same graph as never compacting.
    *
    * ENUMERATION CONTRACT (the tombstone-clear safety rule): the caller
    * MUST list in `assignDirs` EVERY directory that anti-joins
    * `tombsDir` — each assignment dir fed by [[incrementalIvfAssignSink]]
    * or [[upsertKnnGraphSink]]'s assignment option. Tombstones are
    * cleared only because every consumer has the deletions physically
    * baked in; a consumer dir left un-enumerated would silently
    * RESURRECT erased ids on its next [[liveAssignments]] read after
    * the clear — in an erasure/GDPR context, the worst possible
    * failure. When in doubt, pass the dir.
    *
    * Versioned state ([[upsertKnnGraphSink]] dirs, `epoch` column):
    * bands/vecs keep only each live id's latest-version rows (dead =
    * latest event is a delete); clearing tombstones is then semantics-
    * preserving even for re-adds — a dead id ends up with no row
    * anywhere, and a later add of it revives it exactly as it would
    * have before compaction. Unversioned state (the insert-only sinks'
    * dirs): distinct/dedup + tombstone anti-join, as before. */
  def compactVectorState(spark: SparkSession, bandsDir: String,
      vecsDir: String, tombsDir: String,
      assignDirs: Seq[String] = Seq.empty): Unit = {
    val versioned = dirExists(spark, vecsDir) &&
      spark.read.option("mergeSchema", "true").parquet(vecsDir)
        .columns.contains("epoch")
    if (versioned) {
      // latest-event-wins live keys (the ONE liveKeysOf rule),
      // materialized BEFORE any rewrite touches their source dirs
      val pv = readVersioned(spark, vecsDir).dropDuplicates("id", "epoch")
      val pt =
        if (dirExists(spark, tombsDir))
          readVersioned(spark, tombsDir).distinct()
        else pv.select(col("id"), col("epoch")).limit(0)
      val liveKeys = liveKeysOf(pv, pt).localCheckpoint()
      // rewrites read through readVersioned (not swapRewrite's raw
      // frame): a mixed pre/post-versioning dir needs the merged schema
      // and the null-epoch coalesce for the (id, epoch) joins to hold
      swapRewrite(spark, vecsDir)(_ =>
        readVersioned(spark, vecsDir).dropDuplicates("id", "epoch")
          .join(liveKeys, Seq("id", "epoch"), "left_semi"))
      swapRewrite(spark, bandsDir)(_ =>
        readVersioned(spark, bandsDir).distinct()
          .join(liveKeys, Seq("id", "epoch"), "left_semi"))
      // assignment dirs may run their own epoch counter (the standalone
      // sink), so liveness joins on id and recency on the dir's OWN
      // epochs: keep each live id's newest assignment row
      assignDirs.foreach(d => swapRewrite(spark, d)(_ =>
        latestPerId(readVersioned(spark, d))
          .join(liveKeys.select(col("id")), Seq("id"), "left_semi")))
    } else {
      val tombs =
        if (dirExists(spark, tombsDir))
          spark.read.parquet(tombsDir).select(col("id")).distinct()
            .localCheckpoint()
        else spark.range(0).select(col("id"))
      swapRewrite(spark, bandsDir)(df =>
        df.distinct().join(tombs, Seq("id"), "left_anti"))
      swapRewrite(spark, vecsDir)(df =>
        df.dropDuplicates("id").join(tombs, Seq("id"), "left_anti"))
      assignDirs.foreach(d => swapRewrite(spark, d)(df =>
        (if (df.columns.contains("epoch")) latestPerId(df)
         else df.dropDuplicates("id"))
          .join(tombs, Seq("id"), "left_anti")))
    }
    // tombstones last: only cleared once no enumerated dir references
    // them (see the enumeration contract above)
    if (dirExists(spark, tombsDir)) {
      val (fs, p) = stateFs(spark, tombsDir)
      fs.delete(p, true)
      ()
    }
  }

  /** [[incrementalIvfAssignSink]]'s readout MINUS tombstones — the
    * live (id, cell, ev) assignments when deletes flow through
    * [[upsertKnnGraphSink]] beside the assignment sink. Conservative
    * erasure-safe semantics: a tombstoned id is hidden PERMANENTLY,
    * whatever the epoch counters say — correct for any pairing of
    * writers (the assignment sink and the tombstone writer need not
    * share an epoch counter, so cross-dir epoch comparison would be
    * meaningless here). For the one-writer layout where
    * [[upsertKnnGraphSink]] maintains the assignment dir itself, use
    * [[liveAssignmentsVersioned]], which sees re-adds and updates. */
  def liveAssignments(spark: SparkSession, assignDir: String,
      tombsDir: String): DataFrame = {
    val assigned = latestPerId(readVersioned(spark, assignDir))
    if (dirExists(spark, tombsDir))
      assigned.join(
        spark.read.parquet(tombsDir).select(col("id")).distinct(),
        Seq("id"), "left_anti")
    else assigned
  }

  /** Latest-event-wins assignment readout for the ONE-WRITER layout —
    * [[upsertKnnGraphSink]] with its assignment option maintains both
    * `assignDir` and `tombsDir` under a single epoch counter, so the
    * comparison "newest add vs newest delete" is well-defined: an id is
    * live iff its newest assignment post-dates its newest tombstone,
    * which makes deletes, UPDATES and RE-ADDS all visible (the round-13
    * CDC semantics). Do NOT point this at dirs written by two different
    * sinks — their epoch counters are unrelated; use [[liveAssignments]]
    * there. */
  def liveAssignmentsVersioned(spark: SparkSession, assignDir: String,
      tombsDir: String): DataFrame = {
    val latest = latestPerId(readVersioned(spark, assignDir))
    if (!dirExists(spark, tombsDir)) latest
    else latest.join(
        liveKeysOf(latest.select(col("id"), col("epoch")),
          readVersioned(spark, tombsDir).distinct()),
        Seq("id", "epoch"), "left_semi")
  }

  /** ONLINE CENTROID REFRESH (round 13) — the recenter pass the frozen-
    * literal streaming IVF face needs under corpus drift: as the stream
    * moves away from the centroids [[incrementalIvfAssignSink]] was
    * launched with, cell occupancy skews and probe recall decays with
    * no recourse. Run this quiesced (the compaction discipline — the
    * sinks are single-writer and this rewrites the assignment dir):
    *
    *  1. new centroids = the exact quantized per-cell mean of the LIVE
    *     assignments ([[graft.similarity.KMeans.exactMeanByKey]] — one
    *     keyed aggregation, the Lloyd update; cells keep their ids,
    *     empty cells drop out, the standard Lloyd degeneracy);
    *  2. every live vector re-assigns against the new centroids
    *     (literal-centroid codegen scan, zero shuffle) and the
    *     assignment dir rewrites under the require-checked three-name
    *     swap — knn-graph state is untouched (it is centroid-free),
    *     tombstones are untouched (conservative: erased ids stay
    *     erased; only [[compactVectorState]] clears them).
    *
    * Returns the new centroids so the caller relaunches the sink with
    * them — subsequent epochs append assignments against the SAME
    * model the rewritten history used, so at any moment
    * [[liveAssignments]] ≡ [[graft.similarity.IVF.assign]] of the live
    * union corpus on the current model (VectorSinksSpec asserts it,
    * plus a drift-then-recenter recall probe). Cross-engine: step 1 is
    * the q58 oracle-proven Lloyd update and step 2 the q36 assignment
    * replay — q453 gates the composed recenter step in DuckDB.
    *
    * Layout-safety (round-13 self-review fix): the TRAINING set is the
    * conservative [[liveAssignments]] view (erasure-safe — a tombstoned
    * id never contributes to the model, whatever the epoch counters
    * mean), but the REWRITE reassigns EVERY id's latest row, so no row
    * is lost in any layout: in the combined [[upsertKnnGraphSink]]
    * pairing a revived id's row survives the recenter and
    * [[liveAssignmentsVersioned]] keeps seeing it (with its new-model
    * cell); dead ids' rows persist exactly as they did before — physical
    * erasure remains [[compactVectorState]]'s job. */
  def recenterVectorState(spark: SparkSession, assignDir: String,
      tombsDir: String, scale: Double = 1e6): Seq[(Long, Seq[Double])] = {
    // materialize BEFORE rewriting their source dir
    val all = latestPerId(readVersioned(spark, assignDir))
      .localCheckpoint()
    val live =
      if (dirExists(spark, tombsDir))
        all.join(spark.read.parquet(tombsDir).select(col("id")).distinct(),
          Seq("id"), "left_anti")
      else all
    val newCents = KMeans.exactMeanByKey(live, "cell", "ev", scale)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2).toVector))
      .sortBy(_._1).toVector
    swapRewrite(spark, assignDir)(_ => IVF.assign(all, newCents))
    newCents
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
    * any moment. Rows carry the writing epoch (round 13) so the
    * latest-wins readout is deterministic and [[compactVectorState]]
    * can keep newest-per-id; the sink itself remains insert-only with
    * the lifetime-unique-id contract. Under corpus drift, refresh the
    * frozen centroid model with [[recenterVectorState]] and relaunch
    * with the returned centroids. */
  def incrementalIvfAssignSink(vecStream: DataFrame,
      cents: Seq[(Long, Seq[Double])], assignDir: String,
      markerDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    val guarded = Streams.idempotentSink(markerDir) { (_, batch, epochId) =>
      IVF.assign(batch.select(col("id"), col("ev")), cents)
        .withColumn("epoch", lit(epochId))
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
