package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The EPOCH-SNAPSHOT state-sink family: streaming maintenance of
  * mergeable batch state (count/sum rollups, HLL sketches, count-min
  * heavy hitters, log-bucket quantiles, mixture-control rates, training
  * shard layouts, late-data audits) folded micro-batch by micro-batch
  * under one shared protocol — each epoch merges its delta into the
  * newest persisted snapshot STRICTLY OLDER than itself and writes a
  * new versioned `epoch=N` dir (never overwriting an input mid-read),
  * re-runs overwrite idempotently, and snapshots older than the
  * previous are pruned, so storage is two snapshots bounded by state
  * (not stream) cardinality. Split from [[Streams]] (which keeps the
  * transform-level operators and pipeline sinks); the shared
  * filesystem/epoch helpers live there as `private[streaming]`.
  *
  * Re-expresses the reference's accumulate-and-publish loops
  * (reference: spark_apps/advanced_analytics.py) as restart-safe
  * incremental state, per SURVEY §5.2.
  */
object StateSinks {

  import Streams.{completeEpochSnapshots, epochSnapshots, stateFs}

  /** Streaming incremental rollup maintenance — [[graft.ops.Rollups]]'s
    * mergeable state folded micro-batch by micro-batch: each epoch
    * merges its delta into the latest persisted state and writes a NEW
    * versioned snapshot (`epoch=N`), never overwriting the input it is
    * reading (a lazy read-then-overwrite of one dir would truncate the
    * input mid-job). Replay-safe without a marker: a re-run of epoch N
    * re-reads the newest state STRICTLY OLDER than N — its own partial
    * output is never an input — and overwrites `epoch=N` idempotently.
    * Epochs older than the previous one are pruned after a successful
    * write, so storage is two snapshots, each bounded by key
    * cardinality (not stream length).
    *
    * The batch analogue (and the merge-≡-recompute proof) is q89. */
  def incrementalRollupSink(stream: DataFrame, keys: Seq[String],
      vCol: String, stateDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = graft.ops.Rollups.rollupState(batch, keys.map(col), col(vCol))
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val merged = prev match {
            case Some((_, dir)) => graft.ops.Rollups.mergeStates(
              spark.read.parquet(dir.toString), delta, keys)
            case None => delta
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

  /** Read the newest state snapshot written by [[incrementalRollupSink]].
    * Fails with a clear message (not an NPE) when no snapshot exists. */
  def latestRollupState(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = completeEpochSnapshots(spark, stateDir)
    require(dirs.nonEmpty, s"no complete epoch=N snapshots under $stateDir")
    spark.read.parquet(dirs.last._2.toString)
  }

  /** Central-DP release over [[incrementalRollupSink]]'s newest count
    * state: [[graft.ops.Privacy.geometricNoisyCountsOver]] applied to
    * the epoch-merged (keys, n) snapshot. The geometric draw depends
    * only on (salt, cell) — never on n or the epoch — so this release
    * is IDENTICAL to the batch [[graft.ops.Privacy
    * .geometricNoisyCounts]] over every epoch's rows (StreamsSpec
    * asserts the equality), with zero extra state: the DP face of the
    * q89 merge-≡-recompute contract. Each publication from a growing
    * stream should swap the salt (or account ε across releases) — an
    * unchanged salt re-publishes correlated noise. */
  def dpReleaseFromState(spark: SparkSession, stateDir: String,
      keyCols: Seq[String], salt: String, aNum: Long = 1L,
      aDen: Long = 2L, maxShift: Int = 16): DataFrame =
    graft.ops.Privacy.geometricNoisyCountsOver(
      latestRollupState(spark, stateDir), keyCols, salt, aNum, aDen,
      maxShift)

  /** STREAMING mergeable DISTINCT-count rollup — the
    * [[graft.ops.Sketches.hllRollup]] table maintained epoch by epoch:
    * each micro-batch's per-key (n, HLL sketch) rows merge into the
    * previous snapshot by `sum(n)` + `hll_union_agg` (sketch algebra is
    * exactly mergeable — re-summing ESTIMATES would double-count users
    * active in several epochs, the hllRollup scaladoc's point). Same
    * two-snapshot retention as [[incrementalRollupSink]]; state is
    * (keys × fixed sketch bytes), never stream-sized. */
  def hllRollupSink(stream: DataFrame, keys: Seq[String], vCol: String,
      stateDir: String, checkpoint: String, lgConfigK: Int = 12,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = graft.ops.Sketches.hllRollup(batch,
            keys.map(col), col(vCol), lgConfigK)
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val merged = prev match {
            case Some((_, dir)) =>
              spark.read.parquet(dir.toString).unionAll(delta)
                .groupBy(keys.map(col): _*)
                .agg(sum(col("n")).as("n"),
                  hll_union_agg(col("dv_sketch")).as("dv_sketch"))
            case None => delta
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

  /** STREAMING mixture control (round-10 item 7): q97's per-source
    * token accounting maintained epoch by epoch — the per-batch
    * (source, n_docs, n_tokens) delta merges into the previous snapshot
    * by INTEGER SUMS (exactly mergeable, so Σ over epochs ≡ the batch
    * accounting on the union; StreamsSpec asserts it), with the same
    * two-snapshot retention as [[incrementalRollupSink]]. State is
    * |sources| rows, never stream-sized.
    *
    * The point of maintaining it: [[mixRatesFromState]] derives q66's
    * mix-rate table from the ACCUMULATED totals at any moment, and
    * [[mixSampleFromState]] applies the acceptance predicate to any
    * frame using only that |sources|-row table (one broadcast join +
    * a scan predicate) — a long-running ingest holds a target
    * composition without ever recomputing counts over the corpus. */
  def mixtureControlSink(docsStream: DataFrame, srcCol: String,
      textCol: String, stateDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery = {
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = batch.groupBy(col(srcCol).as("source"))
            .agg(count(lit(1)).as("n_docs"),
              sum(graft.text.TextAnalysis.tokenCount(col(textCol))
                .cast("long")).as("n_tokens"))
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val merged = prev match {
            case Some((_, dir)) =>
              spark.read.parquet(dir.toString).unionAll(delta)
                .groupBy(col("source"))
                .agg(sum(col("n_docs")).as("n_docs"),
                  sum(col("n_tokens")).as("n_tokens"))
            case None => delta
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

  /** STREAMING training-order layout writer — the incremental face of
    * [[graft.ops.Sharding.shardLayout]]: each micro-batch's documents
    * get (shard, pos) with shard = hash60(salt_id) mod nShards and pos
    * APPENDED after the shard's previous high-water mark (state =
    * nShards (shard, max_pos) rows, never stream-sized). Earlier
    * epochs' positions are immutable — exactly the resume-safe
    * append-only contract a training-order writer needs; a re-run of
    * epoch N re-reads the state strictly older than N and overwrites
    * its own `epoch=N` layout slice idempotently (the
    * [[incrementalRollupSink]] replay discipline).
    *
    * Order contract (differs from the batch op, deliberately): the
    * batch [[graft.ops.Sharding.shardLayout]] orders the WHOLE corpus
    * by hash; the stream orders by (arrival epoch, hash) — positions
    * within each epoch are hash-shuffled, epochs append. StreamsSpec
    * asserts per-shard positions stay contiguous 1..N across epochs
    * and that epoch-1 rows never change. */
  def shardLayoutSink(docsStream: DataFrame, idCol: String,
      textCol: String, nShards: Int, salt: String, layoutDir: String,
      stateDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery =
    layoutSinkCore(docsStream, idCol, textCol, None, nShards, salt,
      layoutDir, stateDir, checkpoint, trigger)

  /** The shared epoch body of [[shardLayoutSink]] and
    * [[curriculumShardLayoutSink]]: identical state merge / versioned
    * overwrite / two-snapshot retention; the curriculum form only
    * prefixes the within-shard window order with its bucket column
    * (plain [[shardLayoutSink]] is the `bucket = None` instance —
    * order (__h, id)) and carries the bucket in the layout rows. */
  private def layoutSinkCore(docsStream: DataFrame, idCol: String,
      textCol: String, bucket: Option[org.apache.spark.sql.Column],
      nShards: Int, salt: String, layoutDir: String, stateDir: String,
      checkpoint: String, trigger: Trigger): StreamingQuery = {
    require(nShards >= 1)
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val h = graft.functions.Hash64.hash60(
            concat(lit(salt), lit("_"), col(idCol).cast("string")))
          val order = bucket.map(_ => Seq(col("bucket")))
            .getOrElse(Seq.empty) ++ Seq(col("__h"), col(idCol))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard")).orderBy(order: _*)
          val outCols = Seq(col(idCol), col("shard"), col("pos")) ++
            bucket.map(_ => col("bucket")).toSeq :+ col("n_tokens")
          val epochLayout = batch
            .select(Seq(col(idCol),
              graft.text.TextAnalysis.tokenCount(col(textCol))
                .cast("long").as("n_tokens")) ++
              bucket.map(_.cast("long").as("bucket")).toSeq: _*)
            .withColumn("__h", h)
            .withColumn("shard", col("__h") % nShards)
            .withColumn("__r", row_number().over(w).cast("long"))
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val state = prev match {
            case Some((_, dir)) => spark.read.parquet(dir.toString)
            case None => spark.range(0).select(col("id").as("shard"),
              col("id").as("max_pos"))
          }
          val laid = epochLayout
            .join(broadcast(state), Seq("shard"), "left")
            .na.fill(0L, Seq("max_pos"))
            .withColumn("pos", col("max_pos") + col("__r"))
            .select(outCols: _*)
            .localCheckpoint()
          laid.write.mode("overwrite")
            .parquet(s"$layoutDir/epoch=$epochId")
          laid.groupBy(col("shard"))
            .agg(max(col("pos")).as("max_pos"))
            .unionByName(state)
            .groupBy(col("shard")).agg(max(col("max_pos")).as("max_pos"))
            .write.mode("overwrite").parquet(s"$stateDir/epoch=$epochId")
          val fs = stateFs(spark, stateDir)._1
          for ((e, dir) <- epochSnapshots(spark, stateDir)
               if e < prev.map(_._1).getOrElse(epochId)) {
            fs.delete(dir, true); ()
          }
        }
      }
      .start()
  }

  /** CURRICULUM variant of [[shardLayoutSink]] (round-12 item 7) — the
    * streaming face of [[graft.ops.Sharding.curriculumShardLayout]]
    * (q445): shard assignment stays the salted hash, but WITHIN each
    * epoch's shard slice the order is (curriculum bucket asc, hash, id)
    * — every epoch appends an "easy first" staged block after the
    * shard's previous high-water mark. Same nShards-row (shard,
    * max_pos) state, same epoch-versioned replay discipline, same
    * immutability: committed positions never move.
    *
    * Order contract (differs from the batch op, deliberately — the
    * [[shardLayoutSink]] precedent): batch curriculum orders the WHOLE
    * corpus by (bucket, hash); a stream cannot reorder committed
    * positions, so the staged order holds WITHIN each epoch and epochs
    * append — the curriculum restarts per arrival wave, which is
    * exactly what a continuously-training run consuming the layout
    * tail sees. StreamsSpec asserts per-shard contiguity across
    * epochs, epoch-1 immutability, and the staged order inside every
    * (epoch, shard) slice.
    *
    * @param bucket integer curriculum stage of a doc (smaller =
    *               earlier), evaluated against the batch's columns */
  def curriculumShardLayoutSink(docsStream: DataFrame, idCol: String,
      textCol: String, bucket: org.apache.spark.sql.Column, nShards: Int,
      salt: String, layoutDir: String, stateDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery =
    layoutSinkCore(docsStream, idCol, textCol, Some(bucket), nShards,
      salt, layoutDir, stateDir, checkpoint, trigger)

  /** Every epoch slice of [[shardLayoutSink]]'s layout, one frame. */
  def readLayout(spark: SparkSession, layoutDir: String): DataFrame =
    spark.read.parquet(layoutDir)

  /** Audit rows written by [[lateDataAuditSink]], epoch as a LONG
    * column (partition discovery infers int; normalized here). */
  def readLateAudits(spark: SparkSession, auditDir: String): DataFrame =
    spark.read.parquet(auditDir)
      .withColumn("epoch", col("epoch").cast("long"))

  /** LATE-DATA audit sink — the observability piece watermarking
    * hides: Spark silently DROPS rows later than the watermark inside
    * stateful operators, so an upstream clock-skew or replay bug shows
    * up only as quietly-missing aggregates. This sink maintains its
    * own high-water mark (1-row state: the max event time seen through
    * the PREVIOUS epoch — Spark's own watermark advancement rule) and
    * writes, per epoch, how many arriving rows sat more than
    * `delaySeconds` behind it — the rate to alarm on before trusting
    * any watermarked result downstream. First epoch has no mark:
    * nothing is late by definition.
    *
    * @return per-epoch audit rows at `auditDir`: (epoch, n_rows,
    *         n_late, min_us, max_us, mark_us — the mark APPLIED, -1
    *         for the first epoch) */
  def lateDataAuditSink(stream: DataFrame, eventTimeCol: String,
      delaySeconds: Long, auditDir: String, stateDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val mark = prev match {
            case Some((_, dir)) => spark.read.parquet(dir.toString)
            case None => spark.range(1)
              .select(lit(-1L).as("mark_us")).limit(1)
          }
          val us = batch.select(
            expr(s"unix_micros(CAST($eventTimeCol AS TIMESTAMP))")
              .as("__us"))
          val audit = us.crossJoin(broadcast(mark))
            .agg(count(lit(1)).as("n_rows"),
              sum(when(col("mark_us") >= 0 &&
                col("__us") < col("mark_us") - delaySeconds * 1000000L,
                1L).otherwise(0L)).as("n_late"),
              min(col("__us")).as("min_us"),
              max(col("__us")).as("max_us"),
              max(col("mark_us")).as("mark_us"))
            .select(col("n_rows"), col("n_late"), col("min_us"),
              col("max_us"), col("mark_us"))
            .localCheckpoint()
          audit.write.mode("overwrite")
            .parquet(s"$auditDir/epoch=$epochId")
          audit.select(greatest(col("max_us"), col("mark_us"))
              .as("mark_us"))
            .write.mode("overwrite").parquet(s"$stateDir/epoch=$epochId")
          val fs = stateFs(spark, stateDir)._1
          for ((e, dir) <- epochSnapshots(spark, stateDir)
               if e < prev.map(_._1).getOrElse(epochId)) {
            fs.delete(dir, true); ()
          }
        }
      }
      .start()
  }

  /** The newest (source, n_docs, n_tokens) accounting snapshot. */
  def latestMixState(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = completeEpochSnapshots(spark, stateDir)
    require(dirs.nonEmpty, s"no complete epoch=N snapshots under $stateDir")
    spark.read.parquet(dirs.last._2.toString)
  }

  /** q66's mix-rate table derived from an accounting snapshot: per
    * source, the doc count n_s and the integer target allocation
    * `alloc = (num · budget) div den` with
    * `budget = (totalNum · Σn_docs) div totalDen` — the EXACT integers
    * [[graft.ops.Sampling.mixSample]] computes from the corpus, here
    * read off |sources| rows. */
  def mixRatesFromState(state: DataFrame,
      targets: Map[String, (Long, Long)], default: (Long, Long),
      totalNum: Long, totalDen: Long): DataFrame = {
    val total = state.agg(sum(col("n_docs")).as("__n"))
    val budget = s"(($totalNum * __n) div $totalDen)"
    val (dn, dd) = default
    val alloc = targets.toSeq.sortBy(_._1)
      .foldLeft(expr(s"($dn * $budget) div $dd")) {
        case (acc, (s, (num, den))) =>
          when(col("source") === s, expr(s"($num * $budget) div $den"))
            .otherwise(acc)
      }
    state.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        alloc.as("alloc"))
  }

  /** Apply the q66 acceptance predicate to `docs` using ONLY a
    * [[mixRatesFromState]] table: keep a doc when
    * `hashBucket(key) · n_s < alloc · mod` — identical winners to
    * [[graft.ops.Sampling.mixSample]] over the corpus the state
    * accounts for (StreamsSpec asserts set equality). One broadcast
    * join, scan-side filter, zero corpus shuffles. */
  def mixSampleFromState(docs: DataFrame, key: org.apache.spark.sql.Column,
      domainCol: String, rates: DataFrame, salt: String,
      mod: Int = 10000): DataFrame =
    docs.join(broadcast(rates.select(col("source").as(domainCol),
        col("n_docs").as("__n_s"), col("alloc").as("__alloc"))), domainCol)
      .filter(graft.ops.Sampling.hashBucket(key, salt, mod).cast("long") *
        col("__n_s") < col("__alloc") * lit(mod.toLong))
      .drop("__n_s", "__alloc")

  /** STREAMING heavy-hitters sink — [[graft.ops.Sketches.heavyHitters]]
    * maintained epoch by epoch with BOUNDED state: a count-min sketch
    * (fixed width×depth counters; merging sketches of two epochs IS
    * the sketch of their union — counters sum) plus a top-`maxCand`
    * candidate table. Per epoch: the batch's sketch merges into the
    * state sketch; the batch's hash-sampled candidate keys union the
    * carried ones; every candidate re-estimates on the MERGED sketch
    * and only the top `maxCand` survive. Candidates discovered in any
    * epoch stay discoverable (a key hot only across epochs is found
    * the epoch its sample hits — the same sampling contract as the
    * batch op). Same two-snapshot retention as the other sinks.
    *
    * State rows are DISCRIMINATED by an explicit `is_sketch` boolean —
    * never an in-band magic key, so a real stream key can never
    * collide with the sketch row (an `is_sketch=true` row carries
    * key=NULL + the serialized bytes; candidate rows carry
    * sketch=NULL).
    *
    * @return per-snapshot state at `stateDir`: candidate rows
    *         (key, est, is_sketch=false) + one is_sketch=true row
    *         carrying the bytes */
  def heavyHittersSink(stream: DataFrame, keyCol: String,
      stateDir: String, checkpoint: String, sampleSize: Int = 2000,
      eps: Double = 0.0001, maxCand: Int = 1000,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._
          val sketch = graft.ops.Sketches.countMin(batch,
            col(keyCol).cast("string"), eps)
          val rowHash = concat_ws("",
            batch.columns.map(c => col(c).cast("string")): _*)
          val nBatch = sketch.totalCount()
          val frac = math.min(1.0,
            sampleSize.toDouble / math.max(nBatch, 1L))
          val batchCands = batch
            .filter(graft.ops.Sampling.hashBucket(rowHash, "hh",
              1000000) < (frac * 1000000).round)
            .select(col(keyCol).cast("string").as("k")).distinct()
            .as[String].collect()
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val (merged, prevCands) = prev match {
            case Some((_, dir)) =>
              val st = spark.read.parquet(dir.toString)
              val bytes = st.filter(col("is_sketch"))
                .select(col("sketch")).head.getAs[Array[Byte]](0)
              val prior = org.apache.spark.util.sketch.CountMinSketch
                .readFrom(new java.io.ByteArrayInputStream(bytes))
              prior.mergeInPlace(sketch)
              (prior,
                st.filter(!col("is_sketch"))
                  .select(col("key")).as[String].collect())
            case None => (sketch, Array.empty[String])
          }
          val cands = (batchCands ++ prevCands).distinct.toSeq
            .map(k => (k, merged.estimateCount(k)))
            .sortBy { case (k, e) => (-e, k) }
            .take(maxCand)
          val out = new java.io.ByteArrayOutputStream()
          merged.writeTo(out)
          val state = cands.toDF("key", "est")
            .withColumn("is_sketch", lit(false))
            .withColumn("sketch",
              lit(null).cast("binary"))
            .unionByName(Seq(Tuple1(merged.totalCount()))
              .toDF("est")
              .withColumn("key", lit(null).cast("string"))
              .withColumn("is_sketch", lit(true))
              .withColumn("sketch", lit(out.toByteArray)))
          state.write.mode("overwrite")
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

  /** Heavy hitters ≥ `minFrac` from [[heavyHittersSink]]'s newest
    * state — (key, est), est over ALL epochs ingested. */
  def latestHeavyHitters(spark: SparkSession, stateDir: String,
      minFrac: Double): DataFrame = {
    val dirs = completeEpochSnapshots(spark, stateDir)
    require(dirs.nonEmpty, s"no complete epoch=N snapshots under $stateDir")
    val st = spark.read.parquet(dirs.last._2.toString)
    val total = st.filter(col("is_sketch"))
      .select(col("est")).head.getLong(0)
    st.filter(!col("is_sketch"))
      .filter(col("est") >= (minFrac * total).toLong)
      .select(col("key"), col("est"))
  }

  /** Estimate readout over [[hllRollupSink]]'s newest state. */
  def latestHllEstimates(spark: SparkSession, stateDir: String)
      : DataFrame = {
    val dirs = completeEpochSnapshots(spark, stateDir)
    require(dirs.nonEmpty, s"no complete epoch=N snapshots under $stateDir")
    spark.read.parquet(dirs.last._2.toString)
      .withColumn("est_distinct",
        hll_sketch_estimate(col("dv_sketch")))
      .drop("dv_sketch")
  }

  /** STREAMING log-bucket quantile sketch — the q367 sketch's streaming
    * face, by construction EXACTLY the batch answer on the union of all
    * epochs: the per-epoch (bucket, count) histogram
    * ([[graft.ops.Quantiles.logBucketHist]], bounded ≤ 64·2^j + 2 rows)
    * merges into the previous epoch-snapshot by integer count addition
    * ([[graft.ops.Quantiles.mergeLogBucketHists]]) — nothing here
    * approximates beyond what the batch sketch already concedes, and
    * the state NEVER grows with the stream (the same two-snapshot
    * retention as [[incrementalRollupSink]]). Read quantiles at any
    * moment with [[latestLogBucketQuantiles]]. */
  def logBucketQuantileSink(stream: DataFrame, vCol: String, j: Int,
      stateDir: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("60 seconds"))
      : StreamingQuery = {
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = graft.ops.Quantiles.logBucketHist(batch, col(vCol), j)
          val prev = epochSnapshots(spark, stateDir)
            .filter(_._1 < epochId).lastOption
          val merged = prev match {
            case Some((_, dir)) => graft.ops.Quantiles.mergeLogBucketHists(
              spark.read.parquet(dir.toString), delta)
            case None => delta
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

  /** Quantile readout over [[logBucketQuantileSink]]'s newest state. */
  def latestLogBucketQuantiles(spark: SparkSession, stateDir: String,
      ps: Seq[(Int, Int)], j: Int): DataFrame = {
    val dirs = completeEpochSnapshots(spark, stateDir)
    require(dirs.nonEmpty, s"no complete epoch=N snapshots under $stateDir")
    graft.ops.Quantiles.logBucketAnswer(
      spark.read.parquet(dirs.last._2.toString), ps, j)
  }
}
