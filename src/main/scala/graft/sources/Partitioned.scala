package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout — the storage contract that makes a
  * 100 TB table queryable: one directory per day (`dt=YYYY-MM-DD`), so a
  * time-bounded query prunes to the touched days at PLANNING time and the
  * scan never opens the other files. PartitionedSpec asserts the pruning
  * (PartitionFilters in the scan node, not a post-scan filter).
  *
  * Write shape: `repartition(dt [, salt])` before `partitionBy(dt)` gives
  * one (or `filesPerDay`) writer tasks per day — without it every task
  * writes every day's directory: tasks × days small files, the classic
  * small-file explosion. A salt column fans each day out to exactly
  * `filesPerDay` files when one file per day is too coarse (file size ≈
  * day volume / filesPerDay; target 128 MB–1 GB at scale).
  */
object Partitioned {

  private def arranged(withDt: DataFrame, filesPerDay: Int): DataFrame =
    if (filesPerDay <= 1) withDt.repartition(col("dt"))
    else withDt
      .withColumn("__salt",
        pmod(hash(withDt.columns.map(col): _*), lit(filesPerDay)))
      .repartition(col("dt"), col("__salt"))
      .drop("__salt")

  /** Write `df` date-partitioned by `tsCol`'s calendar day. */
  def writeByDay(df: DataFrame, tsCol: String, path: String,
      filesPerDay: Int = 1): DataFrame = {
    val withDt = df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
    arranged(withDt, filesPerDay).write.mode("overwrite")
      .partitionBy("dt").parquet(path)
    withDt
  }

  /** Read back; day-range predicates on `dt` prune at planning time. */
  def readDays(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Upsert at day granularity: rewrite ONLY the days present in
    * `updates`, leaving every other partition's files untouched — the
    * parquet-only replacement for a MERGE, via dynamic partition
    * overwrite. The unit of atomicity is the day directory: late data or
    * corrections re-derive whole days (idempotent, replayable), which is
    * how append-only telemetry lakes actually reconcile — row-level
    * merge needs a table format (Delta/Iceberg) on top. */
  def upsertDays(updates: DataFrame, tsCol: String, path: String,
      filesPerDay: Int = 1): Unit = {
    val spark = updates.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      arranged(updates.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd")),
        filesPerDay)
        .write.mode("overwrite").partitionBy("dt").parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Row-level MERGE at PARTITION-rewrite granularity — the honest
    * 100 TB path [[graft.ops.Merge.applyChanges]]'s scaladoc documents:
    * a full-outer merge over the whole snapshot shuffles 100 TB, but a
    * key-partitioned layout only needs the merge over the partitions
    * the change set touches. Composition:
    *
    *  1. derive each change row's partition value (`partOf` — MUST be
    *     the same derivation the snapshot was laid out with, e.g. the
    *     day of an event-time key, or `pmod(key, nBuckets)`);
    *  2. touched-partition list: `distinct` partition VALUES of the
    *     change batch — a contract-bounded driver list (the number of
    *     partitions one merge batch touches is the batching contract;
    *     this is the partition-value analogue of [[compactDay]]'s
    *     single-day scope, not a data collect);
    *  3. read ONLY those partitions — by explicit directory path
    *     (`basePath` multi-path read), so pruning holds by
    *     CONSTRUCTION rather than by trusting the planner to push an
    *     `isin` through the partition-type cast;
    *  4. [[graft.ops.Merge.applyChanges]] over partition-sized inputs;
    *  5. dynamic-partition-overwrite write-back of exactly the merged
    *     partitions. Untouched partition FILES are never read or
    *     written — byte-identical after the merge (spec-asserted).
    *
    * The read-back partition column is cast to the change side's
    * `partOf` type first: partition-directory type inference (string
    * vs int) must not leak into the merge's column comparisons.
    *
    * Same determinism contract as applyChanges: at most one change
    * per key. Delta/Iceberg do this with file-level skipping plus a
    * transaction log; at partition granularity plain parquet + dynamic
    * overwrite gives the same "move only what changed" economics. */
  def mergePartitioned(spark: SparkSession, path: String,
      changes: DataFrame, keys: Seq[String], partCol: String,
      partOf: org.apache.spark.sql.Column, opCol: String = "op"): Unit = {
    val chP = changes.withColumn(partCol, partOf)
    val touched = chP.select(col(partCol)).distinct().collect()
      .map(_.get(0)).toSeq
    if (touched.isEmpty) return
    // existing touched partitions only: a change batch may open a NEW
    // partition (its upserts are pure inserts — nothing to merge with)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = touched.filter(v =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$partCol=$v")))
    val target =
      if (existing.isEmpty)
        chP.filter(lit(false)).drop(opCol) // empty frame, target schema
      else spark.read.option("basePath", path)
        .parquet(existing.map(v => s"$path/$partCol=$v"): _*)
        .withColumn(partCol, col(partCol).cast(chP.schema(partCol).dataType))
    val merged = graft.ops.Merge.applyChanges(target, chP, keys, opCol)
    // materialize before overwriting directories being read
    val snapshot = merged.repartition(col(partCol)).localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try snapshot.write.mode("overwrite").partitionBy(partCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // a fully-deleted partition emits NO rows, so dynamic overwrite
    // leaves its old directory standing — drop it explicitly (the one
    // delete-everything case file-level table formats handle with
    // tombstones)
    val written = snapshot.select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSet
    existing.map(String.valueOf).filterNot(written).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$partCol=$v"), true)
      ()
    }
  }

  /** Compact one day's small files into `targetFiles` — the maintenance
    * job that keeps scan task counts sane after streaming appends. Reads
    * only the target partition (pruned scan), rewrites only it (dynamic
    * overwrite). */
  def compactDay(spark: SparkSession, path: String, day: String,
      targetFiles: Int = 1): Unit = {
    val dayRows = readDays(spark, path).filter(col("dt") === day)
      .repartition(targetFiles).drop("dt")
      .withColumn("dt", lit(day))
    // materialize before overwriting the directory being read
    val snapshot = dayRows.localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try snapshot.write.mode("overwrite").partitionBy("dt").parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Z-ordered layout: cluster `df` into `numFiles` files by the Morton
    * code of two long columns, so parquet min/max stats tighten on BOTH
    * dimensions and scans filtered on either prune files a single-column
    * sort can't. `repartitionByRange` + `sortWithinPartitions` on the
    * code gives globally contiguous Z-ranges per file (one total-order
    * shuffle — the same cost a plain sorted write pays).
    * PartitionedSpec measures the clustering: summed per-file bounding-box
    * area shrinks vs the single-column layout. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int): Unit = {
    val z = graft.functions.Morton.morton(col(colA), col(colB))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Shuffled-shard layout for training order: rows write to `numFiles`
    * shards ordered by (salted id-hash, id) — a deterministic global
    * shuffle where `df.orderBy(rand())` changes with partitioning and
    * retries and silently breaks resume-from-step. The concatenated
    * filename-order read sequence is a pure function of (salt, ids):
    * identical on every run, cluster and input partitioning (the id
    * tie-break totalizes the sort); a new salt is a fresh epoch
    * permutation. Shard BOUNDARIES are `repartitionByRange`'s sampled
    * split points — near-even, but which boundary a row sits next to may
    * shift with input layout; consumers that need fixed shard membership
    * (not just a fixed sequence) should shard by `hash % n` explicitly
    * and accept hash-grouped file sizes.
    *
    * Range-partition + within-partition sort — the Z-order writer's plan
    * shape with a hash in place of the Morton code: one range exchange,
    * no global single-partition sort. */
  def writeShuffled(df: DataFrame, idCol: String, salt: String,
      path: String, numFiles: Int): Unit = {
    val h = graft.ops.Sampling.saltedPriority(col(idCol), salt)
    df.withColumn("__h", h)
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"), col(idCol))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }
}
