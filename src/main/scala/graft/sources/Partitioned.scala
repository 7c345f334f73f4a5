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
