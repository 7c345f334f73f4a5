package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-located joins without a shuffle.
  *
  * At 100 TB the dominant cost of a fact-to-fact join is shuffling both
  * sides on the key. When both tables are written `bucketBy` the join key
  * into the same bucket count, SortMergeJoin reads matching buckets
  * directly and the `Exchange` nodes disappear from the physical plan —
  * the join runs shuffle-free, stage-local. The reference has no joins at
  * all (SURVEY §2.10); this is engine capability for the read-side/
  * training-pipeline workloads, exercised by ScaleOpsSpec (which asserts
  * the plan contains no shuffle exchange).
  *
  * `bucketBy` requires a catalog table (`saveAsTable`) — works with the
  * default in-memory catalog; the files land under the session's
  * `spark.sql.warehouse.dir`.
  */
object Bucketed {

  /** Write `df` as a parquet-backed catalog table bucketed (and sorted)
    * by `key` — pre-paying the shuffle once at write time. The repartition
    * on the bucket key is load-bearing: without it EVERY write task emits
    * a file per bucket it sees (tasks × buckets small files at scale) and
    * per-file sortBy no longer yields globally sorted buckets, so
    * SortMergeJoin re-sorts at read. With it, each bucket is one task's
    * output: one file, sorted. (Read parallelism of a bucketed scan is
    * capped at the bucket count — size `buckets` accordingly.) */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on `key` with equal
    * bucket counts: no Exchange on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
