package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table accessors for the harness testdata (TESTDATA.md).
  *
  * Scans stay declarative (`spark.read.parquet`) so Catalyst pushes filters
  * and prunes columns into the parquet reader — at 100 TB the scan is the
  * dominant cost and `PushedFilters`/`ReadSchema` must reach the source.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def apply(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame     = apply("region")
  def nation: DataFrame     = apply("nation")
  def customer: DataFrame   = apply("customer")
  def supplier: DataFrame   = apply("supplier")
  def part: DataFrame       = apply("part")
  def orders: DataFrame     = apply("orders")
  def lineitem: DataFrame   = apply("lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see Verify/Bench) so the
    * column arrives as epoch-nanos long; convert to a microsecond timestamp
    * here (integer `div` — a double division would lose precision above
    * 2^53 ns). DuckDB's reader truncates ns→µs the same way. */
  def events: DataFrame = {
    val raw = apply("events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
  def documents: DataFrame  = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}

object Tables {

  /** SCAN-PARALLELISM FLOOR for hash/compare-heavy per-row stages
    * (guide §2.5 "one huge unsplittable file → repartition immediately
    * after the read"): a small single-file parquet table is ONE row
    * group, so a scan — and every projection fused into it — runs as
    * ONE task regardless of byte-range splits (a row group executes in
    * the split holding its midpoint; the rest are empty). When the
    * input plans fewer partitions than the session's cores, one cheap
    * shuffle lifts the heavy projection to the core floor.
    *
    * Size-derived, not a tuned constant: at production scale the scan
    * already has ≥ `defaultParallelism` splits (and any post-shuffle
    * input is at `spark.sql.shuffle.partitions`), so this is the
    * identity there — local mode and the cluster keep the same plan
    * shape, each at full width. Applied ONLY inside operators whose
    * scan-side stage measures as the bottleneck (minhash signatures,
    * the global suffix-array seed): a blanket floor on every table
    * measured 2.4–3.0× SLOWER on short relational queries (the shuffle
    * tax) and on the BPE train loop (per-generation persists multiply
    * the partition count into every round's task overhead). Results are
    * row-content-based everywhere (oracle-gated), so placement is free
    * to change. */
  def scanFloor(df: DataFrame): DataFrame = {
    // streaming frames cannot be planned via .rdd (and their micro-batch
    // partitioning is the source's business) — identity there, so the
    // floored operators stay usable as pure streaming projections
    if (df.isStreaming) return df
    val floor = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < floor) df.repartition(floor) else df
  }
}
