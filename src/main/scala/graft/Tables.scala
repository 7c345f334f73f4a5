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
