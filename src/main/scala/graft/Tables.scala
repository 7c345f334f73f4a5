package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame     = apply("events")
  def documents: DataFrame  = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}
