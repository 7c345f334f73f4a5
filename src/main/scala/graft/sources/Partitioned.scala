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

  /** Write `df` date-partitioned by `tsCol`'s calendar day. */
  def writeByDay(df: DataFrame, tsCol: String, path: String,
      filesPerDay: Int = 1): DataFrame = {
    val withDt = df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
    val arranged =
      if (filesPerDay <= 1) withDt.repartition(col("dt"))
      else withDt
        .withColumn("__salt",
          pmod(hash(withDt.columns.map(col): _*), lit(filesPerDay)))
        .repartition(col("dt"), col("__salt"))
        .drop("__salt")
    arranged.write.mode("overwrite").partitionBy("dt").parquet(path)
    withDt
  }

  /** Read back; day-range predicates on `dt` prune at planning time. */
  def readDays(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
