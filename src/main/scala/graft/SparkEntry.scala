package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — one `queries` entry (plus DuckDB `oracleSql` where
  * SQL-expressible) per implemented operator from SURVEY.md §2.
  * Query implementations live in `graft.queries.*` modules; operator
  * building blocks in `graft.ops.*`. Conventions in
  * [[graft.queries.QueryModule]] / [[graft.ops.Exact]].
  */
object SparkEntry {

  private val modules: Seq[QueryModule] =
    Seq(Core, Analytics, SeriesStats, Experiments, Text, Tokenizers, TextDedup, TextExact,
      Curation, CurationGates, Vectors, VectorsDedup, VectorsGraph, VectorCompress,
      Wire, Relational, Audits, Graphs, Multilingual, Forecasts, Tpch)

  /** Flagship (SURVEY §7.3): scan → derive flags → hash-agg → weighted score
    * → global rank → top-k gate, on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_ranking_topk")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    modules.map(_.oracleSql).reduce(_ ++ _)
}
