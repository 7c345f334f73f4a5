package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries with (optional) DuckDB oracles.
  *
  * Conventions (driver compare is hash-exact; see `graft.ops.Exact`):
  *  - computed columns aliased identically in Spark plan and oracle SQL;
  *  - float results derived from exact integer aggregates via identical
  *    double-op sequences on both sides — never `round(agg(double))`;
  *  - DuckDB integer sums `CAST(... AS BIGINT)` to match Spark `sum(int)`;
  *  - `row_number()`/`count(*) OVER` cast to BIGINT (Spark side `.cast("long")`).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
