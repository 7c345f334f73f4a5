package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hash64

/** Rendezvous (highest-random-weight) sharding — STABLE shard
  * assignment for incremental corpus rebuilds: when the shard count
  * changes n → n+1, only ~1/(n+1) of documents move (mod-n hashing
  * moves almost all of them), so downstream per-shard artifacts
  * (tokenized caches, index segments, dedup histories) stay warm.
  *
  * Weight = portable [[Hash64.hash60]] of `"<id>:<shard>"`; a document
  * lands on its argmax-weight shard (tie → lower shard, a total order).
  * Everything is integer hashing — assignment is deterministic across
  * engines, partitionings and runs, and the whole op hash-matches its
  * DuckDB replay.
  *
  * Scale shape: one fixed `nShards`-way generator fan-out + one
  * map-side-combinable argmax per id — no shuffle beyond the id
  * aggregation, no state. Cost is O(rows·nShards): rendezvous is the
  * right tool at shard counts in the tens-to-hundreds; at thousands use
  * jump-consistent hashing instead.
  */
object Sharding {

  /** @return (idCol, shard) — shard ∈ [0, nShards) */
  def rendezvousAssign(df: DataFrame, idCol: String, nShards: Int)
      : DataFrame = {
    require(nShards >= 1)
    df.select(col(idCol))
      .withColumn("__shard",
        explode(sequence(lit(0L), lit(nShards.toLong - 1))))
      .withColumn("__w", Hash64.hash60(
        concat(col(idCol).cast("string"), lit(":"),
          col("__shard").cast("string"))))
      .groupBy(col(idCol))
      .agg(min_by(col("__shard"), struct((-col("__w")).as("nw"),
        col("__shard"))).as("shard"))
  }

  /** Stability report for a shard-count change `nA → nB`: per OLD shard,
    * how many documents stay vs move. Rendezvous guarantees the moved
    * fraction ≈ |nB − nA|/max(nA,nB) overall; this measures it.
    *
    * @return (shard_a, n_docs, n_moved, moved_frac)
    */
  def rendezvousStability(df: DataFrame, idCol: String, nA: Int,
      nB: Int): DataFrame = {
    val a = rendezvousAssign(df, idCol, nA)
      .withColumnRenamed("shard", "shard_a")
    val b = rendezvousAssign(df, idCol, nB)
      .withColumnRenamed("shard", "shard_b")
    a.join(b, idCol)
      .groupBy(col("shard_a"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_a") =!= col("shard_b"), 1L).otherwise(0L))
          .as("n_moved"))
      .withColumn("moved_frac",
        col("n_moved").cast("double") / col("n_docs"))
  }

  /** Jump-consistent assignment — the [[rendezvousAssign]] scale path
    * (O(ln n) per key, no per-shard fan-out) via the native
    * [[graft.functions.JumpHash]] expression, seeded with the portable
    * [[Hash64.hash60]] of the id. Same stability guarantee; use beyond
    * ~hundreds of shards.
    *
    * @return (idCol, shard) — shard ∈ [0, nShards) */
  def jumpAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.select(col(idCol),
      graft.functions.JumpHash.jumpHash(
        Hash64.hash60(col(idCol).cast("string")), nShards).as("shard"))

  /** Stability report for [[jumpAssign]] under `nA → nB`, same shape as
    * [[rendezvousStability]]. */
  def jumpStability(df: DataFrame, idCol: String, nA: Int, nB: Int)
      : DataFrame = {
    val a = jumpAssign(df, idCol, nA).withColumnRenamed("shard", "shard_a")
    val b = jumpAssign(df, idCol, nB).withColumnRenamed("shard", "shard_b")
    a.join(b, idCol)
      .groupBy(col("shard_a"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_a") =!= col("shard_b"), 1L).otherwise(0L))
          .as("n_moved"))
      .withColumn("moved_frac",
        col("n_moved").cast("double") / col("n_docs"))
  }

  /** DuckDB oracle for [[jumpStability]]: the [[JumpHash.duckSql]]
    * recursive-CTE replay, twice. `innerSql` yields one `idName`
    * column. */
  def jumpStabilityOracleSql(innerSql: String, idName: String, nA: Int,
      nB: Int): String = {
    val keyed =
      s"""SELECT $idName,
         |       ${Hash64.duckSql(s"CAST($idName AS VARCHAR)")} AS key
         |FROM ($innerSql)""".stripMargin
    def assign(n: Int) = graft.functions.JumpHash.duckSql(keyed, idName, n)
    s"""WITH a AS (${assign(nA)}),
       |b AS (${assign(nB)})
       |SELECT a.bucket AS shard_a, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN a.bucket <> b.bucket THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_moved,
       |       CAST(sum(CASE WHEN a.bucket <> b.bucket THEN 1 ELSE 0 END)
       |         AS DOUBLE) / count(*) AS moved_frac
       |FROM a JOIN b USING ($idName)
       |GROUP BY 1""".stripMargin
  }

  /** DuckDB fragment: (id, shard) assignment for [[rendezvousAssign]];
    * `innerSql` yields one `idName` column, id rendered as VARCHAR for
    * the hash exactly like the Spark cast. */
  private def assignSql(innerSql: String, idName: String,
      nShards: Int): String = {
    val w = Hash64.duckSql(
      s"CAST($idName AS VARCHAR) || ':' || CAST(shard AS VARCHAR)")
    s"""SELECT $idName, shard FROM (
       |  SELECT $idName, shard,
       |         row_number() OVER (PARTITION BY $idName
       |           ORDER BY -($w), shard) AS rn
       |  FROM ($innerSql)
       |  CROSS JOIN (SELECT unnest(range(0, $nShards)) AS shard)
       |) WHERE rn = 1""".stripMargin
  }

  /** DuckDB oracle for [[rendezvousStability]]. */
  def rendezvousStabilityOracleSql(innerSql: String, idName: String,
      nA: Int, nB: Int): String =
    s"""WITH a AS (${assignSql(innerSql, idName, nA)}),
       |b AS (${assignSql(innerSql, idName, nB)})
       |SELECT a.shard AS shard_a, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_moved,
       |       CAST(sum(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END)
       |         AS DOUBLE) / count(*) AS moved_frac
       |FROM a JOIN b USING ($idName)
       |GROUP BY 1""".stripMargin
}
