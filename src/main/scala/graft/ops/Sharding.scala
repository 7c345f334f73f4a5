package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic TRAINING-ORDER layout: the "global shuffle" a
    * pretraining run needs, as a HASH rather than an RNG state — each
    * document's shard is `hash60(salt_id) mod nShards` and its position
    * within the shard is its rank in (hash, id) order, so the epoch
    * order (shard asc, pos asc) is a reproducible permutation: any
    * worker can recompute any slice from the salt alone (resume-safe,
    * no shuffle file manifest), and changing the salt is a fresh epoch
    * permutation.
    *
    * Scale shape: one projection + ONE keyed window (partitioned by
    * shard — nShards-way parallel local sorts, never a global sort; the
    * [[graft.ops.Ranking.globalOrdinals]] offset trick turns (shard,
    * pos) into a single ordinal when one is really needed).
    *
    * @return (idCol, shard, pos, n_tokens) — pos is 1-based */
  def shardLayout(df: DataFrame, idCol: String, tokens: Column,
      nShards: Int, salt: String): DataFrame = {
    require(nShards >= 1)
    val h = Hash64.hash60(
      concat(lit(salt), lit("_"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), tokens.cast("long").as("n_tokens"))
      .withColumn("__h", h)
      .withColumn("shard", col("__h") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"), col("n_tokens"))
  }

  /** DuckDB oracle for [[shardLayout]]. `innerSql` yields
    * (idName, n_tokens BIGINT). */
  def shardLayoutOracleSql(innerSql: String, idName: String,
      nShards: Int, salt: String): String = {
    val h = Hash64.duckSql(s"'${salt}_' || CAST($idName AS VARCHAR)")
    s"""WITH b AS (
       |  SELECT $idName, n_tokens, $h AS h FROM ($innerSql)
       |)
       |SELECT $idName, h % $nShards AS shard,
       |       CAST(row_number() OVER (PARTITION BY h % $nShards
       |         ORDER BY h, $idName) AS BIGINT) AS pos,
       |       n_tokens
       |FROM b""".stripMargin
  }

  /** CURRICULUM variant of [[shardLayout]] — the other layout a
    * training loader actually chooses between: shard assignment stays
    * the salted hash (uniform random composition per shard), but the
    * within-shard order is (curriculum bucket asc, hash, id) — an
    * "easy first" (or any staged) schedule, hash-shuffled WITHIN each
    * bucket so a stage is still an unbiased sample of its difficulty
    * band. The whole layout remains a pure function of
    * (salt, id, bucket): any worker recomputes any slice from the salt
    * alone, resume-safe, no shuffle-file manifest — the [[shardLayout]]
    * contract with one more sort key.
    *
    * Scale shape: identical to [[shardLayout]] — one projection + ONE
    * window partitioned by shard (nShards-way parallel local sorts,
    * never a global sort).
    *
    * @param bucket integer curriculum stage (smaller = earlier)
    * @return (idCol, shard, pos, bucket, n_tokens) — pos is 1-based */
  def curriculumShardLayout(df: DataFrame, idCol: String, tokens: Column,
      bucket: Column, nShards: Int, salt: String): DataFrame = {
    require(nShards >= 1)
    val h = Hash64.hash60(
      concat(lit(salt), lit("_"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("bucket"), col("__h"), col(idCol))
    df.select(col(idCol), tokens.cast("long").as("n_tokens"),
        bucket.cast("long").as("bucket"))
      .withColumn("__h", h)
      .withColumn("shard", col("__h") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"), col("bucket"),
        col("n_tokens"))
  }

  /** DuckDB oracle for [[curriculumShardLayout]]. `innerSql` yields
    * (idName, n_tokens BIGINT, bucket BIGINT). */
  def curriculumShardLayoutOracleSql(innerSql: String, idName: String,
      nShards: Int, salt: String): String = {
    val h = Hash64.duckSql(s"'${salt}_' || CAST($idName AS VARCHAR)")
    s"""WITH b AS (
       |  SELECT $idName, n_tokens, bucket, $h AS h FROM ($innerSql)
       |)
       |SELECT $idName, h % $nShards AS shard,
       |       CAST(row_number() OVER (PARTITION BY h % $nShards
       |         ORDER BY bucket, h, $idName) AS BIGINT) AS pos,
       |       bucket, n_tokens
       |FROM b""".stripMargin
  }

  /** Mixture-interleave audit — does the deterministic training order
    * hold the source composition LOCALLY, not just on average? Each
    * document gets a stride-scheduling key (2r−1)/(2·n_s) ∈ (0,1)
    * (r = its hash-order rank within its source): reading documents in
    * key order interleaves sources proportionally by construction —
    * any key interval of width w holds w·n_s ± 1 documents of source s.
    * The audit splits the key domain into `nBlocks` equal blocks and
    * reports, per (block, source), the exact integer deviation from the
    * target share: dev_num = |n_bs·N − n_b·n_s| (÷ n_b·N to read as a
    * share). A curriculum or mixture bug shows up as a block whose
    * composition drifts — the thing a global rate check (q66) is blind
    * to.
    *
    * Exactness: the key and the block id are the same IEEE double
    * sequence on both engines ((2r−1) and 2·n_s exact integers well
    * under 2⁵³); everything after is integer.
    *
    * Scale shape: per-source ranks come from the MEGA-KEY-SAFE banded
    * prefix sum ([[graft.ops.Sampling.bandedPrefix]] with value 1 —
    * the tokenBudgetSample decomposition, round 11): a dominant web-
    * crawl source never rank-sorts in one task; block stats are ONE
    * keyed aggregation over (block, source); the per-source and global
    * totals ride broadcast dimension frames. No global sort ever
    * forms — the interleave order is a sort KEY, materialized only
    * blockwise.
    *
    * @return (block, source, n_bs, n_b, n_s, dev_num) */
  def interleaveAudit(df: DataFrame, srcCol: String, idCol: String,
      nBlocks: Int, salt: String, bands: Int = 4096): DataFrame = {
    require(nBlocks >= 1)
    val base = graft.ops.Sampling.bandedPrefix(
      df.select(col(srcCol), col(idCol)), srcCol, idCol, lit(1L),
      salt, bands, "r")
    val perSrc = base.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_s"))
    val tot = perSrc.agg(sum(col("n_s")).as("__N"))
    val keyed = base.join(broadcast(perSrc), srcCol)
      .withColumn("__key",
        (col("r") * 2 - 1).cast("double") /
          (col("n_s") * 2).cast("double"))
      .withColumn("block",
        floor(col("__key") * lit(nBlocks.toDouble)).cast("long"))
    val blockTot = keyed.groupBy(col("block"))
      .agg(count(lit(1)).as("n_b"))
    keyed.groupBy(col("block"), col(srcCol), col("n_s"))
      .agg(count(lit(1)).as("n_bs"))
      .join(broadcast(blockTot), "block")
      .crossJoin(broadcast(tot))
      .withColumn("dev_num",
        abs(col("n_bs") * col("__N") - col("n_b") * col("n_s")))
      .select(col("block"), col(srcCol), col("n_bs"), col("n_b"),
        col("n_s"), col("dev_num"))
  }

  /** TOKEN-weighted [[interleaveAudit]]: real mixture targets are
    * token shares, not document counts, and a source with long
    * documents drifts off target under doc-count striding exactly when
    * it matters. Here each document's key is its token-mass MIDPOINT
    * within its source's hash-ordered token axis,
    * (2·cumtok − tok) / (2·T_s) ∈ (0,1) — any key interval of width w
    * carries w·T_s ± max_tok tokens of source s by construction — and
    * the audit reports per (block, source) the exact integer deviation
    * of the TOKEN sums from the target share:
    * dev_num = |t_bs·T − t_b·T_s|.
    *
    * Exactness/scale: same contract as [[interleaveAudit]] (the
    * per-source cumulative token sum is the banded mega-key-safe
    * prefix, one keyed aggregation, dimension frames broadcast; the
    * key is one IEEE division of exact integers).
    *
    * @return (block, source, t_bs, t_b, t_s, dev_num) */
  def interleaveTokensAudit(df: DataFrame, srcCol: String,
      idCol: String, tokens: Column, nBlocks: Int, salt: String,
      bands: Int = 4096): DataFrame = {
    require(nBlocks >= 1)
    val base = graft.ops.Sampling.bandedPrefix(
      df.select(col(srcCol), col(idCol),
          tokens.cast("long").as("tok"))
        .filter(col("tok") > 0),
      srcCol, idCol, col("tok"), salt, bands, "cumtok")
    val perSrc = base.groupBy(col(srcCol))
      .agg(sum(col("tok")).as("t_s"))
    val tot = perSrc.agg(sum(col("t_s")).as("__T"))
    val keyed = base.join(broadcast(perSrc), srcCol)
      .withColumn("__key",
        (col("cumtok") * 2 - col("tok")).cast("double") /
          (col("t_s") * 2).cast("double"))
      .withColumn("block",
        floor(col("__key") * lit(nBlocks.toDouble)).cast("long"))
    val blockTot = keyed.groupBy(col("block"))
      .agg(sum(col("tok")).as("t_b"))
    keyed.groupBy(col("block"), col(srcCol), col("t_s"))
      .agg(sum(col("tok")).as("t_bs"))
      .join(broadcast(blockTot), "block")
      .crossJoin(broadcast(tot))
      .withColumn("dev_num",
        abs(col("t_bs") * col("__T") - col("t_b") * col("t_s")))
      .select(col("block"), col(srcCol), col("t_bs"), col("t_b"),
        col("t_s"), col("dev_num"))
  }

  /** DuckDB oracle for [[interleaveTokensAudit]]. `innerSql` yields
    * (srcName, idName, tok BIGINT). */
  def interleaveTokensOracleSql(innerSql: String, srcName: String,
      idName: String, nBlocks: Int, salt: String): String = {
    val h = Hash64.duckSql(s"'${salt}_' || CAST($idName AS VARCHAR)")
    s"""WITH b AS (
       |  SELECT $srcName, $idName, tok, $h AS h FROM ($innerSql)
       |  WHERE tok > 0
       |), ranked AS (
       |  SELECT $srcName, tok,
       |         CAST(sum(tok) OVER (PARTITION BY $srcName
       |           ORDER BY h, $idName ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS BIGINT) AS cumtok
       |  FROM b
       |), src AS (
       |  SELECT $srcName, CAST(sum(tok) AS BIGINT) AS t_s
       |  FROM b GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(t_s) AS BIGINT) AS tt FROM src
       |), keyed AS (
       |  SELECT ranked.$srcName, ranked.tok, src.t_s,
       |         CAST(floor(CAST(cumtok * 2 - tok AS DOUBLE)
       |           / CAST(t_s * 2 AS DOUBLE) * $nBlocks.0) AS BIGINT)
       |           AS block
       |  FROM ranked JOIN src USING ($srcName)
       |), bs AS (
       |  SELECT block, $srcName, t_s, CAST(sum(tok) AS BIGINT) AS t_bs
       |  FROM keyed GROUP BY 1, 2, 3
       |), bt AS (
       |  SELECT block, CAST(sum(t_bs) AS BIGINT) AS t_b FROM bs
       |  GROUP BY 1
       |)
       |SELECT bs.block, bs.$srcName, bs.t_bs, bt.t_b, bs.t_s,
       |       abs(bs.t_bs * tot.tt - bt.t_b * bs.t_s) AS dev_num
       |FROM bs JOIN bt USING (block) CROSS JOIN tot""".stripMargin
  }

  /** DuckDB oracle for [[interleaveAudit]]. `innerSql` yields
    * (srcName, idName). */
  def interleaveAuditOracleSql(innerSql: String, srcName: String,
      idName: String, nBlocks: Int, salt: String): String = {
    val h = Hash64.duckSql(s"'${salt}_' || CAST($idName AS VARCHAR)")
    s"""WITH b AS (
       |  SELECT $srcName, $idName, $h AS h FROM ($innerSql)
       |), ranked AS (
       |  SELECT $srcName,
       |         CAST(row_number() OVER (PARTITION BY $srcName
       |           ORDER BY h, $idName) AS BIGINT) AS r
       |  FROM b
       |), src AS (
       |  SELECT $srcName, CAST(count(*) AS BIGINT) AS n_s
       |  FROM b GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(n_s) AS BIGINT) AS nn FROM src
       |), keyed AS (
       |  SELECT ranked.$srcName, src.n_s,
       |         CAST(floor(CAST(r * 2 - 1 AS DOUBLE)
       |           / CAST(n_s * 2 AS DOUBLE) * $nBlocks.0) AS BIGINT)
       |           AS block
       |  FROM ranked JOIN src USING ($srcName)
       |), bs AS (
       |  SELECT block, $srcName, n_s, CAST(count(*) AS BIGINT) AS n_bs
       |  FROM keyed GROUP BY 1, 2, 3
       |), bt AS (
       |  SELECT block, CAST(sum(n_bs) AS BIGINT) AS n_b FROM bs
       |  GROUP BY 1
       |)
       |SELECT bs.block, bs.$srcName, bs.n_bs, bt.n_b, bs.n_s,
       |       abs(bs.n_bs * tot.nn - bt.n_b * bs.n_s) AS dev_num
       |FROM bs JOIN bt USING (block) CROSS JOIN tot""".stripMargin
  }
}
