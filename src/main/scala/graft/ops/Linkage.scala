package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi & Sunter (1969): score
  * candidate pairs by summing per-field agreement/disagreement log-odds
  * weights, `w_agree = log2(m/u)`, `w_dis = log2((1−m)/(1−u))`, where
  * m = P(field agrees | true match) and u = P(field agrees | non-match).
  * The principled upgrade over the q70/q162 deterministic similarity
  * gates: a rare field agreeing (phone) moves the score far more than a
  * common one (market segment), and partial evidence ACCUMULATES.
  */
object Linkage {

  /** One comparison field: its column name (present in both sides) and
    * the (m, u) probabilities — from domain priors or an EM pass. */
  final case class FsField(name: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
      s"need 0 < u < m < 1 for $name")
    /** Integer micro-log2 weights — computed ONCE at plan build, so the
      * same literal lands in the Spark plan and the oracle SQL: the
      * doubles never cross an engine boundary. */
    def wAgree: Long = math.round(math.log(m / u) / math.log(2.0) * 1e6)
    def wDis: Long =
      math.round(math.log((1 - m) / (1 - u)) / math.log(2.0) * 1e6)
  }

  /** Score all candidate pairs sharing `blockCol` (cheap blocking —
    * swap in [[graft.dedup.NearDup.sortedNeighborhoodPairs]] upstream
    * when blocks skew). NULL-safe agreement (`<=>`): NULL vs NULL
    * agrees, NULL vs value disagrees.
    *
    * Scale shape: ONE keyed equi-join on the block, per-pair scoring is
    * a codegen'd sum of CASE literals, no windows. Pair count is
    * Σ|block_a|·|block_b| — the blocking key is the cost lever, stated
    * in the report (`n_pairs` per block is one groupBy away).
    *
    * @return (id_a, id_b, score_micro, is_match) —
    *         is_match = score ≥ thresholdMicro
    */
  def fellegiSunter(a: DataFrame, b: DataFrame, idCol: String,
      blockCol: String, fields: Seq[FsField],
      thresholdMicro: Long): DataFrame = {
    require(fields.nonEmpty)
    val left = a.select((col(idCol).as("id_a") +: col(blockCol).as("__blk")
      +: fields.map(f => col(f.name).as(s"__a_${f.name}"))): _*)
    val right = b.select((col(idCol).as("id_b") +: col(blockCol).as("__blk")
      +: fields.map(f => col(f.name).as(s"__b_${f.name}"))): _*)
    val score = fields.map { f =>
      when(col(s"__a_${f.name}") <=> col(s"__b_${f.name}"),
        lit(f.wAgree)).otherwise(lit(f.wDis))
    }.reduce(_ + _)
    left.join(right, "__blk")
      .select(col("id_a"), col("id_b"), score.as("score_micro"))
      .withColumn("is_match", col("score_micro") >= thresholdMicro)
  }

  /** DuckDB oracle for [[fellegiSunter]]: `aSql`/`bSql` yield
    * (id, blk, field columns by name). */
  def fellegiSunterOracleSql(aSql: String, bSql: String,
      idName: String, fields: Seq[FsField],
      thresholdMicro: Long): String = {
    val score = fields.map { f =>
      s"CASE WHEN a.${f.name} IS NOT DISTINCT FROM b2.${f.name} " +
        s"THEN ${f.wAgree} ELSE ${f.wDis} END"
    }.mkString("(", " + ", ")")
    s"""WITH a AS ($aSql), b2 AS ($bSql)
       |SELECT a.$idName AS id_a, b2.$idName AS id_b,
       |       CAST($score AS BIGINT) AS score_micro,
       |       CAST($score AS BIGINT) >= $thresholdMicro AS is_match
       |FROM a JOIN b2 ON a.blk = b2.blk""".stripMargin
  }
}
