package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Envelope ingest: the reference's wire format and ETL flatten path.
  *
  * Wire schema from `/root/reference/spark_apps/pubg_streaming.py:28-135`
  * (full) and `:140-144` (envelope): one Kafka message = one JSON envelope
  * `{player: {...}, matches: [...]}`; the analytics job re-declares a
  * narrower projection of the same format (`advanced_analytics.py:36-62`)
  * — schema-on-read pruning that Catalyst's `OptimizeJsonExprs` exploits:
  * only fields actually projected are parsed out of the JSON.
  *
  * P1 cast → P2 `from_json` → P3 star-expand → G1 `explode(matches)` →
  * P4-P15 projection/derivation (X5 derived metrics from
  * `advanced_analytics.py:84-88`).
  */
object Ingest {

  /** player_performance struct (`pubg_streaming.py:100-134`). */
  val performanceSchema: StructType = StructType(Seq(
    StructField("kills", IntegerType),
    StructField("assists", IntegerType),
    StructField("headshot_kills", IntegerType),
    StructField("longest_kill", DoubleType),
    StructField("damage_dealt", DoubleType),
    StructField("time_survived", DoubleType),
    StructField("death_type", StringType),
    StructField("win_place", IntegerType),
    StructField("walk_distance", DoubleType),
    StructField("weapons_acquired", IntegerType),
    StructField("participant_name", StringType)))

  /** match element struct (`pubg_streaming.py:62-135`, pruned per the
    * analytics job's narrower declaration). */
  val matchSchema: StructType = StructType(Seq(
    StructField("match_id", StringType),
    StructField("game_mode", StringType),
    StructField("map_name", StringType),
    StructField("duration", IntegerType),
    StructField("is_custom_match", BooleanType),
    StructField("created_at", StringType),
    StructField("player_performance", performanceSchema)))

  /** player struct (`pubg_streaming.py:28-60`, pruned). */
  val playerSchema: StructType = StructType(Seq(
    StructField("player_name", StringType),
    StructField("account_id", StringType),
    StructField("shard_id", StringType),
    StructField("total_matches_count", IntegerType),
    StructField("match_ids", ArrayType(StringType)),
    StructField("data_collected_at", StringType)))

  /** Kafka `pubg-matches` envelope. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("player", playerSchema),
    StructField("matches", ArrayType(matchSchema))))

  /** P1+P2+P3: raw message bytes/string → parsed envelope columns.
    * (`pubg_streaming.py:138-145`). */
  def parseEnvelope(raw: DataFrame, valueCol: String = "value",
      schema: StructType = envelopeSchema): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), schema).as("data"))
      .select(col("data.*"))

  /** G1 + P4-P8 + X5: explode matches, flatten to one row per
    * (player, match), append the derived performance metrics
    * (`advanced_analytics.py:70-89`). */
  def flattenMatches(envelopes: DataFrame): DataFrame = {
    val perf = col("m.player_performance")
    envelopes
      .select(col("player"), explode(col("matches")).as("m"))
      .select(
        col("player.player_name").as("player_name"),
        col("player.account_id").as("account_id"),
        col("player.data_collected_at").as("data_collected_at"),
        col("m.match_id").as("match_id"),
        col("m.game_mode").as("game_mode"),
        col("m.map_name").as("map_name"),
        col("m.duration").as("duration"),
        col("m.created_at").as("created_at"),
        perf.getField("kills").as("kills"),
        perf.getField("assists").as("assists"),
        perf.getField("headshot_kills").as("headshot_kills"),
        perf.getField("damage_dealt").as("damage_dealt"),
        perf.getField("time_survived").as("time_survived"),
        perf.getField("death_type").as("death_type"),
        perf.getField("win_place").as("win_place"))
      .withColumn("ka_score", col("kills") + col("assists"))
      .withColumn("dps", col("damage_dealt") / greatest(col("time_survived"), lit(1)))
      .withColumn("headshot_ratio",
        col("headshot_kills").cast("double") / greatest(col("kills"), lit(1)))
      .withColumn("is_winner", when(col("win_place") === 1, 1).otherwise(0))
      .withColumn("top10_finish", when(col("win_place") <= 10, 1).otherwise(0))
  }

  /** F1 null guard (`advanced_analytics.py:89`). */
  def validPerformance(df: DataFrame): DataFrame =
    df.filter(col("kills").isNotNull && col("damage_dealt").isNotNull)

  /** Dead-letter split: parse the envelope but KEEP malformed messages.
    * The reference (and [[parseEnvelope]]) silently nulls-then-drops bad
    * JSON — at telemetry scale that's data loss with no audit trail. Here
    * a message is routed to `bad` when `from_json` cannot produce a
    * non-null envelope; `bad` carries the raw payload for a dead-letter
    * sink (replayable once the producer bug is fixed). Both arms are pure
    * projection + filter (no shuffle), but they are INDEPENDENT plans:
    * materializing both re-runs the scan and the JSON parse twice. When
    * both arms are written in one job, persist the parsed frame first —
    * or write a single output with a routing column — so the dominant
    * parse cost is paid once.
    *
    * @return (good envelopes frame, bad raw-message frame) */
  def parseWithDeadLetter(raw: DataFrame, valueCol: String = "value",
      schema: StructType = envelopeSchema): (DataFrame, DataFrame) = {
    val parsed = raw.withColumn("__env",
      from_json(col(valueCol).cast("string"), schema))
    // from_json yields null for unparseable text; an envelope missing BOTH
    // declared fields is schema-mismatched junk even if it is valid JSON
    val ok = col("__env").isNotNull &&
      (col("__env.player").isNotNull || col("__env.matches").isNotNull)
    val good = parsed.filter(ok).select(col("__env.*"))
    val bad = parsed.filter(!ok)
      .select(col(valueCol).cast("string").as("raw_value"))
    (good, bad)
  }

  /** Semi-structured schema discovery: top-level key frequency over a
    * JSON string column — the first question against a new feed ("what
    * fields actually arrive, and how often"), which a declared
    * `from_json` schema presupposes an answer to. One explode + one
    * hash aggregation; the row total broadcasts back (the one-row
    * stat idiom).
    *
    * @return (key, n_rows_with_key, n_rows, frac) per top-level key
    */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("n_rows"))
    df.filter(col(jsonCol).isNotNull)
      .select(explode(json_object_keys(col(jsonCol))).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_rows_with_key"))
      .crossJoin(broadcast(total))
      .withColumn("frac",
        col("n_rows_with_key").cast("double") / col("n_rows"))
  }

  /** DuckDB oracle for [[jsonKeyProfile]]. */
  def jsonKeyProfileOracleSql(table: String, jsonCol: String): String =
    s"""WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM $table),
       |k AS (
       |  SELECT unnest(json_keys($jsonCol)) AS key
       |  FROM $table WHERE $jsonCol IS NOT NULL
       |)
       |SELECT key, CAST(count(*) AS BIGINT) AS n_rows_with_key, t.n_rows,
       |       CAST(count(*) AS DOUBLE) / t.n_rows AS frac
       |FROM k, t GROUP BY key, t.n_rows""".stripMargin
}
