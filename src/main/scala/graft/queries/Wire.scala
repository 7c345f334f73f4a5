package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.Ingest
import graft.ops.{Anomaly, Exact}

/** The wire-format ingest path (P1-P3, G1, X5) made oracle-checkable:
  * envelope JSON is synthesized from `events`, pushed through the real
  * parse → explode → flatten → derive pipeline, and compared against a
  * direct relational projection of the same rows. A value that survives
  * the JSON round-trip wrong, a mis-mapped field, or a broken explode all
  * surface as a hash mismatch.
  */
object Wire extends QueryModule {

  /** Synthesizes one `{player, matches[]}` envelope per user from events
    * (the test stand-in for the reference's Kafka producer, SURVEY §5). */
  private def envelopes(t: Tables): DataFrame = {
    val m = t.events.select(
      col("user_id"),
      struct(
        col("event_id").cast("string").as("match_id"),
        col("event_type").as("game_mode"),
        lit("test_map").as("map_name"),
        (col("event_id") % 3600).cast("int").as("duration"),
        lit(false).as("is_custom_match"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("created_at"),
        struct(
          get_json_object(col("props"), "$.k").cast("int").as("kills"),
          (col("event_id") % 5).cast("int").as("assists"),
          (col("event_id") % 7).cast("int").as("headshot_kills"),
          (col("value") * lit(2.0)).as("longest_kill"),
          (col("value") * lit(10.0)).as("damage_dealt"),
          col("value").as("time_survived"),
          col("event_type").as("death_type"),
          (col("event_id") % 100 + 1).cast("int").as("win_place"),
          col("value").as("walk_distance"),
          (col("event_id") % 9).cast("int").as("weapons_acquired"),
          concat(lit("user_"), col("user_id")).as("participant_name")
        ).as("player_performance")
      ).as("m"))
    m.groupBy(col("user_id"))
      .agg(collect_list(col("m")).as("matches"),
        collect_list(col("m.match_id")).as("match_ids"))
      .select(to_json(struct(
        struct(
          concat(lit("user_"), col("user_id")).as("player_name"),
          col("user_id").cast("string").as("account_id"),
          lit("steam").as("shard_id"),
          size(col("matches")).as("total_matches_count"),
          col("match_ids"),
          lit("2024-01-01 00:00:00").as("data_collected_at")
        ).as("player"),
        col("matches"))).as("value"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P2+P3+G1+P4-P8+X5+F1: full ingest pipeline over synthesized wire JSON.
    "q31_envelope_flatten" -> ((s, dir) => {
      val t = Tables(s, dir)
      Ingest.validPerformance(
        Ingest.flattenMatches(
          Ingest.parseEnvelope(envelopes(t))))
        .drop("headshot_kills") // retained inputs below keep the row identity
    }),

    // S5+P13+F5+X2: the alert wire path (`advanced_analytics.py:208-228`) —
    // anomalous rows serialized as to_json(struct(...)) messages. Payload
    // keeps longs/strings only (money as cents) so the wire bytes are
    // bit-identical across engines — no double formatting divergence.
    "q32_alert_wire" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val alerts = ev.select(
        col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("kills"),
        Exact.cents(col("value") * lit(10.0)).as("damage_cents"),
        ((col("value") - lit(100.0)) / lit(50.0)).as("z"))
        .filter(col("kills").isNotNull && col("damage_cents").isNotNull &&
          abs(col("z")) > 2.5)
        .withColumn("severity", Anomaly.severity(
          col("kills"), col("damage_cents").cast("double") / lit(100.0), Seq(col("z"))))
      alerts.select(to_json(struct(
        col("event_id"), col("user_id"), col("kills"), col("damage_cents"),
        col("severity"), lit("statistical_anomaly").as("alert_type"))).as("value"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q31_envelope_flatten" ->
      """SELECT 'user_' || CAST(user_id AS VARCHAR) AS player_name,
        |       CAST(user_id AS VARCHAR) AS account_id,
        |       '2024-01-01 00:00:00' AS data_collected_at,
        |       CAST(event_id AS VARCHAR) AS match_id,
        |       event_type AS game_mode,
        |       'test_map' AS map_name,
        |       CAST(event_id % 3600 AS INTEGER) AS duration,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS created_at,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS kills,
        |       CAST(event_id % 5 AS INTEGER) AS assists,
        |       value * 10.0 AS damage_dealt,
        |       value AS time_survived,
        |       event_type AS death_type,
        |       CAST(event_id % 100 + 1 AS INTEGER) AS win_place,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER)
        |         + CAST(event_id % 5 AS INTEGER) AS ka_score,
        |       value * 10.0 / greatest(value, 1) AS dps,
        |       CAST(CAST(event_id % 7 AS INTEGER) AS DOUBLE)
        |         / greatest(CAST(json_extract_string(props, '$.k') AS INTEGER), 1) AS headshot_ratio,
        |       CASE WHEN event_id % 100 + 1 = 1 THEN 1 ELSE 0 END AS is_winner,
        |       CASE WHEN event_id % 100 + 1 <= 10 THEN 1 ELSE 0 END AS top10_finish
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  AND value IS NOT NULL""".stripMargin,

    "q32_alert_wire" ->
      """WITH alerts AS (
        |  SELECT event_id, user_id,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS kills,
        |         CAST(round(value * 10.0 * 100) AS BIGINT) AS damage_cents,
        |         (value - 100.0) / 50.0 AS z
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL
        |    AND value IS NOT NULL
        |    AND abs((value - 100.0) / 50.0) > 2.5
        |)
        |SELECT CAST(to_json(struct_pack(
        |  event_id := event_id,
        |  user_id := user_id,
        |  kills := kills,
        |  damage_cents := damage_cents,
        |  severity := CASE
        |    WHEN kills >= 20 OR CAST(damage_cents AS DOUBLE) / 100.0 >= 4000
        |         OR abs(z) >= 4.0 THEN 'HIGH'
        |    WHEN kills >= 15 OR CAST(damage_cents AS DOUBLE) / 100.0 >= 2500
        |         OR abs(z) >= 3.0 THEN 'MEDIUM'
        |    ELSE 'LOW' END,
        |  alert_type := 'statistical_anomaly')) AS VARCHAR) AS value
        |FROM alerts""".stripMargin,
  )
}
