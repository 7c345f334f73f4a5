package graft

import org.apache.spark.sql.functions._

import graft.ingest.Ingest

/** Ingest path against a literal reference-shaped envelope
  * (FIXTURES.md A1; wire format of `producer/producer.py:73-215`). */
class IngestSpec extends SparkSuite {

  private val envelope =
    """{"player": {"player_name": "TestPlayer", "account_id": "acc-1",
      |  "shard_id": "steam", "total_matches_count": 2,
      |  "match_ids": ["m1", "m2"], "data_collected_at": "2024-01-01 00:00:00"},
      | "matches": [
      |  {"match_id": "m1", "game_mode": "squad", "map_name": "Erangel",
      |   "duration": 1800, "is_custom_match": false, "created_at": "2024-01-01T00:00:00Z",
      |   "player_performance": {"kills": 8, "assists": 2, "headshot_kills": 4,
      |     "longest_kill": 250.5, "damage_dealt": 980.5, "time_survived": 1500.0,
      |     "death_type": "byplayer", "win_place": 2, "walk_distance": 2500.0,
      |     "weapons_acquired": 5, "participant_name": "TestPlayer"}},
      |  {"match_id": "m2", "game_mode": "solo", "map_name": "Miramar",
      |   "duration": 1200, "is_custom_match": false, "created_at": "2024-01-01T01:00:00Z",
      |   "player_performance": {"kills": 0, "assists": 0, "headshot_kills": 0,
      |     "longest_kill": 0.0, "damage_dealt": 55.0, "time_survived": 300.0,
      |     "death_type": "byplayer", "win_place": 55, "walk_distance": 400.0,
      |     "weapons_acquired": 1, "participant_name": "TestPlayer"}}
      | ]}""".stripMargin.replaceAll("\n", "")

  test("parse + flatten yields one row per (player, match) with derived metrics") {
    import spark.implicits._
    val raw = Seq(envelope).toDF("value")
    val flat = Ingest.flattenMatches(Ingest.parseEnvelope(raw))
    val rows = flat.orderBy("match_id").collect()
    assert(rows.length == 2)

    val m1 = rows(0)
    assert(m1.getAs[String]("player_name") == "TestPlayer")
    assert(m1.getAs[String]("match_id") == "m1")
    assert(m1.getAs[Int]("kills") == 8)
    assert(m1.getAs[Int]("ka_score") == 10)
    assert(m1.getAs[Double]("dps") == 980.5 / 1500.0)
    assert(m1.getAs[Double]("headshot_ratio") == 0.5)
    assert(m1.getAs[Int]("is_winner") == 0)
    assert(m1.getAs[Int]("top10_finish") == 1)

    val m2 = rows(1)
    // kills=0: headshot_ratio guard divides by greatest(kills, 1)
    assert(m2.getAs[Double]("headshot_ratio") == 0.0)
    assert(m2.getAs[Int]("top10_finish") == 0)
  }

  test("null guard drops rows with missing performance") {
    import spark.implicits._
    val broken =
      """{"player": {"player_name": "P", "account_id": "a", "shard_id": "s",
        |"total_matches_count": 1, "match_ids": ["x"], "data_collected_at": "t"},
        |"matches": [{"match_id": "x", "game_mode": "solo", "map_name": "E",
        |"duration": 1, "is_custom_match": false, "created_at": "t",
        |"player_performance": {"assists": 1}}]}""".stripMargin.replaceAll("\n", "")
    val flat = Ingest.validPerformance(
      Ingest.flattenMatches(Ingest.parseEnvelope(Seq(broken).toDF("value"))))
    assert(flat.count() == 0)
  }

  test("dead-letter split keeps malformed messages with their raw payload") {
    import spark.implicits._
    val raw = Seq(
      envelope,                      // good
      """{"truncated": """,          // invalid JSON → null envelope
      """{"foo": 1, "bar": "x"}""",  // valid JSON, wrong shape → both fields null
      envelope.replace("TestPlayer", "SecondPlayer")) // good
      .toDF("value")
    val (good, bad) = Ingest.parseWithDeadLetter(raw)
    assert(good.count() == 2)
    assert(Ingest.flattenMatches(good).count() == 4) // still flattens downstream
    val badRows = bad.as[String].collect()
    assert(badRows.length == 2)
    assert(badRows.exists(_.startsWith("""{"truncated""")))
    assert(badRows.exists(_.contains("\"foo\""))) // raw payload preserved verbatim
  }

  test("schema pruning: projecting two fields only parses those") {
    import spark.implicits._
    val raw = Seq(envelope).toDF("value")
    val pruned = Ingest.parseEnvelope(raw).select(col("player.account_id"))
    assert(pruned.collect().map(_.getString(0)).toSeq == Seq("acc-1"))
  }
}
