package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Journey

class JourneySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-$s")

  test("funnel enforces stage order per user") {
    val events = Seq(
      (1L, "view", ts("01 10:00:00")),
      (1L, "click", ts("01 10:05:00")),
      (1L, "purchase", ts("01 10:10:00")),
      (2L, "click", ts("02 09:00:00")), // out of order: before the view
      (2L, "view", ts("02 10:00:00")),
      (3L, "view", ts("03 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Journey.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("retention cohorts count distinct users per week offset") {
    val events = Seq(
      (1L, "signup", ts("01 10:00:00")), // Mon Jan 1 cohort
      (1L, "click", ts("03 10:00:00")),  // offset 0
      (1L, "click", ts("10 10:00:00")),  // offset 1
      (2L, "signup", ts("02 10:00:00")), // same cohort week
      (2L, "view", ts("16 10:00:00")),   // offset 2
      (3L, "view", ts("01 09:00:00")))   // never signs up → excluded
      .toDF("user_id", "event_type", "ts")
    val out = Journey.retention(events, "user_id", "event_type", "ts", "signup")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, // both signups are offset-0 active
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 2L) -> 1L))
  }

  test("scd2 closes each interval at the key's next event, ties on tieCol") {
    val events = Seq(
      (10L, 1L, "a", ts("01 10:00:00")),
      (11L, 1L, "b", ts("01 11:00:00")),
      (12L, 1L, "c", ts("01 11:00:00")), // same ts — event_id breaks the tie
      (20L, 2L, "x", ts("05 10:00:00")))
      .toDF("event_id", "user_id", "state", "ts")
    val df = Journey.scd2(events, "user_id", "ts", "event_id")
    val out = df.orderBy("event_id").collect()
    val vtIdx = df.schema.fieldIndex("valid_to")
    assert(out.map(_.getBoolean(df.schema.fieldIndex("is_current"))).toSeq ==
      Seq(false, false, true, true))
    val byId = out.map(r => r.getLong(0) -> Option(r.getTimestamp(vtIdx))).toMap
    assert(byId(10L).contains(ts("01 11:00:00")))
    assert(byId(11L).contains(ts("01 11:00:00"))) // closed by the tied row
    assert(byId(12L).isEmpty && byId(20L).isEmpty)
  }

  test("sessionize: gap > threshold opens a new session, boundary gap " +
      "does not, durations are exact seconds") {
    def t(s: String) = Timestamp.valueOf(s"2024-01-0$s")
    val ev = Seq(
      // user 1: 3 events 10 min apart, then a 2-hour gap, then 1 event
      (1L, t("1 09:00:00"), 1L), (1L, t("1 09:10:00"), 2L),
      (1L, t("1 09:20:00"), 3L), (1L, t("1 11:20:00"), 4L),
      // user 2: gap of EXACTLY the 1800s threshold → same session
      (2L, t("1 09:00:00"), 5L), (2L, t("1 09:30:00"), 6L))
      .toDF("user_id", "ts", "event_id")
    val out = Journey.sessionize(ev, "user_id", "ts", "event_id", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    assert(out((1L, 1L)) == ((3L, 1200L)))  // 3 events over 20 min
    assert(out((1L, 2L)) == ((1L, 0L)))     // the post-gap singleton
    assert(out((2L, 1L)) == ((2L, 1800L)))  // boundary gap stays inside
    assert(out.size == 3)
  }

  test("sessionize rejects a non-positive gap") {
    val ev = Seq((1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L))
      .toDF("user_id", "ts", "event_id")
    intercept[IllegalArgumentException] {
      Journey.sessionize(ev, "user_id", "ts", "event_id", 0L)
    }
  }

  test("markovAttribution: hand-derived absorption micros, removal " +
      "effects, post-conversion events ignored") {
    // u1 click→purchase; u2 click→(no conv); u3 view→purchase;
    // u4 purchase first (its later click must be ignored).
    val ev = Seq(
      (1L, ts("01 10:00:00"), 1L, "click"),
      (1L, ts("01 11:00:00"), 2L, "purchase"),
      (2L, ts("01 10:00:00"), 3L, "click"),
      (3L, ts("01 10:00:00"), 4L, "view"),
      (3L, ts("01 11:00:00"), 5L, "purchase"),
      (4L, ts("01 09:00:00"), 6L, "purchase"),
      (4L, ts("01 10:00:00"), 7L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    // tr: START→click 2, START→view 1, START→CONV 1;
    //     click→CONV 1, click→NULL 1; view→CONV 1
    // p(click)=500000, p(view)=1e6, p(START)=3e6/4=750000
    // removal(click): (0+1e6+1e6)/4 = 500000; removal(view): same
    val out = Journey.markovAttribution(ev, "user_id", "event_type",
        "ts", "event_id", "purchase", channels = Seq("click", "view"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("click") == ((750000L, 500000L, 250000L, 500000L)))
    assert(out("view") == ((750000L, 500000L, 250000L, 500000L)))
  }
}
