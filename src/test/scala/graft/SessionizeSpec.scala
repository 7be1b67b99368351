package graft

import java.sql.Timestamp
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("events split into sessions when the gap exceeds the timeout") {
    val events = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:10:00")), // 10 min gap → same session
      (3L, 7L, ts("2024-01-01 11:00:00")), // 50 min gap → new session
      (4L, 8L, ts("2024-01-01 10:00:00"))  // other user → own session 0
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.assign(events, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .select("event_id", "session_id")
    assert(rows(out) === Set(Seq(1L, 0L), Seq(2L, 0L), Seq(3L, 1L), Seq(4L, 0L)))
  }

  test("a gap of exactly the timeout does NOT start a new session (strict >)") {
    val events = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.assign(events, "user_id", "ts", "event_id", gapSeconds = 1800L)
    assert(rows(out.select("session_id")) === Set(Seq(0L)))
  }

  test("sessions() aggregates span and count per session") {
    val events = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:10:00")),
      (3L, 7L, ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.sessions(events, "user_id", "ts", "event_id", 1800L)
    assert(rows(out) === Set(
      Seq(7L, 0L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L),
      Seq(7L, 1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1L)))
  }
}
