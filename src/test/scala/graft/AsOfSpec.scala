package graft

import java.sql.Timestamp
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 100L, ts("2024-01-01 10:00:00")),
    (2L, 100L, ts("2024-01-01 12:00:00")),
    (3L, 100L, ts("2024-01-01 09:00:00")), // before any right row
    (4L, 200L, ts("2024-01-01 12:00:00"))  // key with no right rows
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (100L, ts("2024-01-01 09:30:00"), 11L),
    (100L, ts("2024-01-01 11:00:00"), 22L),
    (100L, ts("2024-01-01 12:00:00"), 33L) // equal-ts: counts as at-or-before
  ).toDF("k", "rts", "payload")

  test("as-of join picks the most recent right row at or before each left ts") {
    val out = AsOf.join(left, right, "user_id", "k", "ts", "rts", Seq("payload"))
      .select("event_id", "payload")
    assert(rows(out) === Set(
      Seq(1L, 11L),   // 10:00 → 09:30 row
      Seq(2L, 33L),   // 12:00 → equal-ts 12:00 row wins over 11:00
      Seq(3L, null),  // nothing at or before 09:00
      Seq(4L, null))) // no right rows for key 200
  }

  test("left row count and columns are preserved") {
    val out = AsOf.join(left, right, "user_id", "k", "ts", "rts", Seq("payload"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "payload"))
  }
}
