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

  test("temporalJoin: containing interval attaches; delete gaps and pre-history are NULL") {
    // SCD2 history of key 1: value 10 on [1, 5), deleted at 5, value 20
    // open from 8 — built through Cdc.history so the gap is real
    val log = Seq((1L, 1L, 10L, false), (1L, 5L, 0L, true), (1L, 8L, 20L, false))
      .toDF("k", "v", "dim_value", "is_delete")
    val hist = graft.operators.Cdc.history(log, Seq("k"), "v", "is_delete")
    val facts = Seq((100L, 1L, 0L), (101L, 1L, 3L), (102L, 1L, 6L),
      (103L, 1L, 9L), (104L, 2L, 3L)).toDF("fid", "k", "t")
    val out = AsOf.temporalJoin(facts, hist, "k", "k", "t", Seq("dim_value"))
    assert(out.columns.toSeq === Seq("fid", "k", "t", "dim_value", "valid_from"))
    assert(rows(out.select("fid", "dim_value", "valid_from")) === Set(
      Seq(100L, null, null), // before the first version
      Seq(101L, 10L, 1L),    // inside [1, 5)
      Seq(102L, null, null), // the delete gap [5, 8)
      Seq(103L, 20L, 8L),    // the open interval
      Seq(104L, null, null)))// key with no history
  }
}
