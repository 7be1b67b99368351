package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Timeseries

/** Regular-grid reshapes ([[Timeseries]]): dense hourly gap fill and
  * the cohort retention triangle, on closed-form fixtures. */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gapFillHourly: zeros fill each key's own span, spans don't leak across keys") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00")),
      (1L, ts("2024-01-01 10:45:00")), // same hour -> n = 2
      (1L, ts("2024-01-01 13:05:00")), // hours 11, 12 are gaps
      (2L, ts("2024-01-02 00:30:00"))  // single-hour span, no gaps
    ).toDF("user_id", "ts")
    val out = Timeseries.gapFillHourly(ev, "user_id", "ts")
      .orderBy("user_id", "hour_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, ts("2024-01-01 10:00:00"), 2L),
      (1L, ts("2024-01-01 11:00:00"), 0L),
      (1L, ts("2024-01-01 12:00:00"), 0L),
      (1L, ts("2024-01-01 13:00:00"), 1L),
      (2L, ts("2024-01-02 00:00:00"), 1L)))
  }

  test("gapFillHourly: result size equals the sum of per-key span hours") {
    val ev = Tables.eventsDf
    val out = Timeseries.gapFillHourly(ev, "user_id", "ts")
    val expected = ev
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .groupBy("user_id").agg(min("h").as("lo"), max("h").as("hi"))
      .select(((unix_timestamp(col("hi").cast("timestamp")) -
        unix_timestamp(col("lo").cast("timestamp"))) / 3600 + 1).cast("long").as("span"))
      .agg(sum("span")).collect().head.getLong(0)
    assert(out.count() === expected)
    // zeros only in the gaps: total events conserved
    assert(out.agg(sum("n")).collect().head.getLong(0) === ev.count())
  }

  private object Tables {
    lazy val eventsDf = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
  }

  test("cohortRetention: week buckets floor at day 7 boundaries, distinct users per cell") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00")), // cohort 2024-01-01, week 0
      (1L, ts("2024-01-07 23:00:00")), // day 6 -> still week 0
      (1L, ts("2024-01-08 00:00:00")), // day 7 -> week 1
      (1L, ts("2024-01-08 12:00:00")), // same cell, distinct-counted once
      (2L, ts("2024-01-01 10:00:00")), // same cohort as user 1, week 0
      (3L, ts("2024-01-03 10:00:00"))  // its own cohort
    ).toDF("user_id", "ts")
    val out = Timeseries.cohortRetention(ev, "user_id", "ts")
      .orderBy("cohort_date", "week_n")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L),
      ("2024-01-01", 1, 1L),
      ("2024-01-03", 0, 1L)))
  }
}
