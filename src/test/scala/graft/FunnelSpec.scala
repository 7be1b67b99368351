package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Retrieval, TextAnalysis}

/** Funnel / time-decay / importance-sample / RRF semantics on
  * hand-built fixtures, plus the plan property that makes the funnel
  * formulation worth having: ONE exchange for the whole multi-step
  * computation.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val steps = Seq("view", "click", "purchase")

  test("funnel: in-order user completes all steps at the earliest qualifying times") {
    val ev = Seq(
      (1L, ts(1), 10L, "view"), (1L, ts(2), 11L, "click"),
      (1L, ts(3), 12L, "purchase"), (1L, ts(4), 13L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_id", "event_type", steps)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Timestamp]("ts_step1") === ts(1))
    assert(r.getAs[Timestamp]("ts_step2") === ts(2))
    assert(r.getAs[Timestamp]("ts_step3") === ts(3))
    assert(r.getAs[Long]("steps_reached") === 3L)
  }

  test("funnel: a step before its predecessor does not count") {
    // click precedes the first view: no qualifying click, so the later
    // purchase cannot qualify either — order matters, not presence
    val ev = Seq(
      (2L, ts(1), 20L, "click"), (2L, ts(2), 21L, "view"),
      (2L, ts(3), 22L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Funnel.funnel(ev, "user_id", "ts", "event_id", "event_type", steps)
      .collect().head
    assert(r.getAs[Timestamp]("ts_step1") === ts(2))
    assert(r.getAs[Timestamp]("ts_step2") === null)
    assert(r.getAs[Timestamp]("ts_step3") === null)
    assert(r.getAs[Long]("steps_reached") === 1L)
  }

  test("funnel: a mid-chain gap blocks later steps (purchase before click)") {
    val ev = Seq(
      (3L, ts(1), 30L, "view"), (3L, ts(2), 31L, "purchase"),
      (3L, ts(3), 32L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Funnel.funnel(ev, "user_id", "ts", "event_id", "event_type", steps)
      .collect().head
    assert(r.getAs[Long]("steps_reached") === 2L)
    assert(r.getAs[Timestamp]("ts_step2") === ts(3))
    assert(r.getAs[Timestamp]("ts_step3") === null)
  }

  test("funnel: equal timestamps break by the tie column (earlier row qualifies)") {
    // view and click share ts(1); view has the lower event_id, so it is
    // the earlier ROW and the click qualifies
    val ev = Seq(
      (4L, ts(1), 40L, "view"), (4L, ts(1), 41L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Funnel.funnel(ev, "user_id", "ts", "event_id", "event_type", steps)
      .collect().head
    assert(r.getAs[Long]("steps_reached") === 2L)
    // reversed tie order: click is the earlier row → it cannot qualify
    val ev2 = Seq(
      (4L, ts(1), 41L, "view"), (4L, ts(1), 40L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r2 = Funnel.funnel(ev2, "user_id", "ts", "event_id", "event_type", steps)
      .collect().head
    assert(r2.getAs[Long]("steps_reached") === 1L)
  }

  test("funnel plans ONE exchange: all step windows + the final aggregate share it") {
    val ev = (0 until 200).map(i =>
      (i.toLong % 7, ts(i % 50), i.toLong, steps(i % 3)))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.funnel(ev, "user_id", "ts", "event_id", "event_type", steps)
    val plan = ExplainCheck.finalPlanLines(out)
    assert(plan.count(_.contains("Exchange")) === 1,
      s"funnel should shuffle exactly once, plan:\n${plan.mkString("\n")}")
  }

  test("timeDecayScore: exact power-of-two decay, clamped beyond maxAgeDays") {
    val ev = Seq(
      // newest event date = 2024-02-01 → ages 0, 1, 14, clamp(45→14)
      (1L, Timestamp.valueOf("2024-02-01 10:00:00"), 10.00),
      (1L, Timestamp.valueOf("2024-01-31 09:00:00"), 8.00),
      (2L, Timestamp.valueOf("2024-01-18 00:00:00"), 16384.00),
      (2L, Timestamp.valueOf("2023-12-18 00:00:00"), 16384.00))
      .toDF("user_id", "ts", "value")
    val out = Funnel.timeDecayScore(ev, "user_id", "ts", "value")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_value"))).toMap
    // user 1: 10·2^0 + 8·2^-1 = 14.0 exactly
    assert(out(1L) === ((2L, 14.0)))
    // user 2: both at the 14-day clamp → 16384/16384 twice = 2.0 exactly
    assert(out(2L) === ((2L, 2.0)))
  }

  test("timeDecayScore is order-independent: same result under repartition") {
    val ev = (0 until 300).map(i =>
      (i.toLong % 5, Timestamp.valueOf(f"2024-01-${1 + i % 28}%02d 03:00:00"),
        (i % 97) / 7.0)).toDF("user_id", "ts", "value")
    val a = rows(Funnel.timeDecayScore(ev, "user_id", "ts", "value"))
    val b = rows(Funnel.timeDecayScore(ev.repartition(7), "user_id", "ts", "value"))
    assert(a === b)
  }

  test("importanceSample: deterministic, clamped p, u uniform in [0,1)") {
    val docs = (0 until 400).map(i => (i.toLong, "x" * (i % 600)))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    def run() = TextAnalysis.importanceSample(docs, "doc_id",
      col("n_chars").cast("double") / 400.0)
    val out = run()
    assert(rows(out) === rows(run()), "sampling must be reproducible")
    assert(out.where(col("p") > 1.0).count() === 0)
    assert(out.where(col("u") < 0.0 || col("u") >= 1.0).count() === 0)
    assert(out.where(col("u") >= col("p")).count() === 0)
    // longer docs keep more often: the n_chars>=400 cohort is all-kept
    val full = out.where(col("p") === 1.0).count()
    assert(full === docs.where(length(col("text")) >= 400).count())
  }

  test("rrfFuse: fixed-order fused score, absent list contributes zero") {
    val lex = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1L), (30L, 2L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
      "doc_id", "rank", k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    assert(out(20L) === 1.0 / 62.0 + 1.0 / 61.0) // both lists
    assert(out(10L) === 1.0 / 61.0)              // lex only
    assert(out(30L) === 1.0 / 62.0)              // sem only
    // 20 fused first: present in both lists
    val first = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
      "doc_id", "rank", k = 1).collect().head.getAs[Long]("doc_id")
    assert(first === 20L)
  }

  test("topPaths: per-key windows, NULL breaks, keys never mix, deterministic ties") {
    // user 1: a b c d  → paths "a->b->c", "b->c->d"
    // user 2: a b c    → "a->b->c" (so it counts 2)
    // user 3: a NULL c d e → NULL breaks: only "c->d->e"
    val ev = Seq(
      (1L, ts(1), 1L, Some("a")), (1L, ts(2), 2L, Some("b")),
      (1L, ts(3), 3L, Some("c")), (1L, ts(4), 4L, Some("d")),
      (2L, ts(1), 5L, Some("a")), (2L, ts(2), 6L, Some("b")),
      (2L, ts(3), 7L, Some("c")),
      (3L, ts(1), 8L, Some("a")), (3L, ts(2), 9L, None),
      (3L, ts(3), 10L, Some("c")), (3L, ts(4), 11L, Some("d")),
      (3L, ts(5), 12L, Some("e"))
    ).toDF("k", "t", "tie", "step")
    val out = Funnel.topPaths(ev, "k", "t", "tie", "step", len = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.head === ("a -> b -> c", 2L))
    // remaining singletons tie on n=1 → lexicographic path order
    assert(out.toSeq.drop(1) ===
      Seq("b -> c -> d" -> 1L, "c -> d -> e" -> 1L))
    // k caps the result; a user's last len-1 events start no path, and
    // two users' streams never concatenate (user 2 ends at c, user 3
    // starts at a — no "b -> c -> a" path exists)
    assert(Funnel.topPaths(ev, "k", "t", "tie", "step", len = 3, k = 1)
      .count() === 1L)
    assert(!out.map(_._1).contains("b -> c -> a"))
    intercept[IllegalArgumentException](
      Funnel.topPaths(ev, "k", "t", "tie", "step", len = 1))
  }
}
