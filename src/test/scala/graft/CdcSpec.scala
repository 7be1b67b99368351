package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** CDC snapshot maintenance ([[Cdc.applyChanges]]): MERGE semantics
  * (last writer per key wins, winning delete removes the key,
  * untouched rows pass through), composition across batches, and the
  * no-base-shuffle plan shape.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10L, 1.0),
    (2L, "a", 11L, 2.0),
    (3L, "b", 12L, 3.0)
  ).toDF("k", "t", "ver", "v")

  private def chg(rows: (Long, String, Long, Double, Boolean)*) =
    rows.toDF("k", "t", "ver", "v", "del")

  test("upsert replaces, insert appends, delete removes, rest untouched") {
    val out = Cdc.applyChanges(base,
      chg((2L, "a", 20L, 9.0, false),   // update key (2,a)
          (4L, "b", 21L, 4.0, false),   // brand-new key
          (3L, "b", 22L, 0.0, true)),   // retract key (3,b)
      Seq("k", "t"), "ver", "del")
    assert(out.columns.toSeq === base.columns.toSeq)
    assert(rows(out) === Set(
      Seq(1L, "a", 10L, 1.0),
      Seq(2L, "a", 20L, 9.0),
      Seq(4L, "b", 21L, 4.0)))
  }

  test("last change per key wins, including delete-then-reinsert") {
    val out = Cdc.applyChanges(base,
      chg((2L, "a", 20L, 8.0, false),
          (2L, "a", 23L, 9.5, false),   // later update supersedes
          (1L, "a", 21L, 0.0, true),
          (1L, "a", 24L, 7.0, false)),  // reinsert after delete
      Seq("k", "t"), "ver", "del")
    assert(rows(out) === Set(
      Seq(1L, "a", 24L, 7.0),
      Seq(2L, "a", 23L, 9.5),
      Seq(3L, "b", 12L, 3.0)))
  }

  test("delete of an absent key is a no-op; empty batch is identity") {
    val out = Cdc.applyChanges(base,
      chg((9L, "z", 30L, 0.0, true)), Seq("k", "t"), "ver", "del")
    assert(rows(out) === rows(base))
    val idOut = Cdc.applyChanges(base, chg().where(lit(false)),
      Seq("k", "t"), "ver", "del")
    assert(rows(idOut) === rows(base))
  }

  test("two sequential applies equal one apply of the concatenated log") {
    val b1 = chg((2L, "a", 20L, 5.0, false), (4L, "a", 21L, 6.0, false))
    val b2 = chg((4L, "a", 22L, 0.0, true), (5L, "b", 23L, 7.0, false))
    val twoStep = Cdc.applyChanges(
      Cdc.applyChanges(base, b1, Seq("k", "t"), "ver", "del"),
      b2, Seq("k", "t"), "ver", "del")
    val oneShot = Cdc.applyChanges(base, b1.unionByName(b2),
      Seq("k", "t"), "ver", "del")
    assert(rows(twoStep) === rows(oneShot))
    assert(twoStep.schema === oneShot.schema)
  }

  test("plan: base side never shuffles — batch aggregates, key set broadcasts") {
    val bigBase = spark.range(0, 10000)
      .select(col("id").as("k"), lit("a").as("t"), col("id").as("ver"),
        (col("id") * 0.5).as("v"))
    val out = Cdc.applyChanges(bigBase,
      chg((7L, "a", 99999L, 1.5, false)), Seq("k", "t"), "ver", "del")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftanti"), plan.take(2000))
    // the only shuffle exchanges belong to the batch's HashAggregate
    // reduction — the base reaches the anti-join unexchanged
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
    assert(exchanges <= 2, s"base must not shuffle:\n${plan.take(3000)}")
    assert(plan.contains("max_by") || plan.contains("MaxBy"), plan.take(2000))
  }

  test("history: intervals chain per key, deletes close and vanish") {
    val log = chg(
      (1L, "a", 10L, 1.0, false),
      (1L, "a", 20L, 2.0, false),
      (1L, "a", 30L, 0.0, true),   // delete closes version 20
      (2L, "a", 15L, 5.0, false))  // still live
    val h = Cdc.history(log, Seq("k", "t"), "ver", "del")
      .select("k", "t", "ver", "v", "valid_from", "valid_to", "is_current")
    assert(rows(h) === Set(
      Seq(1L, "a", 10L, 1.0, 10L, 20L, false),
      Seq(1L, "a", 20L, 2.0, 20L, 30L, false),
      Seq(2L, "a", 15L, 5.0, 15L, null, true)))
  }

  test("history current rows equal applying the full log to an empty base") {
    val log = chg(
      (1L, "a", 10L, 1.0, false), (1L, "a", 20L, 2.0, false),
      (2L, "a", 11L, 3.0, false), (2L, "a", 21L, 0.0, true),
      (3L, "b", 12L, 4.0, false), (3L, "b", 22L, 0.0, true),
      (3L, "b", 25L, 6.0, false))
    val current = Cdc.history(log, Seq("k", "t"), "ver", "del")
      .where(col("is_current")).select("k", "t", "ver", "v")
    val applied = Cdc.applyChanges(base.where(lit(false)), log,
      Seq("k", "t"), "ver", "del")
    assert(rows(current) === rows(applied))
  }

  test("NULL delete flag is an upsert, not a silent delete") {
    val out = Cdc.applyChanges(base,
      Seq((2L, "a", 20L, 9.0, null.asInstanceOf[java.lang.Boolean]))
        .toDF("k", "t", "ver", "v", "del"),
      Seq("k", "t"), "ver", "del")
    // without the coalesce, key (2,a) would vanish: removed by the
    // anti-join, dropped by the !delete filter
    assert(rows(out) === Set(
      Seq(1L, "a", 10L, 1.0),
      Seq(2L, "a", 20L, 9.0),
      Seq(3L, "b", 12L, 3.0)))
    val h = Cdc.history(
      Seq((1L, "a", 10L, 1.0, null.asInstanceOf[java.lang.Boolean]))
        .toDF("k", "t", "ver", "v", "del"),
      Seq("k", "t"), "ver", "del")
    assert(h.count() === 1 && h.where(col("is_current")).count() === 1)
  }

  test("guards: missing version / clashing delete column rejected") {
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base.drop("ver"),
        chg((1L, "a", 1L, 0.0, false)), Seq("k", "t"), "ver", "del")
    }
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base.withColumn("del", lit(false)),
        chg((1L, "a", 1L, 0.0, false)), Seq("k", "t"), "ver", "del")
    }
  }

  test("guardVersions: stale winner rejected, NULL stored version always overwritable") {
    // stale: batch winner (ver 5) older than stored ver 11 — stored row survives
    val stale = Cdc.applyChanges(base,
      chg((2L, "a", 5L, 99.0, false)),
      Seq("k", "t"), "ver", "del", guardVersions = true)
    assert(rows(stale) === rows(base))
    // a NULL-versioned base row predates versioning: the joined
    // __base_v value is NULL, so the isNull arm passes and ANY change
    // to that key wins (update and delete alike) — the change row is
    // NOT silently dropped
    val nullVerBase = Seq(
      (1L, "a", null.asInstanceOf[java.lang.Long], 1.0),
      (2L, "a", java.lang.Long.valueOf(11L), 2.0)
    ).toDF("k", "t", "ver", "v")
    val out = Cdc.applyChanges(nullVerBase,
      chg((1L, "a", 1L, 7.0, false)),
      Seq("k", "t"), "ver", "del", guardVersions = true)
    assert(rows(out) === Set(Seq(1L, "a", 1L, 7.0), Seq(2L, "a", 11L, 2.0)))
    val deleted = Cdc.applyChanges(nullVerBase,
      chg((1L, "a", 1L, 0.0, true)),
      Seq("k", "t"), "ver", "del", guardVersions = true)
    assert(rows(deleted) === Set(Seq(2L, "a", 11L, 2.0)))
    // the guard reserves __base_v; a colliding payload column is
    // rejected instead of silently mis-joined
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base.withColumn("__base_v", lit(0L)),
        chg((1L, "a", 1L, 0.0, false)).withColumn("__base_v", lit(0L)),
        Seq("k", "t"), "ver", "del", guardVersions = true)
    }
  }

  test("applyHistoryBatch ≡ full-log replay across every batch-boundary shape") {
    // key 1: spans both batches (open interval closes at v=10)
    // key 2: batch-1 history ends in a DELETE, batch 2 re-creates it
    // key 3: batch 1 only (untouched carry-through)
    // key 4: batch 2 only (fresh key)
    // key 5: batch 1 is a delete-with-no-predecessor (empty stored rows)
    val log = Seq(
      (1L, 1L, 10.0, false), (1L, 3L, 11.0, false), (1L, 10L, 12.0, false),
      (2L, 2L, 20.0, false), (2L, 4L, 0.0, true), (2L, 11L, 21.0, false),
      (3L, 5L, 30.0, false),
      (4L, 12L, 40.0, false),
      (5L, 6L, 0.0, true), (5L, 13L, 50.0, false)
    ).toDF("k", "v", "x", "is_delete")
    val cut = 9L
    val full = Cdc.history(log, Seq("k"), "v", "is_delete")
    val inc = Cdc.applyHistoryBatch(
      Cdc.history(log.where(col("v") <= cut), Seq("k"), "v", "is_delete"),
      log.where(col("v") > cut), Seq("k"), "v", "is_delete")
    assert(rows(inc) === rows(full))
    // and the fold is associative over a second batch boundary
    val inc2 = Cdc.applyHistoryBatch(
      Cdc.applyHistoryBatch(
        Cdc.history(log.where(col("v") <= 5L), Seq("k"), "v", "is_delete"),
        log.where(col("v") > 5L && col("v") <= cut), Seq("k"), "v", "is_delete"),
      log.where(col("v") > cut), Seq("k"), "v", "is_delete")
    assert(rows(inc2) === rows(full))
    // a batch violating the monotone-version contract (here: replaying
    // already-folded changes) is refused, not silently mis-spliced
    val bad = intercept[Exception] {
      Cdc.applyHistoryBatch(
        Cdc.history(log.where(col("v") <= cut), Seq("k"), "v", "is_delete"),
        log.where(col("v") <= cut), Seq("k"), "v", "is_delete").collect()
    }
    assert(bad.getMessage.contains("monotone") ||
      Option(bad.getCause).exists(_.getMessage.contains("monotone")))
  }
}
