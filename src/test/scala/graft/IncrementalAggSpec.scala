package graft

import org.apache.spark.sql.functions._
import graft.operators.Incremental

/** Incremental aggregate maintenance ([[Incremental]]): folding
  * batches into the stored stat table must be bit-identical to
  * recomputing from scratch, in any batch order, with a stat schema
  * closed under merge so refresh composes indefinitely.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def facts(ids: Range) = ids.map { i =>
    val v: java.lang.Double =
      if (i % 13 == 0) null else (i * 37 % 1000) / 100.0 - 3.0
    (i.toLong, s"t${i % 5}", v)
  }.toDF("id", "g", "v").repartition(6)

  private lazy val all = facts(1 to 900)

  test("merge of split partials equals the from-scratch recompute") {
    val scratch = Incremental.partials(all, Seq("g"), "v")
    for (cut <- Seq(1, 450, 899)) {
      val merged = Incremental.mergeBatch(
        Incremental.partials(all.where(col("id") <= cut), Seq("g"), "v"),
        all.where(col("id") > cut), Seq("g"), "v")
      assert(rows(merged) === rows(scratch), s"cut=$cut")
      assert(merged.schema === scratch.schema, s"cut=$cut schema drift")
    }
  }

  test("multi-batch fold composes: ((p1+b2)+b3)+b4 == scratch") {
    val folded = (2 to 4).foldLeft(
      Incremental.partials(all.where(col("id") % 4 === 1), Seq("g"), "v")) {
      (stored, k) =>
        Incremental.mergeBatch(stored, all.where(col("id") % 4 === k % 4),
          Seq("g"), "v")
    }
    assert(rows(folded) === rows(Incremental.partials(all, Seq("g"), "v")))
    assert(folded.schema === Incremental.partials(all, Seq("g"), "v").schema)
  }

  test("all-NULL groups: cnt=0, NULL stats, NULL finalized avg") {
    val df = Seq(
      (1L, "a", java.lang.Double.valueOf(2.0)),
      (2L, "b", null.asInstanceOf[java.lang.Double]),
      (3L, "b", null.asInstanceOf[java.lang.Double])
    ).toDF("id", "g", "v")
    val fin = Incremental.finalize(Incremental.partials(df, Seq("g"), "v"))
    val byG = fin.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(byG("b") === Seq(0L, null, null, null, null))
    assert(byG("a") === Seq(1L, 2.0, 2.0, 2.0, 2.0))
  }

  test("empty batch leaves the stored table unchanged") {
    val stored = Incremental.partials(all, Seq("g"), "v")
    val refreshed = Incremental.mergeBatch(stored, all.where(lit(false)),
      Seq("g"), "v")
    assert(rows(refreshed) === rows(stored))
    assert(refreshed.schema === stored.schema)
  }

  test("batch-only groups appear; stored-only groups persist") {
    val stored = Incremental.partials(
      Seq((1L, "old", 5.0)).toDF("id", "g", "v"), Seq("g"), "v")
    val out = Incremental.mergeBatch(stored,
      Seq((2L, "new", 7.0)).toDF("id", "g", "v"), Seq("g"), "v")
    val byG = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("old" -> 1L, "new" -> 1L))
  }

  test("incremental distinct: fold equals recompute at any split") {
    val scratch = Incremental.finalizeDistinct(
      Incremental.distinctPartials(all, Seq("g"), "v"), Seq("g"), "nd")
    for (cut <- Seq(1, 450, 899)) {
      val folded = Incremental.finalizeDistinct(
        Incremental.mergeDistinct(
          Incremental.distinctPartials(all.where(col("id") <= cut), Seq("g"), "v"),
          Incremental.distinctPartials(all.where(col("id") > cut), Seq("g"), "v"),
          Seq("g"), "v"),
        Seq("g"), "nd")
      assert(rows(folded) === rows(scratch), s"cut=$cut")
    }
  }

  test("incremental distinct: retraction keeps shared keys, frees fully-retracted pairs") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 2.0),
      (4L, "b", 5.0)
    ).toDF("id", "g", "v")
    val state = Incremental.distinctPartials(df, Seq("g"), "v")
    // delete ONE of the two (a, 1.0) sightings and the only (b, 5.0)
    val deletes = Seq((1L, "a", 1.0), (4L, "b", 5.0)).toDF("id", "g", "v")
    val after = Incremental.mergeDistinct(state,
      Incremental.distinctPartials(deletes, Seq("g"), "v", weight = -1),
      Seq("g"), "v")
    // (a, 1.0) survives (dup_cnt 2-1=1); (b, 5.0) is gone — including
    // from the STATE, not just the count
    assert(after.where(col("g") === "b").count() === 0)
    val nd = Incremental.finalizeDistinct(after, Seq("g"), "nd")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nd === Map("a" -> 2L))
  }

  test("incremental distinct: NULL keys ignored like count(DISTINCT)") {
    val df = Seq(
      (1L, "a", java.lang.Double.valueOf(1.0)),
      (2L, "a", null.asInstanceOf[java.lang.Double])
    ).toDF("id", "g", "v")
    val nd = Incremental.finalizeDistinct(
      Incremental.distinctPartials(df, Seq("g"), "v"), Seq("g"), "nd")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nd === Map("a" -> 1L))
  }

  test("MV chain: rollup bootstrap + partial-feed fold equals the coarse recompute") {
    import graft.operators.Incremental
    // base rows over (fine = (g, h), coarse = g); values with NULLs
    val base = Seq(
      ("a", 1L, Some(10.0)), ("a", 1L, Some(20.0)), ("a", 2L, None),
      ("b", 1L, Some(5.0)), ("b", 2L, Some(7.0)), ("c", 1L, Some(1.0))
    ).toDF("g", "h", "v")
    val fine = Seq("g", "h")
    val mv1 = Incremental.retractablePartials(base, fine, "v")
    val mv2 = Incremental.rollupPartials(mv1, Seq("g"))
    // bootstrap correctness: rollup == direct coarse partials
    assert(rows(mv2) === rows(Incremental.retractablePartials(base, Seq("g"), "v")))
    // a batch that updates (a,1), deletes ALL of c, inserts (d,9):
    // expressed as MV1's own change feed (both images for the update)
    val pre = mv1.where(col("g") === "a" && col("h") === 1L)
      .withColumn("change_type", lit("update_preimage"))
    val post = Incremental.retractablePartials(
        Seq(("a", 1L, Some(10.0)), ("a", 1L, Some(99.0))).toDF("g", "h", "v"),
        fine, "v")
      .withColumn("change_type", lit("update_postimage"))
    val del = mv1.where(col("g") === "c")
      .withColumn("change_type", lit("delete"))
    val ins = Incremental.retractablePartials(
        Seq(("d", 1L, Some(9.0))).toDF("g", "h", "v"), fine, "v")
      .withColumn("change_type", lit("insert"))
    val feed = pre.unionByName(post).unionByName(del).unionByName(ins)
    val folded = Incremental.applyPartialFeed(mv2, feed, Seq("g"))
    // the equivalent post-change base, recomputed coarse from scratch
    val newBase = Seq(
      ("a", 1L, Some(10.0)), ("a", 1L, Some(99.0)), ("a", 2L, None),
      ("b", 1L, Some(5.0)), ("b", 2L, Some(7.0)), ("d", 1L, Some(9.0))
    ).toDF("g", "h", "v")
    assert(rows(Incremental.finalizeRetractable(folded)) ===
      rows(Incremental.finalizeRetractable(
        Incremental.retractablePartials(newBase, Seq("g"), "v"))))
    // the fully-retracted coarse group left the state entirely
    assert(folded.where(col("g") === "c").isEmpty)
    // guards: a non-partial feed is refused
    intercept[IllegalArgumentException] {
      Incremental.applyPartialFeed(mv2,
        base.withColumn("change_type", lit("insert")), Seq("g"))
    }
  }

  test("refresh shuffles stat rows, not history: stored parquet scan is narrow") {
    val dir = java.nio.file.Files.createTempDirectory("incragg").toString
    Incremental.partials(all, Seq("g"), "v").write.parquet(s"$dir/stats")
    val stored = spark.read.parquet(s"$dir/stats")
    val out = Incremental.mergeBatch(stored, facts(901 to 1000), Seq("g"), "v")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the stored side enters the union as stat rows — no value/id
    // columns are ever read from it
    assert(plan.contains("ReadSchema: struct<g:string,cnt:bigint,sum_v:decimal(38,2)"),
      plan.take(3000))
  }
}
