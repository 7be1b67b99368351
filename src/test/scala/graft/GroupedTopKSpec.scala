package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TopK
import graft.operators.Ranking

/** Bounded-state per-group top-k ([[TopK]] / [[Ranking.groupedTopK]]):
  * must equal the window row_number form exactly (same ranks, same
  * tie-breaks), while the plan aggregates map-side with no Window and
  * no full-input sort.
  */
class GroupedTopKSpec extends SparkSpec {
  import spark.implicits._

  // skewed: group g0 holds half the rows; scores collide heavily so
  // the id tie-break is exercised everywhere
  private lazy val docs = (1L to 2000L).map { i =>
    val g = if (i % 2 == 0) "g0" else s"g${i % 11}"
    (i, g, (i * 2654435761L) % 50)
  }.toDF("id", "g", "score").repartition(8)

  private def windowForm(k: Int) = docs
    .withColumn("rk", row_number().over(
      Window.partitionBy("g").orderBy(col("score").desc, col("id"))).cast("long"))
    .where(col("rk") <= k)
    .select("g", "rk", "id", "score")

  test("groupedTopK equals the window row_number form, ties included") {
    for (k <- Seq(1, 3, 7)) {
      val viaAgg = Ranking.groupedTopK(docs, Seq("g"), "score", "id", k)
      assert(rows(viaAgg) === rows(windowForm(k)), s"k=$k")
    }
  }

  test("groups smaller than k emit their whole population, ranked") {
    val tiny = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 5L))
      .toDF("g", "id", "score")
    val out = Ranking.groupedTopK(tiny, Seq("g"), "score", "id", 5)
    assert(rows(out) === Set(
      Seq("a", 1L, 2L, 20L), Seq("a", 2L, 1L, 10L), Seq("b", 1L, 3L, 5L)))
  }

  test("NULL scores and ids never rank") {
    val withNulls = Seq(
      ("a", java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L)),
      ("a", java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]),
      ("a", null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(99L))
    ).toDF("g", "id", "score")
    val out = Ranking.groupedTopK(withNulls, Seq("g"), "score", "id", 3)
    assert(rows(out) === Set(Seq("a", 1L, 1L, 10L)))
  }

  test("non-integral score/id columns are rejected, not silently cast") {
    val frac = Seq(("a", 1L, 1.9), ("a", 2L, 1.1)).toDF("g", "id", "score")
    val e1 = intercept[IllegalArgumentException] {
      Ranking.groupedTopK(frac, Seq("g"), "score", "id", 1)
    }
    assert(e1.getMessage.contains("integral"), e1.getMessage)
    val strs = Seq(("a", "x", 3L)).toDF("g", "id", "score")
    val e2 = intercept[IllegalArgumentException] {
      Ranking.groupedTopK(strs, Seq("g"), "score", "id", 1)
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
    // int (not just long) stays accepted — widening is lossless
    val ints = Seq(("a", 1, 7), ("a", 2, 9)).toDF("g", "id", "score")
    val out = Ranking.groupedTopK(ints, Seq("g"), "score", "id", 1)
    assert(rows(out) === Set(Seq("a", 1L, 2L, 9L)))
  }

  test("plan: map-side partial aggregate, no Window, no full-input sort") {
    val out = Ranking.groupedTopK(docs, Seq("g"), "score", "id", 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("Sort "), plan.take(3000))
    // typed Aggregator → ObjectHashAggregate, partial + final
    assert(plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(plan.contains("partial_topk") || plan.contains("partial_TopK")
      || "(?i)partial".r.findFirstIn(plan).isDefined, plan.take(3000))
  }

  test("TopK reduce/merge equal sort-take-k on adversarial streams") {
    val agg = new TopK(4)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 50) {
      val xs = Vector.fill(rnd.nextInt(30))(
        (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong))
      // split into random partitions, reduce each, merge in random order
      val parts = xs.grouped(math.max(1, 1 + rnd.nextInt(5))).toVector
      val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(buffers)
        .foldLeft(agg.zero)(agg.merge)
      val expect = xs.distinct.sortBy { case (s, i) => (-s, i) }.take(4)
      // duplicates: the aggregator keeps duplicate pairs as distinct
      // entries the way row_number does, so compare against the
      // multiset sort, not distinct
      val expectMulti = xs.sortBy { case (s, i) => (-s, i) }.take(4)
      assert(agg.finish(merged) === expectMulti, s"trial $trial xs=$xs")
      assert(expect.forall(merged.contains) || expectMulti != expect)
    }
  }
}
