package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  test("clickEdges: consecutive events per key in (ts, tie) order; first event drops") {
    val ev = Seq(
      // user 1 visits 10 → 20 → 30; the tie at 00:01 breaks on event_id
      (1L, ts(0), 100L, 10L),
      (1L, ts(1), 102L, 30L),
      (1L, ts(1), 101L, 20L),
      // user 2 has a single event → no edge
      (2L, ts(0), 200L, 99L)
    ).toDF("user_id", "ts", "event_id", "page")
    val edges = Graph.clickEdges(ev, "user_id", "ts", "event_id", "page")
      .orderBy("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.toSeq === Seq((10L, 20L), (20L, 30L)))
  }

  test("clickEdges: a NULL page is not a node — edges in and out of it drop") {
    val ev = Seq(
      (1L, ts(0), 100L, java.lang.Long.valueOf(10L)),
      (1L, ts(1), 101L, null.asInstanceOf[java.lang.Long]), // unparseable page
      (1L, ts(2), 102L, java.lang.Long.valueOf(20L))
    ).toDF("user_id", "ts", "event_id", "page")
    val edges = Graph.clickEdges(ev, "user_id", "ts", "event_id", "page")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // (10,NULL) and (NULL,20) both drop; no NULL node reaches pageRank
    assert(edges.toSeq === Seq.empty)
  }

  test("pageRank: hand-computed integer ranks on a star graph, mass accounting") {
    // 2→1, 3→1, 4→1, 1→2; N=4, init=2.5e11, base=(15·init)//100
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L)).toDF("src", "dst")
    val r1 = Graph.pageRank(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 === Map(
      1L -> 675000000000L,  // base + 85%·(3·init)
      2L -> 250000000000L,  // base + 85%·init
      3L -> 37500000000L,   // no inbound → base only
      4L -> 37500000000L))
    val r2 = Graph.pageRank(edges, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(
      1L -> 313750000000L,  // base + 85%·(r2+r3+r4 of iter 1)
      2L -> 611250000000L,  // base + 85%·(r1 of iter 1)
      3L -> 37500000000L,
      4L -> 37500000000L))
  }

  test("pageRank: deterministic under repartitioning (integer sums are order-free)") {
    val edges = (0L until 200L).map(i => (i % 23L, (i * 7L) % 19L)).toDF("src", "dst")
    val a = Graph.pageRank(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(edges.repartition(13), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("pageRank: empty edges yield an empty result, not a throw") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.pageRank(empty, iterations = 3).count() === 0)
    assert(Graph.clickEdges(
      Seq.empty[(Long, Timestamp, Long, Long)].toDF("user_id", "ts", "event_id", "page"),
      "user_id", "ts", "event_id", "page").count() === 0)
  }

  test("pageRank: arity guards") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(edges, iterations = 0))
    intercept[IllegalArgumentException](Graph.pageRank(edges, iterations = 5, dampPct = 101))
  }

  test("triangleCounts: K4 counts, direction/multiplicity/loops ignored, pendants absent") {
    // K4 on {1,2,3,4} with messy input: reversed duplicates, a
    // multi-edge, a self-loop, and a pendant node 5
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (3L, 4L), (4L, 4L), (4L, 5L)
    ).toDF("src", "dst")
    val out = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4: each vertex lies in C(3,2)=3 triangles; the pendant in none
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // triangle total: Σ per-node / 3 = 4 triangles in K4
    assert(out.values.sum === 12L)
    // a triangle-free graph (path) yields an empty result
    assert(Graph.triangleCounts(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")).isEmpty)
  }

  test("labelPropagation: hand-computed rounds, component isolation, messy input") {
    def run(edges: Seq[(Long, Long)], iters: Int) =
      Graph.labelPropagation(edges.toDF("src", "dst"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle round by round: r1 votes (1→2, 2→1, 3→1), r2 pulls
    // everyone to 1, r3 stays — converged to the min label
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(run(tri, 1) === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(run(tri, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // disjoint components never exchange labels; direction,
    // multiplicity and self-loops are ignored
    val two = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (12L, 10L))
    assert(run(two, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // empty graph: empty result, no throw
    assert(Graph.labelPropagation(
      Seq.empty[(Long, Long)].toDF("src", "dst"), 3).isEmpty)
    intercept[IllegalArgumentException](
      Graph.labelPropagation(two.toDF("src", "dst"), 0))
  }

  test("personalizedPageRank: hand-computed restart flow, zero for unreached, isolated seed") {
    val S = 1000000000000L
    def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
        iters: Int): Map[Long, Long] =
      Graph.personalizedPageRank(edges.toDF("src", "dst"),
          seeds.toDF("p"), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // 1 -> 2 with seed {1}: after one round seed holds its base
    // 0.15·S and node 2 receives 0.85·S; the next round decays the
    // received mass to 0.85·0.15·S (node 2 keeps no base)
    val out1 = run(Seq((1L, 2L)), Seq(1L), 1)
    assert(out1(1L) === (15L * S / 100))
    assert(out1(2L) === (85L * S / 100))
    val out2 = run(Seq((1L, 2L)), Seq(1L), 2)
    assert(out2(1L) === (15L * S / 100))
    assert(out2(2L) === 85L * (15L * S / 100) / 100)
    // a node with no path from the seeds holds rank 0 (3 -> 4 is a
    // separate component); an isolated seed keeps its restart base
    val out3 = run(Seq((1L, 2L), (3L, 4L)), Seq(1L, 99L), 2)
    assert(out3(3L) === 0L && out3(4L) === 0L)
    assert(out3(99L) === (15L * (S / 2) / 100))
    // two seeds split the restart mass
    assert(out3(1L) === (15L * (S / 2) / 100))
    intercept[IllegalArgumentException](
      Graph.personalizedPageRank(Seq((1L, 2L)).toDF("src", "dst"),
        Seq(1L).toDF("p"), 0))
  }

  test("bfsDistances: hand-computed hops, direction respected, depth cap, isolated seed") {
    def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
        maxDepth: Int): Map[Long, Long] =
      Graph.bfsDistances(edges.toDF("src", "dst"),
          seeds.toDF("p"), maxDepth)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // chain 1→2→3→4 plus a shortcut 1→3: BFS takes the shortcut
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))
    assert(run(chain, Seq(1L), 6) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // DIRECTED: from 4 nothing is reachable
    assert(run(chain, Seq(4L), 6) === Map(4L -> 0L))
    // depth cap truncates the walk
    assert(run(chain, Seq(1L), 1) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
    assert(run(chain, Seq(1L), 0) === Map(1L -> 0L))
    // multi-source takes the MIN over seeds; cycles terminate
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cyc, Seq(1L, 3L), 6) === Map(1L -> 0L, 2L -> 1L, 3L -> 0L))
    // a seed absent from the graph still reports distance 0
    assert(run(chain, Seq(99L), 6) === Map(99L -> 0L))
    // empty seeds / empty edges: empty and seed-only results
    assert(Graph.bfsDistances(chain.toDF("src", "dst"),
      Seq.empty[Long].toDF("p"), 6).isEmpty)
    assert(run(Seq.empty, Seq(7L), 6) === Map(7L -> 0L))
    intercept[IllegalArgumentException](
      Graph.bfsDistances(chain.toDF("src", "dst"), Seq(1L).toDF("p"), 65))
  }
}
