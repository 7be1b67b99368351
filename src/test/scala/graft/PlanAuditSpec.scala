package graft

import graft.ExplainCheck.{PlanStats, audit, byDesignBnlj, readExpectations}

/** The plan audit as a failing gate: every catalog query executes at
  * sf0.001 and its physical-plan shape is asserted against the
  * checked-in expectation file (`Test/runMain graft.ExplainCheck
  * -write` regenerates it). Two invariants:
  *
  *  - no BroadcastNestedLoopJoin outside the documented by-design set
  *    (an accidental cartesian is the single most expensive plan bug a
  *    query can ship at 100 TB);
  *  - the exchange count must not exceed the recorded expectation (a
  *    new Exchange means a shuffle crept into a plan that used to
  *    reuse or avoid one);
  *  - the ReusedExchange count must not drop below the recorded
  *    expectation (losing a reuse silently doubles a scan/explode —
  *    the q66 failure mode: two canonically-different copies of the
  *    same (id, term) aggregate each exploding the corpus);
  *  - the `Exchange SinglePartition` count must not exceed the
  *    recorded expectation (a new single-reducer funnel — benign only
  *    for fixed-width global-aggregate finals, which the recorded
  *    counts already include).
  *
  * Fewer exchanges / more reuse than recorded passes (improvements
  * land freely) — rerun `-write` to tighten the file.
  */
class PlanAuditSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"
  private lazy val expected: Map[String, PlanStats] = readExpectations()

  test("expectation file covers the catalog") {
    assert(expected.nonEmpty,
      s"missing ${ExplainCheck.expectationPath} — run `Test/runMain graft.ExplainCheck -write`")
    val missing = SparkEntry.queries.keySet -- expected.keySet
    assert(missing.isEmpty,
      s"queries without recorded plan expectations (run ExplainCheck -write): ${missing.toSeq.sorted.mkString(", ")}")
    val stale = expected.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"expectation entries for queries no longer in the catalog: ${stale.toSeq.sorted.mkString(", ")}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plan shape") {
      val s = audit(spark, d, fn)
      if (!byDesignBnlj(name))
        assert(s.bnlj === 0,
          s"$name grew a BroadcastNestedLoopJoin — cartesian/unconstrained join regression")
      expected.get(name).foreach { e =>
        assert(s.exchanges <= e.exchanges,
          s"$name exchange-count regression: ${s.exchanges} > recorded ${e.exchanges} " +
            "(a shuffle crept in; if intentional, rerun ExplainCheck -write)")
        assert(s.reused >= e.reused,
          s"$name lost a ReusedExchange: ${s.reused} < recorded ${e.reused} " +
            "(a shared subtree stopped canonicalizing; a scan/explode now runs twice)")
        assert(s.singleParts <= e.singleParts,
          s"$name grew an Exchange SinglePartition: ${s.singleParts} > recorded " +
            s"${e.singleParts} (a new single-reducer funnel — the one shuffle shape " +
            "that cannot scale out; if it is a fixed-width global aggregate, " +
            "rerun ExplainCheck -write)")
      }
    }
  }
}
