package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: execute every catalog query at sf0.001 and
  * summarize the physical plan — exchange count, exchange reuse, and
  * nested-loop joins. Run with `Test/runMain graft.ExplainCheck
  * [queryName ...]`; pass names to also dump those plan skeletons.
  *
  * `-write` regenerates the checked-in expectation file that
  * [[PlanAuditSpec]] asserts against, so a plan regression (extra
  * exchange, lost ReusedExchange, accidental cartesian) fails
  * `sbt test` instead of waiting for a human to re-read the audit.
  *
  * Expected nested-loops: q07 (an intentional cross join) and q54 (the
  * documented all-pairs small-N baseline). Anything else showing a
  * BroadcastNestedLoopJoin is a plan regression.
  */
object ExplainCheck {

  /** Physical-plan shape counters for one executed query.
    * `singleParts` counts `Exchange SinglePartition` nodes — the
    * single-reducer funnels. Some are benign (a global aggregate's
    * final pass receives one fixed-width partial row per map task; a
    * broadcast build of a one-row stats table), so the gate is
    * no-regression against the recorded count rather than zero: what
    * must never happen silently is a NEW full-data single-reducer
    * step (the `Window.orderBy`-without-partition failure mode that
    * Ranking exists to avoid). */
  final case class PlanStats(exchanges: Int, reused: Int, bnlj: Int, singleParts: Int)

  /** Queries where a BroadcastNestedLoopJoin is the intended physical
    * op: q07 (intentional cross join), q54 (the all-pairs small-N
    * baseline), q50/q51 (brute-force top-k IS a corpus ×
    * broadcast-query-set scoring pass), q57 (corpus × broadcast
    * codebook assignment, same rationale). */
  val byDesignBnlj: Set[String] = Set("q07_cross_join", "q54_cosine_neardup",
    "q50_cosine_topk", "q51_knn_label_vote", "q57_ivf_ann",
    // the stored-codebook probe: same bounded corpus×codebook /
    // query×codebook broadcast shape as q57 (the codebook is k rows
    // by construction — never a cartesian risk)
    "q110_stored_ivf_ann",
    // PQ encode/LUT: the two BNLJs are corpus×codebook and
    // query×codebook broadcasts of an m·|labels|-row codebook —
    // bounded model state, the q57 shape per subspace
    "q119_pq_ann", "q120_stored_pq_ann",
    // broadcast-query scoring over quantized codes: same bounded
    // |corpus|×|Q| shape as q50 (the BNLJ side is the broadcast
    // query set, never corpus×corpus)
    "q69_quantized_topk",
    // corpus × broadcast BENCHMARK scoring (eval suites are bounded;
    // the corpus streams map-side, q50's shape)
    "q143_embedding_decontam",
    // ONE-ROW broadcast scalar joins (corpus size N / avgdl stats /
    // min-stratum target / total token count): a cross join against a
    // single aggregated row is the standard way to attach a global
    // scalar without a shuffle — cost |corpus|×1, not a cartesian risk
    "q65_tfidf", "q66_bm25", "q68_stratified_rebalance", "q77_unigram_nll",
    "q84_bigram_nll", "q105_incremental_df",
    // hybrid retrieval embeds bm25 (one-row stats cross join) and the
    // q50 brute-force scorer (corpus × broadcast single query vector);
    // the stored-df variant keeps both shapes (df served from the
    // index removes the df aggregate, not the scalar joins)
    "q82_hybrid_rrf", "q130_stored_df_hybrid",
    // one-row broadcast reference date (newest event) for the decay age
    "q83_time_decay",
    // the recall gates run q50 + q57 + q119 + q69 verbatim to score
    // them — they inherit exactly their whitelisted bounded-broadcast
    // BNLJs (corpus × 8-query set / × k-row codebooks), nothing new
    // (q153 is q148 over the clustered fixture)
    "q148_ann_recall", "q153_ann_clustered_recall")

  val expectationPath = "src/test/resources/plan-expectations.txt"

  /** The df's own finalized AQE plan, truncated to the Final Plan
    * section. `df.collect()` (NOT `df.count()` — count spawns a
    * SEPARATE query execution, leaving this df's AdaptiveSparkPlan at
    * isFinalPlan=false where stage-reuse markers never appear)
    * materializes every stage of THIS plan, after which the string
    * carries both a Final and an Initial section; counting must stop
    * at the Initial header or every node double-counts. */
  def finalPlanLines(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .linesIterator.takeWhile(!_.contains("== Initial Plan ==")).toSeq
  }

  /** Execute one catalog query (finalizing AQE so ReusedExchange
    * markers appear) and count the plan shapes. */
  def audit(spark: SparkSession, dir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): PlanStats = {
    val plan = finalPlanLines(fn(spark, dir))
    PlanStats(
      exchanges = plan.count(_.contains("Exchange")),
      reused = plan.count(_.contains("ReusedExchange")),
      bnlj = plan.count(_.contains("BroadcastNestedLoop")),
      singleParts = plan.count(_.contains("Exchange SinglePartition")))
  }

  /** Parse the expectation file: `name exchanges reused bnlj single`
    * per line. */
  def readExpectations(): Map[String, PlanStats] = {
    val p = java.nio.file.Paths.get(expectationPath)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else java.nio.file.Files.readAllLines(p).toArray(Array.empty[String])
      .iterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(n, e, r, b, sp) = l.split("\\s+")
        n -> PlanStats(e.toInt, r.toInt, b.toInt, sp.toInt)
      }.toMap
  }

  def main(args: Array[String]): Unit = {
    // -noBroadcast disables auto-broadcast to preview the at-scale
    // (sort-merge) plan shape, where identical shuffles must show up
    // as ReusedExchange instead of re-evaluated subtrees.
    val noBroadcast = args.contains("-noBroadcast")
    val write = args.contains("-write")
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
      // the harness session config: SQL INSERT/DML on lake catalog
      // tables (q145/q146) route through the graft rules
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    if (noBroadcast) builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
    if (args.contains("-noAqe")) builder.config("spark.sql.adaptive.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val dump = args.filterNot(_.startsWith("-")).toSet
    val out = new StringBuilder
    out ++= "# Generated by `Test/runMain graft.ExplainCheck -write` (default\n"
    out ++= "# broadcast+AQE config, sf0.001). PlanAuditSpec fails any query\n"
    out ++= "# whose exchange / single-partition-exchange count regresses or\n"
    out ++= "# that grows a non-whitelisted BroadcastNestedLoopJoin.\n"
    out ++= "# Columns: name exchanges reused bnlj singlePartition\n"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val s = audit(spark, d, fn)
      val flag = if (s.bnlj > 0 && !byDesignBnlj(name)) " <-- NESTED LOOP" else ""
      println(s"== $name: exchanges=${s.exchanges} reused=${s.reused} " +
        s"nestedloop=${s.bnlj} single=${s.singleParts}$flag")
      out ++= s"$name ${s.exchanges} ${s.reused} ${s.bnlj} ${s.singleParts}\n"
      if (dump(name)) {
        finalPlanLines(fn(spark, d)).filter(l =>
          l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate") ||
          l.contains("Window") || l.contains("Scan") || l.contains("Filter"))
          .foreach(l => println("PLAN| " + l.take(160)))
      }
    }
    if (write && !noBroadcast && !args.contains("-noAqe")) {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(expectationPath), out.toString)
      println(s"wrote $expectationPath")
    } else if (write) {
      println("-write ignored under -noBroadcast/-noAqe: expectations are " +
        "recorded for the default config only")
    }
    spark.stop()
  }
}
