package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: execute every catalog query at sf0.001 and
  * summarize the physical plan — exchange count, exchange reuse, and
  * nested-loop joins. Run with `Test/runMain graft.ExplainCheck
  * [queryName ...]`; pass names to also dump those plan skeletons.
  *
  * Expected nested-loops: q07 (an intentional cross join) and q54 (the
  * documented all-pairs small-N baseline). Anything else showing a
  * BroadcastNestedLoopJoin is a plan regression.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    // -noBroadcast disables auto-broadcast to preview the at-scale
    // (sort-merge) plan shape, where identical shuffles must show up
    // as ReusedExchange instead of re-evaluated subtrees.
    val noBroadcast = args.contains("-noBroadcast")
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (noBroadcast) builder.config("spark.sql.autoBroadcastJoinThreshold", "-1")
    if (args.contains("-noAqe")) builder.config("spark.sql.adaptive.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val dump = args.filterNot(_.startsWith("-")).toSet
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, d)
      df.count() // finalize AQE so ReusedExchange markers appear
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoop"))
      // Expected nested loops: q07 (intentional cross join), q54 (the
      // all-pairs small-N baseline), q50/q51 (brute-force top-k IS a
      // corpus × broadcast-query-set scoring pass — the nested loop
      // over a bounded broadcast side is the intended physical op),
      // q57 (corpus × broadcast codebook assignment, same rationale).
      val byDesign = Set("q07_cross_join", "q54_cosine_neardup",
        "q50_cosine_topk", "q51_knn_label_vote", "q57_ivf_ann")
      val flag = if (bnlj > 0 && !byDesign(name)) " <-- NESTED LOOP" else ""
      println(s"== $name: exchanges=$exchanges reused=$reused nestedloop=$bnlj$flag")
      if (dump(name)) plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate") ||
        l.contains("Window") || l.contains("Scan")).foreach(l => println("PLAN| " + l.take(160)))
    }
    spark.stop()
  }
}
