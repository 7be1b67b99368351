package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared loop hygiene for iterative operators
  * ([[Dedup.connectedComponents]], [[Graph.pageRank]]): size the
  * LOOP's shuffle width to the working-set row count, not the session
  * default — each round is a handful of micro-stages over fixed-width
  * rows, and at small row counts full-width exchanges are hundreds of
  * near-empty tasks of pure scheduling latency. ~64k rows per
  * partition keeps a 100 TB working set at full session width while a
  * small one collapses to a few tasks. In the same latency-bound
  * regime AQE is disabled for the loop: its per-stage replanning adds
  * driver round-trips to every micro-job, and its job there
  * (coalescing tiny partitions) is what the width formula already
  * did. Full-width working sets keep session AQE (skew splitting
  * matters when one key concentrates the data).
  *
  * The conf is session-scoped, restored in a finally — which also
  * means the narrowed width is visible to any OTHER query planned on
  * this session while the loop runs: run concurrent workloads on
  * their own `spark.newSession()` (separate conf, same shared
  * cache/cluster), the standard isolation for session-conf tuning.
  * Build every loop cache INSIDE `body`, so its partitioning matches
  * the width the loop's exchanges will plan with.
  */
private[graft] object IterativeConf {

  /** Width for the PRE-loop actions (the edge/corpus counts that feed
    * [[withLoopShuffleWidth]]'s row count — a chicken-and-egg the row
    * form cannot cover): derived from the inputs' optimizer byte
    * estimates at ~64 MB per post-shuffle partition (AQE's advisory
    * target, the same formula as the commit paths'
    * narrowCommitJobConf). A 100 TB input estimates past the session
    * width and leaves the conf untouched — full width, AQE on; only
    * provably-small inputs run the count as a narrow static plan
    * instead of paying AQE's per-stage driver round-trips on a
    * KB-sized job. Unestimable plans contribute Long.MaxValue (never
    * narrow). */
  def withByteScaledWidth[T](spark: SparkSession,
      inputs: Seq[org.apache.spark.sql.DataFrame])(body: => T): T = {
    val est = inputs.foldLeft(BigInt(0)) { (acc, df) =>
      acc + (try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) })
    }
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    val origAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val perPart = BigInt(64L << 20)
    val target =
      if (est < 0) origParts.toInt
      else ((est + perPart - 1) / perPart).max(1)
        .min(BigInt(origParts.toInt)).toInt
    val narrow = target < origParts.toInt
    if (narrow) {
      spark.conf.set("spark.sql.shuffle.partitions", target.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    }
    try body
    finally {
      if (narrow) {
        spark.conf.set("spark.sql.shuffle.partitions", origParts)
        spark.conf.set("spark.sql.adaptive.enabled", origAqe)
      }
    }
  }

  def withLoopShuffleWidth[T](spark: SparkSession, rows: Long)(body: => T): T = {
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    val origAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val p = math.max(1L, math.min(origParts.toLong, (rows + 63999) / 64000)).toInt
    val latencyBound = p < origParts.toInt
    if (latencyBound) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    }
    try body
    finally {
      if (latencyBound) {
        spark.conf.set("spark.sql.shuffle.partitions", origParts)
        spark.conf.set("spark.sql.adaptive.enabled", origAqe)
      }
    }
  }
}
