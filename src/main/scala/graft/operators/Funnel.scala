package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event stream: multi-step funnel
  * progression and time-decayed engagement scoring — the
  * behavioral-feature operators a training-data pipeline runs over
  * interaction logs (user-quality weighting, engagement-based corpus
  * selection). The reference stops at flat scans of its articles table
  * (/root/reference/dags/Main.py:23); these generalize its event
  * semantics to ordered, per-key analysis.
  *
  * Scale design: both operators are ONE shuffle on the key. The funnel
  * is the textbook case where the naive formulation (one self-join per
  * step) shuffles the fact table `steps` times; the chained-window
  * formulation here shuffles it once.
  */
object Funnel {

  /** Multi-step funnel: for each key, the earliest time each step was
    * reached, where step `i` counts only if it occurs STRICTLY AFTER
    * (in (ts, tie) order) some qualifying occurrence of step `i-1`.
    *
    * Plan shape (sized for 100 TB):
    *  - one Exchange on `keyCol` + one Sort on (ts, tie) serve ALL
    *    step windows: each step's qualifying timestamp is a running
    *    `min` over the frame `rows unbounded preceding .. 1 preceding`
    *    of the previous step's column, so Spark plans N Window nodes
    *    over a single exchange+sort (the windows share partitioning
    *    and ordering — no re-sort between them);
    *  - the final per-key `groupBy` reuses the window's hash
    *    partitioning — no second exchange;
    *  - compare the join formulation: `steps-1` shuffles of the fact
    *    table plus one aggregate each. At 100 TB the difference is the
    *    whole job.
    *
    * Determinism: the frame is row-based over the total order
    * (ts, tie), so equal timestamps are broken by `tieCol` and the
    * result is identical under any partitioning. "Strictly after"
    * means an earlier ROW, mirroring the oracle's identical frame.
    *
    * @param steps ordered event-type names, e.g. view → click →
    *   purchase; output has `ts_step1..N` plus `steps_reached` (the
    *   chain implies non-null columns form a prefix). */
  def funnel(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, s"duplicate step types: $steps")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val qualified = steps.zipWithIndex.foldLeft(df) { case (acc, (st, i)) =>
      val qual =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st &&
          min(col(s"__q${i - 1}")).over(before).isNotNull
      acc.withColumn(s"__q$i", when(qual, col(tsCol)))
    }
    val stepAggs =
      steps.indices.map(i => min(col(s"__q$i")).as(s"ts_step${i + 1}"))
    val reached = steps.indices
      .map(i => when(col(s"ts_step${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    qualified
      .groupBy(col(keyCol))
      .agg(stepAggs.head, stepAggs.tail: _*)
      .withColumn("steps_reached", reached)
  }

  /** Exponential time-decayed value sum per key: each event contributes
    * `value · 2^(-min(age_days, maxAgeDays))`, age measured in whole
    * days back from the newest event date in the input (one-row
    * aggregate, broadcast in — the bm25-stats pattern).
    *
    * Cross-engine float policy: NO double arithmetic until the final
    * division. `value` is fixed to cents (`round(value·100)` → LONG),
    * the decay weight `2^(maxAgeDays - age)` is an exact integer
    * (age clamped to `maxAgeDays`, so the exponent is in
    * [0, maxAgeDays]), and the per-key sum is integer — exact and
    * order-independent under any partitioning. The score is ONE
    * double division by the constant `100 · 2^maxAgeDays` at the end:
    * bit-identical across engines. The clamp is the semantics, not a
    * hack: beyond `maxAgeDays` half-lives the contribution is below
    * any feature-relevant resolution, and real pipelines floor the
    * decay exactly so old events stay monotonically comparable. */
  def timeDecayScore(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      maxAgeDays: Int = 14): DataFrame = {
    // cents·2^maxAge must stay far inside LONG: 50 halvings is already
    // 1e15 headroom below overflow for any realistic per-key sum
    require(maxAgeDays >= 0 && maxAgeDays <= 50,
      s"maxAgeDays must be in [0, 50], got $maxAgeDays")
    val ref = df.agg(max(to_date(col(tsCol))).as("__ref"))
    val age = least(datediff(col("__ref"), to_date(col(tsCol))), lit(maxAgeDays))
    val cents = round(col(valueCol) * 100).cast("long")
    // 2^k via pow: exact for k <= 50 (double is exact to 2^53)
    val weight = pow(lit(2.0), (lit(maxAgeDays) - age).cast("double")).cast("long")
    df.crossJoin(broadcast(ref))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents * weight).cast("double") /
          lit(100.0 * (1L << maxAgeDays))).as("decayed_value"))
  }

  /** Top-k most-frequent k-step event PATHS: every window of `len`
    * consecutive steps per key, counted corpus-wide — the exploratory
    * twin of [[funnel]] (which checks ONE given pattern, this
    * ENUMERATES what users actually do; the Sankey/flow-analysis
    * feed). NULL steps break a window (a path must be `len` real
    * steps in a row).
    *
    * Shape: the `len-1` leads ride ONE window shuffle on the key
    * (same partitioning for all of them — one Exchange, one sort),
    * the count is a partial-aggregatable group-by on the path string,
    * and the top-k lands as TakeOrderedAndProject (per-partition
    * heads + driver merge of k rows, never a global sort). Ties break
    * to the lexicographically smallest path so the result is
    * deterministic and oracle-exact.
    * @return (path, n) — `sep`-joined steps, top k by (n DESC, path) */
  def topPaths(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      stepCol: String, len: Int = 3, k: Int = 20,
      sep: String = " -> "): DataFrame = {
    require(len >= 2 && len <= 8, s"path length must be in [2, 8], got $len")
    require(k >= 1, s"k must be positive, got $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val steps = col(stepCol).cast("string").as("s0") +:
      (1 until len).map(i => lead(col(stepCol).cast("string"), i).over(w).as(s"s$i"))
    val windows = events.select(steps: _*)
    windows
      .where((0 until len).map(i => col(s"s$i").isNotNull).reduce(_ && _))
      .select(concat_ws(sep, (0 until len).map(i => col(s"s$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }
}
