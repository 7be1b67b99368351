package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid time-series shaping over an event stream — the two
  * classic event-analytics reshapes the reference's hourly star schema
  * (/root/reference/dags/sql/date.sql — an hour-grain calendar dim)
  * gestures at but never computes:
  *
  *  - [[gapFillHourly]]: dense hourly resample — every key × hour in
  *    the key's active span gets a row, absent hours count 0. Plots,
  *    rate alerts and window models all need the zeros a sparse
  *    groupBy never emits.
  *  - [[cohortRetention]]: the first-seen cohort × weeks-since
  *    activity matrix (the standard retention triangle).
  *
  * Both are plain shuffle-on-key aggregations: at 100 TB nothing here
  * collects, broadcasts unbounded state, or windows over a single
  * reducer; the gap-fill grid is bounded by Σ per-key active-span
  * hours (not global span × keys — each key explodes only its own
  * [lo, hi]).
  */
object Timeseries {

  /** Dense per-key hourly counts: one row per (key, hour) for every
    * hour in the key's own [min, max] activity span, zeros filled.
    *
    * Shape: counts aggregate once on (key, hour); spans reduce THE
    * COUNTS (already one row per key-hour, never the raw events); the
    * grid explodes each key's span map-side off the tiny span table;
    * one final (key, hour) join fills the zeros. The explode is the
    * only row-amplifying step and its output is exactly the result
    * size, so the operator's cost is the answer's size — nothing
    * quadratic, nothing global.
    * @return (keyCol, hour_start, n); row order is unspecified —
    *         callers sort if they need one */
  def gapFillHourly(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // a NULL-timestamped event has no place on the grid; excluding it
    // here (not downstream) keeps every later stage total — a key
    // with ONLY null timestamps has no span and vanishes entirely
    val counts = events
      .where(col(tsCol).isNotNull)
      .select(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_start"))
      .groupBy(col(keyCol), col("hour_start"))
      .agg(count(lit(1)).as("n"))
    val grid = counts
      .groupBy(col(keyCol))
      .agg(min(col("hour_start")).as("__lo"), max(col("hour_start")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 hour")))
          .as("hour_start"))
    grid.join(counts, Seq(keyCol, "hour_start"), "left")
      .select(col(keyCol), col("hour_start"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Retention triangle: users grouped by first-seen date (cohort),
    * activity bucketed into whole weeks since that date, distinct
    * actives counted per (cohort, week).
    *
    * Shape: first-seen is a key-partitioned min; the events⋈cohorts
    * join shuffles on the key (both sides hash-partition — the cohort
    * table is one row per key, not broadcast by construction: at
    * corpus scale it approaches key cardinality); the final aggregate
    * is a count(DISTINCT key) per (cohort, week) — decomposable into
    * the standard two-level expand, no hot reducer. week_n uses
    * integer floor division over datediff, so both engines bucket
    * identically (non-negative by construction).
    * @return (cohort_date, week_n, n_users); row order is unspecified
    *         — callers sort if they need one */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    // same NULL-timestamp exclusion as the grid: an undatable event is
    // neither a cohort anchor nor activity (otherwise it would emit a
    // phantom NULL-week cell for an otherwise-valid cohort)
    val ev = events.where(col(tsCol).isNotNull)
      .select(col(keyCol), to_date(col(tsCol)).as("__dt"))
    val first = ev.groupBy(col(keyCol)).agg(min(col("__dt")).as("cohort_date"))
    ev.join(first, Seq(keyCol))
      .select(col(keyCol), col("cohort_date"),
        floor(datediff(col("__dt"), col("cohort_date")) / 7).cast("int").as("week_n"))
      .groupBy(col("cohort_date"), col("week_n"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }
}
