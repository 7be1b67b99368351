package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of ALGEBRAIC aggregates — the "aggregate
  * refresh" operator of an append-only pipeline: the warehouse stores
  * one fixed-width stat row per group (count / sum / min / max), and
  * each arriving batch updates it WITHOUT rescanning the history.
  *
  * The reference recomputes its whole warehouse per DAG run (pandas
  * over the full extract, /root/reference/dags/Transform.py); that
  * shape is O(history) per refresh and dies at 100 TB. Decomposable
  * aggregates make refresh O(batch): aggregate the BATCH (map-side
  * combined, one narrow shuffle of the batch's partials), then reduce
  * stat-row pairs — `cnt+cnt`, `sum+sum`, `min(min)`, `max(max)` —
  * against the stored table's groups. Non-decomposable reads (avg)
  * derive at read time from the stored stats ([[finalize]]).
  *
  * Exactness: values quantize at DECIMAL(18,2) (the catalog's
  * standard oracle-parity discipline) and the running sum is carried
  * at DECIMAL(38,2), so it is associative and order-independent —
  * merging batches in any order, or merging vs recomputing from
  * scratch, is bit-identical (property-proven in IncrementalAggSpec).
  * The stat schema is closed under [[merge]] (same names, same types
  * out as in), so refresh composes indefinitely: partials → merge →
  * merge → … never widens a type, and the 38-digit accumulator can't
  * silently overflow to NULL before ~10^36.
  *
  * NULL discipline matches SQL aggregates: `cnt` counts non-NULL
  * values only; an all-NULL (or value-less) group carries NULL
  * sum/min/max and cnt=0, and [[finalize]] yields NULL avg for it.
  */
object Incremental {

  private val statNames = Seq("cnt", "sum_v", "min_v", "max_v")

  /** One stat row per group over raw facts: (groupCols..., cnt BIGINT,
    * sum_v DECIMAL(38,2), min_v, max_v). This is both the bootstrap
    * of the stored table and the per-batch reduction inside
    * [[mergeBatch]]. Values quantize at (18,2); the RUNNING sum is
    * carried at (38,2) — Spark's max precision, where `sum` no longer
    * widens (p+10 caps at 38), so the schema is CLOSED under
    * [[merge]] AND the accumulator cannot hit the silent
    * overflow→NULL a narrow running type would (a (18,2) running sum
    * nulls out past 10^16 with ANSI off; (38,2) needs 10^36). */
  def partials(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      count(col(valueCol)).as("cnt"),
      sum(col(valueCol).cast(DecimalType(18, 2)))
        .cast(DecimalType(38, 2)).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Merge two stat tables (stored + a batch's [[partials]]): the
    * pairwise reduction of decomposable state. Groups present on one
    * side only pass through unchanged (sum/min/max ignore the missing
    * side's NULL-free absence; cnt adds 0). Shuffles only stat rows —
    * |groups| fixed-width rows, never facts. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(statNames.forall(a.columns.contains) &&
      statNames.forall(b.columns.contains),
      s"both sides must carry stat columns $statNames")
    a.unionByName(b).groupBy(groupCols.map(col): _*).agg(
      // coalesce with a non-null literal restores count()'s
      // non-nullable type (sum() is nullable) — schema closure is a
      // spec'd invariant, and the branch never fires: every group in
      // the union has at least one non-null cnt
      coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
      sum(col("sum_v")).cast(DecimalType(38, 2)).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
  }

  /** One refresh round: fold a RAW batch into the stored stat table.
    * The history behind `stored` is never read — O(batch) work plus a
    * |groups|-row stat reduction. */
  def mergeBatch(stored: DataFrame, batch: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    merge(stored, partials(batch, groupCols, valueCol), groupCols)

  /** Read-time view: stable DOUBLE sum plus the derived average
    * (IEEE double division — deterministic cross-engine given the
    * exact DECIMAL sum and BIGINT count). NULL avg for cnt=0 groups. */
  def finalize(stats: DataFrame): DataFrame =
    stats
      .withColumn("sum_v", col("sum_v").cast("double"))
      .withColumn("avg_v",
        when(col("cnt") === 0, lit(null).cast("double"))
          .otherwise(col("sum_v") / col("cnt")))

  // ---- retractable stats off a lake change feed --------------------
  //
  // The four-stat table above is APPEND-ONLY incremental: min/max are
  // not retractable (removing the current extreme needs the runner-up,
  // i.e. full state). A consumer of Lake.changesBetween — which emits
  // deletes and BOTH update images — maintains the retractable subset
  // (count, sum, and avg derived from them) exactly: inserts and
  // update postimages add, deletes and update preimages subtract, and
  // a group retracted to nothing leaves the state. Same DECIMAL
  // discipline as partials/merge, so feed-maintained stats are
  // bit-identical to a from-scratch recompute of the target snapshot
  // (spec-proven; q115 puts the whole composition under the oracle).

  private val retractNames = Seq("rows_n", "cnt", "sum_v")

  /** Signed (rows_n, cnt, sum_v) stats of one change-feed batch
    * (`change_type` column as [[graft.sources.Lake.changesBetween]]
    * emits it). `rows_n` counts ROWS (group liveness survives all-NULL
    * values — a group lives exactly while the snapshot holds a row of
    * it); `cnt` counts non-NULL VALUES (the SQL aggregate). One pass,
    * map-side combinable. */
  def feedPartials(feed: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val w = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .when(col("change_type").isin("delete", "update_preimage"), -1L)
    val v = col(valueCol)
    feed.select((groupCols.map(col) :+
        w.as("__w") :+ v.cast(DecimalType(18, 2)).as("__v")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum(col("__w")), lit(0L)).as("rows_n"),
        coalesce(sum(when(col("__v").isNotNull, col("__w"))), lit(0L)).as("cnt"),
        sum(col("__v") * col("__w")).cast(DecimalType(38, 2)).as("sum_v"))
  }

  /** Fold a feed batch into the stored retractable stat table; groups
    * whose ROW count retracts to zero drop (state shrinks as data is
    * deleted — the same closure discipline as [[mergeDistinct]]). */
  def applyFeed(stored: DataFrame, feed: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    require(retractNames.forall(stored.columns.contains),
      s"stored side must carry retractable stat columns $retractNames")
    stored.unionByName(feedPartials(feed, groupCols, valueCol))
      .groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum(col("rows_n")), lit(0L)).as("rows_n"),
        coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
        sum(col("sum_v")).cast(DecimalType(38, 2)).as("sum_v"))
      .where(col("rows_n") =!= 0)
  }

  /** Bootstrap a COARSER retractable table from a finer one — partials
    * re-aggregate by summation (count/sum are decomposable), so MV2's
    * bootstrap reads |MV1 groups| rows, never the base facts. */
  def rollupPartials(mv: DataFrame, groupCols: Seq[String]): DataFrame = {
    require(retractNames.forall(mv.columns.contains),
      s"input must carry retractable stat columns $retractNames")
    mv.groupBy(groupCols.map(col): _*).agg(
      coalesce(sum(col("rows_n")), lit(0L)).as("rows_n"),
      coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
      sum(col("sum_v")).cast(DecimalType(38, 2)).as("sum_v"))
  }

  /** Second hop of an MV CHAIN (base → MV1 → MV2): fold the change
    * feed OF AN MV TABLE — rows that are themselves (rows_n, cnt,
    * sum_v) partials — into a coarser-grouped retractable table.
    * insert/update_postimage add the row's partials, delete/
    * update_preimage subtract them, so MV2 follows MV1 at O(MV1
    * changes) exactly as MV1 follows the base facts: at 100 TB a
    * commit's cost propagates down the chain as O(changed groups) per
    * hop, and no hop ever re-reads its upstream in full. Same closure
    * discipline: a coarse group whose row count retracts to zero
    * leaves the state. */
  def applyPartialFeed(stored: DataFrame, feed: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    require(retractNames.forall(stored.columns.contains),
      s"stored side must carry retractable stat columns $retractNames")
    require(retractNames.forall(feed.columns.contains),
      s"feed rows must carry retractable stat columns $retractNames " +
        "(a change feed of an MV table)")
    val w = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .when(col("change_type").isin("delete", "update_preimage"), -1L)
    val deltas = feed.select((groupCols.map(col) :+
        (col("rows_n") * w).as("rows_n") :+
        (col("cnt") * w).as("cnt") :+
        (col("sum_v") * w).cast(DecimalType(38, 2)).as("sum_v")): _*)
    stored.unionByName(deltas)
      .groupBy(groupCols.map(col): _*)
      .agg(
        coalesce(sum(col("rows_n")), lit(0L)).as("rows_n"),
        coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
        sum(col("sum_v")).cast(DecimalType(38, 2)).as("sum_v"))
      .where(col("rows_n") =!= 0)
  }

  /** Bootstrap of the retractable table from a full snapshot. */
  def retractablePartials(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("rows_n"),
      count(col(valueCol)).as("cnt"),
      sum(col(valueCol).cast(DecimalType(18, 2)))
        .cast(DecimalType(38, 2)).as("sum_v"))

  /** Read-time view of the retractable table: DOUBLE sum + derived
    * avg, same contract as [[finalize]]. A live group with only NULL
    * values reads cnt=0, NULL sum and avg — exactly what a recompute
    * over the snapshot would say. */
  def finalizeRetractable(stats: DataFrame): DataFrame =
    stats.drop("rows_n")
      // cnt=0 ⇒ no values ⇒ SQL says NULL sum, not the 0.00 the
      // retraction arithmetic leaves behind
      .withColumn("sum_v",
        when(col("cnt") === 0, lit(null).cast("double"))
          .otherwise(col("sum_v").cast("double")))
      .withColumn("avg_v",
        when(col("cnt") === 0, lit(null).cast("double"))
          .otherwise(col("sum_v") / col("cnt")))

  // ---- exact incremental count(DISTINCT key) -----------------------
  //
  // count(DISTINCT) is NOT decomposable over the four-stat table above
  // — two batches may share keys, so their distinct counts don't add.
  // The classic incremental-view-maintenance answer is a SUPPORTING
  // multiset: one (group, key, dup_cnt) row per distinct pair. That
  // state is O(distinct pairs), not O(1) per group — the price of
  // exactness (the HLL sketch in q90 is the bounded-state alternative
  // when the pair space outgrows the cluster) — but it shuffles on
  // (group, key) so it parallelizes like any aggregate, refresh never
  // rescans facts, and dup_cnt keeps the state closed under
  // RETRACTION: deleting one of two sightings of a key must not drop
  // it from the distinct set, and a pair retracted to zero leaves the
  // state entirely (state shrinks back as data is deleted).

  /** Per-(group, key) sighting counts of a batch. `weight` = -1 turns
    * a delete batch into retractions. NULL keys are ignored, matching
    * `count(DISTINCT)`. */
  def distinctPartials(df: DataFrame, groupCols: Seq[String], keyCol: String,
      weight: Int = 1): DataFrame =
    df.where(col(keyCol).isNotNull)
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg((count(lit(1)) * weight).as("dup_cnt"))

  /** Fold batch partials into the stored multiset. Pairs summing to
    * zero are dropped — full retraction frees their state. Output is
    * again a valid multiset (closed under [[mergeDistinct]]). */
  def mergeDistinct(stored: DataFrame, batch: DataFrame,
      groupCols: Seq[String], keyCol: String): DataFrame = {
    require(stored.columns.contains("dup_cnt") && batch.columns.contains("dup_cnt"),
      "both sides must be distinct-multiset tables (dup_cnt)")
    stored.unionByName(batch)
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(sum(col("dup_cnt")).as("dup_cnt"))
      .where(col("dup_cnt") =!= 0)
  }

  /** STORED-TABLE form of [[mergeDistinct]]: fold batch partials into
    * a persisted multiset via a full-outer join on (group, key)
    * instead of union+re-aggregate. Same result (proven in
    * BucketingSpec), different plan: the union form re-shuffles BOTH
    * sides into the aggregate, while the join form lets a stored side
    * bucketed on (group..., key) meet the join's partitioning
    * requirement straight off its scan — so a refresh of a 100 TB
    * index shuffles only the batch's partials (plan-gated in
    * BucketingSpec). Keys present on one side pass through; pairs
    * summing to zero drop (full retraction frees their state). */
  def mergeDistinctStored(stored: DataFrame, batch: DataFrame,
      groupCols: Seq[String], keyCol: String): DataFrame = {
    require(stored.columns.contains("dup_cnt") && batch.columns.contains("dup_cnt"),
      "both sides must be distinct-multiset tables (dup_cnt)")
    val keys = groupCols :+ keyCol
    stored.withColumnRenamed("dup_cnt", "__s_cnt")
      .join(batch.withColumnRenamed("dup_cnt", "__b_cnt"), keys, "full_outer")
      .select(keys.map(col) :+
        (coalesce(col("__s_cnt"), lit(0L)) + coalesce(col("__b_cnt"), lit(0L)))
          .as("dup_cnt"): _*)
      .where(col("dup_cnt") =!= 0)
  }

  /** Read-time view: the exact distinct count per group — live pairs
    * are unique per (group, key), so this is a plain count. */
  def finalizeDistinct(state: DataFrame, groupCols: Seq[String],
      outCol: String): DataFrame =
    state.where(col("dup_cnt") > 0)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(outCol))
}
