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
  * Exactness: the running sum is DECIMAL(18,2) (the catalog's standard
  * oracle-parity discipline) so it is associative and
  * order-independent — merging batches in any order, or merging vs
  * recomputing from scratch, is bit-identical (property-proven in
  * IncrementalAggSpec). The stat schema is closed under [[merge]]
  * (same names, same types out as in), so refresh composes
  * indefinitely: partials → merge → merge → … never widens a type.
  *
  * NULL discipline matches SQL aggregates: `cnt` counts non-NULL
  * values only; an all-NULL (or value-less) group carries NULL
  * sum/min/max and cnt=0, and [[finalize]] yields NULL avg for it.
  */
object Incremental {

  private val statNames = Seq("cnt", "sum_v", "min_v", "max_v")

  /** One stat row per group over raw facts: (groupCols..., cnt BIGINT,
    * sum_v DECIMAL(18,2), min_v, max_v). This is both the bootstrap
    * of the stored table and the per-batch reduction inside
    * [[mergeBatch]]. */
  def partials(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      count(col(valueCol)).as("cnt"),
      // cast back to (18,2): Spark widens a decimal sum to (28,2), and
      // the stat schema must be CLOSED so refresh composes forever
      sum(col(valueCol).cast(DecimalType(18, 2)))
        .cast(DecimalType(18, 2)).as("sum_v"),
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
      sum(col("sum_v")).cast(DecimalType(18, 2)).as("sum_v"),
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
}
