package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY §2.10): the reference's
  * `value_counts().idxmax()` majority vote
  * (/root/reference/dags/Transform.py:27-29) as a single typed
  * aggregate, registered through `functions.udaf`.
  *
  * Scale note: the buffer is a counts map, so the aggregate stays
  * partial/final (map-side combine) like any built-in — the shuffle
  * carries one (group, counts) row per distinct group per partition,
  * bounded by the vote-domain cardinality, not the row count. The
  * untyped two-step (`groupBy().count()` + `max_by`) compiles to
  * codegen'd built-ins and remains the preferred hot-path form
  * (`graft.operators.Classify`); this is the typed alternative the
  * Dataset API promises.
  */
object MajorityVote extends Aggregator[String, Map[String, Long], String] {
  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  /** Deterministic tie-break: highest count, then smallest value —
    * the same total order every argmax in this repo uses (pandas
    * idxmax is positional; a distributed engine must pick a total
    * order and the oracle twin must agree). */
  def finish(b: Map[String, Long]): String =
    if (b.isEmpty) null else b.minBy { case (v, n) => (-n, v) }._1

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[String] = Encoders.STRING
}
