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

/** Misra–Gries heavy-hitter CANDIDATE sketch as a typed Aggregator:
  * at most `k` counters per buffer, mergeable with the standard
  * summed-then-rebased merge, so Spark's partial/final aggregation IS
  * the distributed sketch — each partition builds a local summary and
  * the final reduce merges them, state bounded by k everywhere.
  *
  * Guarantee (Misra–Gries + mergeable-summaries): any item with true
  * frequency > N/(k+1) survives to the merged sketch. The counter
  * VALUES are lower-bound estimates (decrements eat exact mass) and
  * which sub-threshold items linger depends on merge order — so the
  * sketch emits candidate KEYS only, and callers re-count candidates
  * exactly ([[graft.operators.TextAnalysis.heavyNgrams]]); the
  * recount makes the final answer exact and deterministic even though
  * the intermediate sketch is neither. */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, s"k must be >= 1, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b
    else b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < k => b.updated(a, 1L)
      // full + miss: the classic decrement-all (the incoming item
      // cancels against one unit of every counter); amortized O(1) —
      // each decrement event removes k+1 units of total mass
      case None => b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val s = y.foldLeft(x) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (s.size <= k) s
    else {
      // rebase by the (k+1)-th largest count: ≤ k survivors, and the
      // N/(k+1) error bound adds across merges (mergeable summaries)
      val d = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      s.collect { case (t, c) if c > d => t -> (c - d) }
    }
  }

  /** Sorted for a deterministic ARRAY layout; the candidate SET is
    * still merge-order-dependent — exact only after the recount. */
  def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
