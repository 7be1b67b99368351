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

/** Per-group top-k at BOUNDED state: a mergeable typed Aggregator
  * whose buffer is the k best (score, id) pairs seen so far, kept
  * sorted best-first under the repo's standard total order (score
  * desc, id asc — deterministic, and the order a DuckDB
  * `row_number() OVER (... ORDER BY score DESC, id)` twin agrees
  * with).
  *
  * This is the scale path for "top k rows per group": the idiomatic
  * window form (`row_number` + filter) shuffles EVERY row to its
  * group's reducer and sorts there — O(N) shuffle volume and a hot
  * reducer under group skew. Here Spark's partial/final aggregation
  * runs the buffer map-side, so the shuffle carries at most
  * groups × k fixed-width pairs per partition and the reducer merges
  * O(k) buffers — group skew costs nothing because a hot group still
  * ships ≤ k pairs per map task. Exact, not approximate: insertion
  * keeps the true k best of a partition, and sorted-merge of two
  * true-top-k buffers is the true top-k of their union.
  *
  * With a salted-hash score this same buffer is a deterministic
  * uniform k-sample per group (the q81 keep-rule at fixed size).
  * Inputs must be non-null; callers filter NULL scores/ids first
  * ([[graft.operators.Ranking.groupedTopK]] does). */
final class TopK(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: Seq[(Long, Long)] = Vector.empty

  def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    if (b.size == k && !beats(a, b.last)) b
    else {
      val (keep, rest) = b.span(beats(_, a))
      ((keep :+ a) ++ rest).take(k)
    }

  def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // merge of two sorted runs, truncated at k — O(k), allocation-light
    val out = Vector.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.size || j < y.size)) {
      val takeX = j >= y.size || (i < x.size && beats(x(i), y(j)))
      if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }

  def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
