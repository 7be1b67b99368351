package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC snapshot maintenance — apply a change batch (upserts +
  * deletes, versioned) to a base snapshot keyed by `keyCols`.
  *
  * The reference's only load semantics is insert-if-absent append
  * (/root/reference/dags/Load.py:21-28: an O(base × batch) pandas
  * row-exists scan) plus a whole-table delete→rewrite; neither can
  * express "the row CHANGED" or "this key was retracted". This
  * operator is the warehouse-grade generalization: a change row
  * carries a monotone version and a delete flag, and one apply folds
  * the batch into the snapshot with MERGE semantics — last writer
  * per key wins, a winning delete removes the key, untouched base
  * rows pass through byte-identical.
  *
  * Shape, chosen for the 100 TB snapshot:
  *  1. reduce the batch to its per-key LAST change with `max_by`
  *     over a struct — a partial-aggregatable HashAggregate (map-side
  *     combine, one narrow shuffle of BATCH partials; no window, no
  *     sort of the batch). Requires `versionCol` to totally order
  *     each key's changes (unique per key — CDC log offsets are);
  *     ties would be nondeterministic, so the spec asserts
  *     uniqueness-dependence explicitly.
  *  2. anti-join the base against the batch's (small) key set —
  *     broadcast, so THE BASE NEVER SHUFFLES: apply cost is
  *     O(base map-scan + batch), not O(base shuffle). When a batch
  *     outgrows broadcast, a base bucketed on `keyCols`
  *     ([[graft.sources.Bucketing]]) keeps the base shuffle-free
  *     under SMJ; either way history is never re-sorted.
  *  3. union the surviving upserts (winning non-delete changes)
  *     back in. Output schema == base schema (version column is
  *     part of the snapshot, delete flag is not).
  *
  * Composes with [[Incremental]]: this maintains the FACT snapshot,
  * Incremental maintains its aggregates — together they are the
  * incremental warehouse refresh the reference recomputes per run.
  */
object Cdc {

  /** One CDC apply round. `changes` = base schema + `deleteCol`
    * (boolean). `versionCol` must be a base column and totally order
    * each key's changes.
    *
    * "Last writer per key wins" is scoped to ONE batch: versions are
    * compared within `changes`, and by default the batch's winner
    * replaces the stored row unconditionally — CROSS-batch ordering is
    * the caller's contract (the streaming fold satisfies it by
    * applying batches in checkpoint order). A late or out-of-order
    * batch whose newest change is OLDER than the stored row would
    * overwrite or delete newer base state; pass
    * `guardVersions = true` to reject such stale winners (the key's
    * stored row survives untouched). The guard costs one extra
    * map-only pass over the base — the broadcast semi-probe that
    * collects the touched keys' stored versions (≤ batch-size rows),
    * the same "find touched rows first" pass a lakehouse MERGE runs —
    * so the base still never shuffles. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String, deleteCol: String,
      guardVersions: Boolean = false): DataFrame = {
    val latest = lastChanges(base, changes, keyCols, versionCol, deleteCol,
      guardVersions)
    // broadcast the batch's key set: the base-side anti-join stays a
    // map-only probe — no base shuffle, ever
    val touched = broadcast(latest.select(keyCols.map(col): _*))
    // NULL delete flag = NOT a delete: without the coalesce, a
    // NULL-flag winner would remove its key from the base (the
    // anti-join sees the key) yet fail the !delete filter and never
    // union back — a silent delete
    base.join(touched, keyCols, "left_anti")
      .unionByName(
        latest.where(!coalesce(col(deleteCol), lit(false))).drop(deleteCol))
  }

  /** The batch's effective per-key winners (key cols + payload +
    * `deleteCol`) after the optional stale-version guard — the
    * "which rows does this MERGE touch" half of [[applyChanges]],
    * factored out so the copy-on-write committed-table merge
    * ([[graft.sources.Lake.mergeCommitted]]) can probe which files
    * hold touched keys before deciding what to rewrite. */
  private[graft] def lastChanges(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], versionCol: String, deleteCol: String,
      guardVersions: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "CDC apply needs at least one key column")
    require(base.columns.contains(versionCol) && !base.columns.contains(deleteCol),
      s"base must carry $versionCol and must not carry $deleteCol")
    val payload = changes.columns.filterNot(c => keyCols.contains(c) || c == deleteCol)
    // per-key last change: max_by(struct(payload...), version) is a
    // partial-aggregatable HashAggregate — the batch combines map-side
    // and shuffles only one struct per (partition, key)
    val latestUnguarded = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct((payload :+ deleteCol).map(col): _*), col(versionCol)).as("__last"))
      .select(keyCols.map(col) ++ (payload :+ deleteCol).map(c => col(s"__last.$c")): _*)
    val latest =
      if (!guardVersions) latestUnguarded
      else {
        require(!base.columns.contains("__base_v") && !changes.columns.contains("__base_v"),
          "guardVersions reserves the column name __base_v; rename the conflicting column")
        // stored versions of only the touched keys: broadcast
        // semi-probe of the base (map-only, no base shuffle), result
        // bounded by the batch's key count so it broadcasts too
        val touchedKeys = broadcast(latestUnguarded.select(keyCols.map(col): _*))
        val baseVersions = broadcast(
          base.join(touchedKeys, keyCols, "left_semi")
            .select(keyCols.map(col) :+ col(versionCol).as("__base_v"): _*))
        // a batch winner must be strictly newer than the stored row to
        // touch it; absent keys (inserts) always win. isNull tests the
        // joined VALUE, so a key whose STORED version is NULL also
        // passes — a NULL-versioned base row is always overwritable
        // (it predates versioning; nothing can compare older than it),
        // spec-proven in CdcSpec
        latestUnguarded.join(baseVersions, keyCols, "left")
          .where(col("__base_v").isNull || col(versionCol) > col("__base_v"))
          .drop("__base_v")
      }
    latest
  }

  /** SCD Type-2 historization of a CDC log: every non-delete change
    * becomes a validity interval `[valid_from, valid_to)` in version
    * units — `valid_from` its own version, `valid_to` the KEY'S next
    * change (NULL while the state is still live). A delete closes its
    * predecessor's interval (its version becomes that row's
    * `valid_to`) and emits no row of its own, so `is_current` is
    * simply `valid_to IS NULL` — a deleted key has no current row.
    *
    * This is the time-travel complement of [[applyChanges]]: apply
    * keeps only each key's final state, history keeps every state
    * with its lifespan, and `history(...).where(is_current)` equals
    * applying the full log to an empty base (spec-proven). One
    * shuffle on the key + a per-key sort by version — the standard
    * historization cost; at 100 TB the log partitions by key like any
    * window, and incremental historization of a NEW batch needs only
    * the affected keys' open intervals (an [[applyChanges]]-style
    * broadcast anti-join on the stored history's current rows). */
  def history(changes: DataFrame, keyCols: Seq[String], versionCol: String,
      deleteCol: String): DataFrame = {
    require(keyCols.nonEmpty, "SCD2 history needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      // same NULL-flag discipline as applyChanges: a NULL delete flag
      // is an upsert, not a silent end of the key's history
      .where(!coalesce(col(deleteCol), lit(false)))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(deleteCol)
  }

  /** INCREMENTAL historization — fold a NEW change batch into a stored
    * [[history]] table without replaying the log: close the open
    * interval of every affected key at its first new version, historize
    * the batch internally, and carry every other stored row through
    * untouched. `applyHistoryBatch(history(log₁), log₂, …) ≡
    * history(log₁ ⊎ log₂)` (spec-proven), which is the whole point: at
    * 100 TB the stored history never re-sorts — the batch windows over
    * itself, the stored side is touched only by one key semi/anti-join
    * pair (broadcast when the batch's key set is small, exactly
    * [[applyChanges]]'s base-never-shuffles shape), and on a
    * manifest-committed history the same fold lands as a
    * [[graft.sources.Lake.mergeCommitted]] upsert of O(affected keys).
    *
    * CONTRACT (the [[applyChanges]] monotone-version discipline): every
    * batch version must exceed the stored versions of its key — a CDC
    * log consumed in offset order satisfies this by construction. A
    * violating batch would need rows spliced between stored intervals,
    * which no incremental fold can do without re-reading the log; the
    * fold therefore REFUSES it with a row-local `raise_error` (free —
    * no extra job or shuffle, evaluated on the rows the close pass
    * already touches) instead of committing a silently-wrong history;
    * replay [[history]] over the full log to repair.
    *
    * @param stored prior [[history]] output (same key/version schema)
    * @param batch  new change rows: key cols + versionCol + deleteCol
    *               + payload */
  def applyHistoryBatch(stored: DataFrame, batch: DataFrame,
      keyCols: Seq[String], versionCol: String, deleteCol: String): DataFrame = {
    require(keyCols.nonEmpty, "SCD2 history needs at least one key column")
    Seq("valid_from", "valid_to", "is_current").foreach(c =>
      require(stored.columns.contains(c),
        s"stored side is missing history column '$c' — pass Cdc.history output, " +
          "not a raw change log"))
    val affected = batch.select(keyCols.map(col): _*).distinct()
    val untouched = stored.join(affected, keyCols, "left_anti")
    // each affected key's first new version closes its open interval
    // (delete or upsert alike — full replay closes it there too)
    val firstNew = batch.groupBy(keyCols.map(col): _*)
      .agg(min(col(versionCol)).as("__vmin"))
    val closed = stored.join(firstNew, keyCols)
      .withColumn("valid_to",
        // monotone-version guard first: a stored version at or past the
        // batch's first version cannot be folded incrementally
        when(col("valid_from") >= col("__vmin"),
          raise_error(format_string(
            "applyHistoryBatch: stored version %s of an affected key is not " +
              "older than the batch's first version %s — the incremental fold " +
              "needs monotone versions; replay Cdc.history over the full log",
            col("valid_from"), col("__vmin"))))
          .otherwise(when(col("is_current"), col("__vmin"))
            .otherwise(col("valid_to"))))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__vmin")
    untouched
      .unionByName(closed.select(stored.columns.map(col).toSeq: _*))
      .unionByName(history(batch, keyCols, versionCol, deleteCol)
        .select(stored.columns.map(col).toSeq: _*))
  }
}
