package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode, FalseLiteral, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector read support (merge-on-read row deletes).
  *
  * A `#dv_<dir>=` manifest line soft-deletes rows of an immutable
  * data dir by parquet row position (see [[Lake]]'s DV section for
  * the protocol). The pieces here are the READ side:
  *
  *  - [[DvSet]]: the serializable position index a scan's filter
  *    consults — O(1) per row, hash lookup on
  *    (dir-basename/file, row position);
  *  - [[DvContains]]: the codegen'd catalyst predicate over
  *    `_metadata.file_path` + `_metadata.row_index`;
  *  - [[DvApplied]]: a foldable TRUE marker conjoined into every
  *    DV filter, letting [[GraftLakeDvRule]] recognize an
  *    already-filtered scan (constant-folds away before execution);
  *  - [[GraftLakeDvRule]]: the analyzer rule that wraps SQL catalog
  *    reads of a DV-carrying snapshot — the one read path that
  *    assembles a bare relation ([[GraftLakeProvider.createRelation]])
  *    instead of going through [[LakeFileIndex.relation]], which
  *    applies the filter itself.
  *
  * The filter's row cost is one hash probe per scanned row of a
  * DV'd snapshot and ZERO for snapshots without vectors (no filter is
  * added at all), so the 100 TB read path pays only when a dir
  * actually carries soft deletes — and compaction/z-order materialize
  * them away, returning the dir to the filter-free path.
  */
final class DvSet(val entries: Map[String, Array[Long]]) extends Serializable {
  @transient private lazy val index:
      java.util.HashMap[UTF8String, java.util.HashSet[java.lang.Long]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashSet[java.lang.Long]](
      entries.size * 2)
    entries.foreach { case (k, ps) =>
      val s = new java.util.HashSet[java.lang.Long](ps.length * 2)
      ps.foreach(p => s.add(java.lang.Long.valueOf(p)))
      m.put(UTF8String.fromString(k), s)
    }
    m
  }

  def contains(key: UTF8String, pos: Long): Boolean = {
    val s = index.get(key)
    s != null && s.contains(java.lang.Long.valueOf(pos))
  }

  /** Total soft-deleted positions (rows-accounting / diagnostics). */
  def totalPositions: Long = entries.valuesIterator.map(_.length.toLong).sum
}

/** How the position index ships to tasks. A SMALL set embeds in the
  * serialized plan (zero indirection, no broadcast bookkeeping); a
  * LARGE one rides an executor BROADCAST — the plan then carries only
  * a handle, so raising `dvMaxRows` toward Delta's ~2%-cardinality
  * guidance stops shipping megabytes of positions in every task
  * closure (each executor fetches the set once). The threshold lives
  * at [[Lake.dvCarrier]]. */
sealed trait DvCarrier extends Serializable { def set: DvSet }
final case class DvInline(set: DvSet) extends DvCarrier
final case class DvBroadcastRef(
    bc: org.apache.spark.broadcast.Broadcast[DvSet]) extends DvCarrier {
  @transient override lazy val set: DvSet = bc.value
}

/** `dv.contains(<dir>/<file>, row_index)` as a codegen'd predicate.
  * Never NULL: a NULL input (impossible for `_metadata` fields, but
  * stated) reads as not-deleted — conservative in the enclosing
  * `NOT DvContains(…)` read filter only because deletes are re-checked
  * nowhere else; the metadata columns are in practice always set. */
case class DvContains(fileKey: Expression, pos: Expression, dv: DvCarrier)
    extends Expression {
  override def children: Seq[Expression] = Seq(fileKey, pos)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val localSet: DvSet = dv.set

  override def eval(input: InternalRow): Any = {
    val k = fileKey.eval(input)
    val p = pos.eval(input)
    if (k == null || p == null) false
    else localSet.contains(k.asInstanceOf[UTF8String], p.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dvRef = ctx.addReferenceObj("dvCarrier", dv,
      classOf[DvCarrier].getName)
    // resolve the carrier ONCE per codegen instance (a broadcast's
    // value() is a method call; rows pay a plain field read)
    val dvLocal = ctx.addMutableState(classOf[DvSet].getName, "dvSetLocal",
      v => s"$v = ((${classOf[DvCarrier].getName}) $dvRef).set();")
    val kEval = fileKey.genCode(ctx)
    val pEval = pos.genCode(ctx)
    ev.copy(code = code"""
      ${kEval.code}
      ${pEval.code}
      boolean ${ev.value} = !${kEval.isNull} && !${pEval.isNull} &&
        $dvLocal.contains(${kEval.value}, ${pEval.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(fileKey = newChildren(0), pos = newChildren(1))
}

/** Foldable TRUE conjoined into every DV read filter: analysis-time
  * evidence that the relation below is already DV-filtered (the
  * [[GraftLakeDvRule]] idempotence check — structural, so it survives
  * the catalog's relation cache where a TreeNodeTag would not).
  * Constant folding erases it before execution. */
case class DvApplied() extends LeafExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: InternalRow): Any = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = code"", isNull = FalseLiteral, value = TrueLiteral)
}

object DvFilter {
  import org.apache.spark.sql.catalyst.expressions.{
    And, GetStructField, Literal, Not, SubstringIndex}
  import org.apache.spark.sql.catalyst.plans.logical.Project
  import org.apache.spark.sql.types.StructType

  /** `Project(orig, Filter(DvApplied ∧ ¬DvContains(key, pos), scan))`
    * over a lake relation, built from ALREADY-RESOLVED catalyst nodes
    * (the `_metadata` struct attribute via `withMetadataColumns`) so
    * it can be produced inside an analyzer rule without re-analysis —
    * a `Dataset.where` there embeds a lazy sql-api column wrapper the
    * idempotence check cannot see through, which recursed. The
    * Project restores the relation's original output (the metadata
    * column serves the filter only). */
  private[sources] def plan(lr: LogicalRelation, dv: DvCarrier): LogicalPlan = {
    val withMeta = lr.withMetadataColumns()
    val metaAttr = withMeta.output.find(_.name == "_metadata").getOrElse(
      throw new IllegalStateException(
        "parquet relation exposes no _metadata column — deletion " +
          "vectors need file_path/row_index generation"))
    val st = metaAttr.dataType.asInstanceOf[StructType]
    def field(n: String) =
      GetStructField(metaAttr, st.fieldIndex(n), Some(n))
    val key = SubstringIndex(field("file_path"),
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString("/"),
        org.apache.spark.sql.types.StringType), Literal(-2))
    val cond = And(DvApplied(),
      Not(DvContains(key, field("row_index"), dv)))
    Project(lr.output, Filter(cond, withMeta))
  }
}

/** Post-hoc resolution rule: SQL reads of a graft-lake catalog table
  * whose live snapshot carries deletion vectors get the DV filter
  * wrapped around the scan. [[LakeFileIndex.relation]] (every
  * DataFrame-API read) applies the filter at assembly; catalog SELECTs
  * resolve through [[GraftLakeProvider.createRelation]] to a bare
  * [[HadoopFsRelation]], and THIS is where their filter lands —
  * without it a SQL read of a soft-deleted table would silently
  * resurrect rows, the silent-wrongness class this engine refuses
  * (the same reason [[GraftLakeInsertRule]] exists). Registered after
  * the DML/insert rules; idempotent via the [[DvApplied]] marker. */
class GraftLakeDvRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = wrap(plan)

  private def wrap(p: LogicalPlan): LogicalPlan = p match {
    // already filtered (by LakeFileIndex.relation or a previous pass)
    case pr @ org.apache.spark.sql.catalyst.plans.logical.Project(_,
        Filter(cond, _: LogicalRelation))
        if cond.exists(_.isInstanceOf[DvApplied]) => pr
    case f @ Filter(cond, _: LogicalRelation)
        if cond.exists(_.isInstanceOf[DvApplied]) => f
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case idx: LakeFileIndex =>
          Lake.dvSetFor(session, idx.root, idx.version) match {
            case Some(set) => DvFilter.plan(lr,
              Lake.dvCarrier(session, set, Some((idx.root, idx.version))))
            case None => lr
          }
        case _ => lr
      }
      case _ => lr
    }
    case other =>
      val withChildren = other.mapChildren(wrap)
      // lake reads inside IN/EXISTS/scalar subqueries live in
      // expression-held plans mapChildren never visits
      withChildren.transformExpressionsDown {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          s.withNewPlan(wrap(s.plan))
      }
  }
}
