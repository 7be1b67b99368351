package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BoundReference, Expression, PlanExpression, Predicate}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Spark [[FileIndex]] over one pinned snapshot of a manifest-
  * committed [[Lake]] table — the piece that makes lake tables
  * first-class citizens of `spark.sql`.
  *
  * Catalyst's scan planning calls [[listFiles]] with the DATA FILTERS
  * it pushed to the relation; the index answers with only the files
  * whose manifest statistics can satisfy them ([[Lake.scanDirFilesAt]]:
  * dir-level min/max + bloom pruning, then file-level `#fstats_`
  * pruning inside clustered dirs). Everything downstream is stock
  * Spark — `FileSourceScanExec`, the vectorized parquet reader,
  * parquet footer min/max pushdown, whole-stage codegen — so the
  * skipping composes with, rather than replaces, the engine's normal
  * scan path. Non-understood predicates contribute nothing and the
  * full filter is still applied to what is read: pruning can only
  * shrink I/O, never change the answer.
  *
  * When the snapshot carries a COMPLETE partition layout
  * ([[Lake.partitionLayoutAt]]: every dir tupled, values representable)
  * the index exposes the partition columns as TRUE Spark partition
  * columns: each manifest dir becomes one [[PartitionDirectory]]
  * carrying its tuple, static partition predicates prune here at
  * planning, and Spark's own DYNAMIC partition pruning re-filters the
  * directories at execution from the star-join dim side — `fact ⋈
  * σ(dim)` reads 2-of-N partitions with NO engine-specific API. The
  * partition columns' values come from the tuple (exact per-row
  * knowledge, recorded at write), so the files' own copies of those
  * columns are never even read: column pruning for free.
  *
  * The reference reads its warehouse through an eager client that
  * re-lists state per query (/root/reference/dags/Main.py:31-38); at
  * 100 TB the equivalent is this: one manifest read at PLANNING time
  * decides the file set, the scan never lists the table, and two jobs
  * over one handle cannot straddle a concurrent commit because the
  * version is pinned at construction.
  */
final class LakeFileIndex(
    spark: SparkSession, val root: String,
    val version: Long, dataSchema: StructType,
    layout: Option[(StructType, Map[String, InternalRow])] = None)
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def partitionSchema: StructType =
    layout.map(_._1).getOrElse(new StructType())

  /** Planning-time pruned listing. `dataFilters` are resolved catalyst
    * conjuncts, exactly what the manifest pruner consumes;
    * `partitionFilters` arrive only in partition-schema mode and
    * evaluate EXACTLY against each dir's recorded tuple (dynamic
    * pruning subqueries are the exec's to apply — skipped here). */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirFiles = Lake.scanDirFilesAt(spark, root, version, dataFilters)
    layout match {
      case None =>
        Seq(PartitionDirectory(InternalRow.empty,
          dirFiles.flatMap(_._2).toArray))
      case Some((pschema, tuples)) =>
        val static = partitionFilters.filter(f => f.deterministic &&
          !f.exists(_.isInstanceOf[PlanExpression[_]]))
        val pred = if (static.isEmpty) None else Some {
          val bound = static.reduce(And).transform {
            case a: AttributeReference =>
              BoundReference(pschema.fieldIndex(a.name), a.dataType, a.nullable)
          }
          val p = Predicate.create(bound)
          p.initialize(0)
          p
        }
        dirFiles.flatMap { case (d, files) =>
          val row = tuples(d)
          if (pred.forall(_.eval(row)))
            Some(PartitionDirectory(row, files.toArray))
          else None
        }
    }
  }

  override def inputFiles: Array[String] =
    Lake.scanFilesAt(spark, root, version, Nil)
      .map(_.getPath.toString).toArray

  /** Snapshot dirs are immutable; there is nothing to refresh. A NEW
    * commit is a different snapshot — take a new [[Lake.sqlTable]]
    * handle to see it (deliberate: a registered view keeps giving
    * consistent reads of its registration-time version). */
  override def refresh(): Unit = ()

  /** True snapshot byte size (one listing, memoized) — feeds the
    * optimizer's stats so a small lake dimension auto-broadcasts. */
  override lazy val sizeInBytes: Long =
    Lake.scanFilesAt(spark, root, version, Nil).map(_.getLen).sum
}

object LakeFileIndex {
  /** The [[HadoopFsRelation]] assembly for [[Lake.sqlTable]] and the
    * `graft-lake` batch format: pinned index + committed schema +
    * stock parquet format. `partitionAware = true` (the DataFrame /
    * temp-view path) activates the partition-schema layout when the
    * snapshot supports it; the CATALOG path stays flat because a
    * catalog table's stored schema must keep matching the relation's
    * column order across versions of this engine. */
  private[sources] def hadoopRelation(spark: SparkSession, root: String,
      version: Long, schema: StructType,
      partitionAware: Boolean = false): HadoopFsRelation = {
    val layout =
      if (partitionAware) Lake.partitionLayoutAt(spark, root, version, schema)
      else None
    val dataSchema = layout match {
      case Some((ps, _)) =>
        StructType(schema.filterNot(f => ps.fieldNames.contains(f.name)))
      case None => schema
    }
    val index = new LakeFileIndex(spark, root, version, dataSchema, layout)
    // under a column map the RELATION stays logical end-to-end
    // (resolution, pruning, partition columns, bucket partitioning)
    // and only the file reader translates names — see
    // [[MappedParquetFileFormat]]
    val format = Lake.colMapAt(spark, root, version) match {
      case m if m.isEmpty => new ParquetFileFormat
      case m              => new MappedParquetFileFormat(m)
    }
    // a manifest-declared bucket layout rides into the relation, so
    // the scan's outputPartitioning is HashPartitioning(cols, n) and
    // joins/aggs on the bucket key skip their exchange on this side
    // (every data file of a bucketed snapshot is written through
    // Spark's bucketed writer — the id-in-file-name contract holds;
    // bucket columns are data columns even in partition mode)
    HadoopFsRelation(index, layout.map(_._1).getOrElse(new StructType()),
      dataSchema, Lake.bucketSpecAt(spark, root, version),
      format, Map.empty[String, String])(spark)
  }

  /** [[hadoopRelation]] surfaced as a DataFrame through the one
    * `private[sql]` bridge ([[org.apache.spark.sql.graft.Shim
    * .ofRows]]), partition-aware, with the snapshot's deletion-vector
    * filter applied when it carries one and the output re-projected to
    * the committed column order (partition mode appends partition
    * columns after data columns; callers see the schema they wrote). */
  private[sources] def relation(spark: SparkSession, root: String,
      version: Long, schema: StructType): DataFrame = {
    val lr = LogicalRelation(
      hadoopRelation(spark, root, version, schema, partitionAware = true))
    val base = Lake.dvSetFor(spark, root, version)
      .map(set => DvFilter.plan(lr,
        Lake.dvCarrier(spark, set, Some((root, version)))))
      .getOrElse(lr)
    val plan =
      if (lr.output.map(_.name) == schema.fieldNames.toSeq) base
      else Project(schema.fieldNames.toSeq.map(n =>
        lr.output.find(_.name == n).getOrElse(throw new IllegalStateException(
          s"committed column '$n' missing from the assembled scan"))), base)
    org.apache.spark.sql.graft.Shim.ofRows(spark, plan)
  }
}
