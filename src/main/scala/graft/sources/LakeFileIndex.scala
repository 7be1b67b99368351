package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
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
  * whose manifest statistics can satisfy them ([[Lake.scanFilesAt]]:
  * dir-level min/max + bloom pruning, then file-level `#fstats_`
  * pruning inside clustered dirs). Everything downstream is stock
  * Spark — `FileSourceScanExec`, the vectorized parquet reader,
  * parquet footer min/max pushdown, whole-stage codegen — so the
  * skipping composes with, rather than replaces, the engine's normal
  * scan path. Non-understood predicates contribute nothing and the
  * full filter is still applied to what is read: pruning can only
  * shrink I/O, never change the answer.
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
    val version: Long, dataSchema: StructType) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def partitionSchema: StructType = new StructType()

  /** Planning-time pruned listing. `partitionFilters` is always empty
    * (lake snapshots carry no hive-style partition columns — layout
    * lives in the manifest); `dataFilters` are resolved catalyst
    * conjuncts, exactly what the manifest pruner consumes. */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty,
      Lake.scanFilesAt(spark, root, version, dataFilters).toArray))

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
    * stock parquet format. */
  private[sources] def hadoopRelation(spark: SparkSession, root: String,
      version: Long, schema: StructType): HadoopFsRelation = {
    val index = new LakeFileIndex(spark, root, version, schema)
    // a manifest-declared bucket layout rides into the relation, so
    // the scan's outputPartitioning is HashPartitioning(cols, n) and
    // joins/aggs on the bucket key skip their exchange on this side
    // (every data file of a bucketed snapshot is written through
    // Spark's bucketed writer — the id-in-file-name contract holds)
    HadoopFsRelation(index, new StructType(), schema,
      Lake.bucketSpecAt(spark, root, version),
      new ParquetFileFormat, Map.empty[String, String])(spark)
  }

  /** [[hadoopRelation]] surfaced as a DataFrame through the one
    * `private[sql]` bridge ([[org.apache.spark.sql.graft.Shim
    * .ofRows]]), with the snapshot's deletion-vector filter applied
    * when it carries one (soft-deleted rows must not be served; the
    * filter is absent — zero cost — on vector-free snapshots). */
  private[sources] def relation(spark: SparkSession, root: String,
      version: Long, schema: StructType): DataFrame = {
    val lr = LogicalRelation(hadoopRelation(spark, root, version, schema))
    org.apache.spark.sql.graft.Shim.ofRows(spark,
      Lake.dvSetFor(spark, root, version)
        .map(set => DvFilter.plan(lr, set)).getOrElse(lr))
  }
}
