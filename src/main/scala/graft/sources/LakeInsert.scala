package graft.sources

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

/** SQL `INSERT INTO` / `INSERT OVERWRITE` routed through the manifest
  * commit protocol.
  *
  * Without this, Spark's `DataSourceAnalysis` plans an insert into a
  * `CREATE TABLE USING graft-lake` catalog table as a plain
  * `InsertIntoHadoopFsRelationCommand` writing parquet files straight
  * into the table ROOT — files no manifest references, so the insert
  * reports success and the rows silently never appear to any reader
  * (measured before this rule existed). That is the one failure class
  * this engine refuses everywhere: data loss without an error.
  *
  * The rewrite keys on the relation's [[LakeFileIndex]] (only lake
  * tables carry one) and replaces the file write with the real
  * commit: append for `INSERT INTO`, snapshot replace for
  * `INSERT OVERWRITE` — both optimistically concurrent, crash-safe,
  * change-feed-visible like every other commit. Schema alignment
  * (column count/order/casts) has already happened upstream in
  * `PreprocessTableInsertion`, so the committed batch is exactly what
  * SQL semantics dictate. Retention uses the commit default; pipelines
  * needing custom retention/stats knobs use the write API. */
case class GraftLakeInsertCommand(root: String, overwrite: Boolean,
    query: LogicalPlan, outputColumnNames: Seq[String],
    partitionBy: Seq[String],
    ident: Option[org.apache.spark.sql.catalyst.TableIdentifier] = None)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val df0 = org.apache.spark.sql.graft.Shim.ofRows(session, query)
    // commit under the command's declared output names, not whatever
    // the query plan's attributes happen to be called — the committed
    // schema merges BY NAME, so a divergent query alias would
    // otherwise evolve the table under the wrong column names
    val df =
      if (outputColumnNames.nonEmpty &&
          outputColumnNames != df0.columns.toSeq) {
        require(outputColumnNames.length == df0.columns.length,
          s"INSERT into lake table $root: ${outputColumnNames.length} " +
            s"output columns declared but the query produces " +
            s"${df0.columns.length}")
        df0.toDF(outputColumnNames: _*)
      } else df0
    if (overwrite) Lake.commitOverwrite(df, root, partitionBy = partitionBy)
    else Lake.commitAppend(df, root, partitionBy = partitionBy)
    // an evolving insert (new columns) leaves the catalog's stored
    // schema stale, and v1 resolution hard-compares it — re-align
    LakeDml.syncCatalogSchema(session, root, ident)
    // invalidate the catalog's cached relation so the next SELECT on
    // this table resolves the post-insert snapshot — without it the
    // INSERT's own analysis caches the PRE-insert relation and later
    // reads silently serve stale rows (the failure class the DML
    // commands already refresh against; measured, then fixed)
    LakeDml.refresh(session, ident)
    Seq.empty
  }
}

/** Post-hoc resolution rule installing the rewrite; registered by
  * `graft.plans.GraftExtensions` (custom post-hoc rules run AFTER
  * `DataSourceAnalysis`, so the match is on the already-converted
  * file-write command, whose `fileIndex` identifies lake tables). */
class GraftLakeInsertRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case c: InsertIntoHadoopFsRelationCommand =>
      c.fileIndex match {
        case Some(idx: LakeFileIndex) =>
          // lake catalog tables are unpartitioned at the catalog level
          // (the manifest owns layout) — a static-partition INSERT
          // spec reaching here would be silently dropped, so refuse
          require(c.staticPartitions.isEmpty,
            s"INSERT into lake table ${idx.root} does not support " +
              "static PARTITION (col=value) specs — partition values " +
              "travel in the rows; the manifest owns the layout")
          // a DDL-declared PARTITIONED BY must be HONORED, not
          // silently dropped: the first insert establishes the lake
          // layout from it, and a root already partitioned differently
          // refuses (effectivePartCols' one-layout-per-table rule)
          GraftLakeInsertCommand(idx.root, c.mode == SaveMode.Overwrite,
            c.query, c.outputColumnNames,
            // the DDL declaration lives on the catalog table — the
            // relation's own partitionSchema is empty by design (the
            // manifest, not hive paths, carries the layout)
            c.catalogTable.map(_.partitionColumnNames).getOrElse(Nil),
            c.catalogTable.map(_.identifier))
        case _ => plan
      }
    case _ => plan // inserts are whole-statement commands; never nested
  }
}
