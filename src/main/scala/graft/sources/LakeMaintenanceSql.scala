package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** SQL spellings for the lake maintenance operations (Delta parity):
  *
  *   OPTIMIZE <t> [WHERE <pred>] [ZORDER BY (c1, c2, …)]
  *   VACUUM <t> [RETAIN <n> HOURS] [DRY RUN]
  *   RESTORE TABLE <t> TO VERSION AS OF <v> | TO TIMESTAMP AS OF '<ts>'
  *   DESCRIBE HISTORY <t> / DESCRIBE DETAIL <t>
  *   REORG TABLE <t> [WHERE <pred>] APPLY (PURGE)
  *   CREATE TABLE <dst> SHALLOW CLONE <src> [VERSION AS OF <v>]
  *   CONVERT TO GRAFT '<dir>' [STATS BY (c1, c2, …)]
  *   ALTER TABLE '<root>' SET/UNSET TBLPROPERTIES (…)   (path form;
  *     catalog idents go through the Hints-batch rule instead)
  *   SHOW TBLPROPERTIES '<root>' [(key)]
  *
  * None of these exist in Spark's grammar, so they are intercepted by
  * a delegating [[ParserInterface]] (the same technique Delta's SQL
  * extension uses, regex-anchored instead of a second ANTLR grammar —
  * the four statements are line-shaped and the full predicate/column
  * sub-grammars are delegated to `functions.expr` at execution).
  * Everything else passes through to the session parser untouched, so
  * the extension cannot change the meaning of any standard statement.
  *
  * `<t>` is a graft-lake CATALOG table name, or a quoted '<root>'
  * path literal for tables used without a catalog entry. Execution
  * routes to the existing engines ([[Lake.clusterCommitted]] /
  * [[Lake.compactCommitted]] / [[Lake.vacuumCommitted]] /
  * [[Lake.restoreCommitted]] / [[Lake.describeHistory]]) and
  * refreshes the catalog relation afterwards, like every DML command.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftMaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftMaintenanceSql {
  // target: a 'quoted root path' or a (possibly dotted / backquoted)
  // catalog identifier
  private val T = """(?:'([^']+)'|([\w.`]+))"""
  private val Optimize =
    ("""(?is)^\s*OPTIMIZE\s+""" + T +
      """(?:\s+WHERE\s+(.*?))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val Vacuum =
    ("""(?is)^\s*VACUUM\s+""" + T +
      """(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?)?""" +
      """(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val Restore =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  private val RestoreTs =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + T +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""").r
  private val History =
    ("""(?is)^\s*DESCRIBE\s+HISTORY\s+""" + T + """\s*;?\s*$""").r
  private val Reorg =
    ("""(?is)^\s*REORG\s+(?:TABLE\s+)?""" + T +
      """(?:\s+WHERE\s+(.*?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""").r
  private val Detail =
    ("""(?is)^\s*DESCRIBE\s+DETAIL\s+""" + T + """\s*;?\s*$""").r
  private val Clone =
    ("""(?is)^\s*CREATE\s+TABLE\s+""" + T + """\s+SHALLOW\s+CLONE\s+""" + T +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""").r
  // path form only — the catalog-ident spelling IS Spark grammar and
  // routes through the Hints-batch rule so non-lake tables keep
  // Spark's own SHOW PARTITIONS behavior
  private val ShowPartsPath = // inline '<path>' group: PathT inits later
    ("""(?is)^\s*SHOW\s+PARTITIONS\s+'([^']+)'\s*;?\s*$""").r
  private val CopyInto =
    ("""(?is)^\s*COPY\s+INTO\s+""" + T +
      """\s+FROM\s+'([^']+)'\s*;?\s*$""").r
  private val Convert =
    ("""(?is)^\s*CONVERT\s+TO\s+GRAFT\s+""" + """'([^']+)'""" +
      """(?:\s+STATS\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  // TBLPROPERTIES statements intercept ONLY the quoted-'<root>' form
  // here (not valid Spark grammar anyway); catalog-ident spellings
  // keep Spark's own parse and route through the Hints-batch rule
  // (GraftLakePropertiesRule) so standard statements on non-lake
  // tables keep their standard meaning.
  private val PathT = """'([^']+)'"""
  private val SetProps =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + PathT +
      """\s+SET\s+TBLPROPERTIES\s*\((.*)\)\s*;?\s*$""").r
  private val UnsetProps =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + PathT +
      """\s+UNSET\s+TBLPROPERTIES\s*(IF\s+EXISTS\s*)?\((.*)\)\s*;?\s*$""").r
  private val ShowProps =
    ("""(?is)^\s*SHOW\s+TBLPROPERTIES\s+""" + PathT +
      """(?:\s*\(\s*([^)]+?)\s*\))?\s*;?\s*$""").r

  // one `'k' = 'v'` / `k = v` pair (keys: quoted or dotted idents).
  // Pairs are scanned with a QUOTE-AWARE tokenizer, not a raw
  // String.split(',') — a quoted value may itself contain commas
  // (`SET TBLPROPERTIES ('owners' = 'a,b')`), which Spark/Delta SQL
  // and this engine's own manifest line grammar both accept.
  private val PropPair =
    """\s*(?:'([^']*)'|([\w.]+))\s*=\s*(?:'([^']*)'|([^,'][^,]*?))\s*""".r
  private def splitPairsQuoteAware(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ',' if !inQuote => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.toSeq
  }
  private[sources] def parsePropPairs(s: String): Map[String, String] =
    splitPairsQuoteAware(s).iterator.filter(_.trim.nonEmpty).map {
      case PropPair(kq, k, vq, v) =>
        (if (kq != null) kq else k) -> (if (vq != null) vq else v.trim)
      case other => throw new IllegalArgumentException(
        s"cannot parse TBLPROPERTIES pair `$other` — use k = 'v'")
    }.toMap
  private[sources] def parsePropKeys(s: String): Seq[String] =
    s.split(',').iterator.map(_.trim).filter(_.nonEmpty)
      .map(k => if (k.startsWith("'")) k.stripPrefix("'").stripSuffix("'")
        else k.stripPrefix("`").stripSuffix("`")).toSeq

  private def target(rootLit: String, ident: String): GraftMaintTarget =
    if (rootLit != null) GraftMaintTarget(Some(rootLit), None)
    else GraftMaintTarget(None,
      Some(ident.split('.').map(_.stripPrefix("`").stripSuffix("`")).toSeq))

  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case Optimize(rootLit, ident, whereText, zorderText) =>
      val cols = Option(zorderText).toSeq
        .flatMap(_.split(',')).map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty)
      Some(GraftOptimizeCommand(target(rootLit, ident),
        Option(whereText).map(_.trim).filter(_.nonEmpty), cols))
    case Vacuum(rootLit, ident, hours, dry) =>
      Some(GraftVacuumCommand(target(rootLit, ident),
        Option(hours).map(_.toDouble), dry != null))
    case Restore(rootLit, ident, v) =>
      Some(GraftRestoreCommand(target(rootLit, ident), Left(v.toLong)))
    case RestoreTs(rootLit, ident, ts) =>
      Some(GraftRestoreCommand(target(rootLit, ident), Right(ts)))
    case History(rootLit, ident) =>
      Some(GraftDescribeHistoryCommand(target(rootLit, ident)))
    case Reorg(rootLit, ident, whereText) =>
      Some(GraftReorgCommand(target(rootLit, ident),
        Option(whereText).map(_.trim).filter(_.nonEmpty)))
    case Detail(rootLit, ident) =>
      Some(GraftDescribeDetailCommand(target(rootLit, ident)))
    case Clone(dstLit, dstIdent, srcLit, srcIdent, v) =>
      Some(GraftCloneCommand(target(dstLit, dstIdent),
        target(srcLit, srcIdent), Option(v).map(_.toLong)))
    case CopyInto(rootLit, ident, src) =>
      Some(GraftCopyIntoCommand(target(rootLit, ident), src))
    case ShowPartsPath(root) =>
      Some(GraftShowPartitionsCommand(GraftMaintTarget(Some(root), None)))
    case Convert(root, stats) =>
      Some(GraftConvertCommand(root, Option(stats).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)))
    case SetProps(root, pairs) =>
      Some(GraftSetPropertiesCommand(GraftMaintTarget(Some(root), None),
        parsePropPairs(pairs)))
    case UnsetProps(root, ifExists, keys) =>
      Some(GraftUnsetPropertiesCommand(GraftMaintTarget(Some(root), None),
        parsePropKeys(keys), ifExists != null))
    case ShowProps(root, key) =>
      Some(GraftShowPropertiesCommand(GraftMaintTarget(Some(root), None),
        Option(key).map(_.stripPrefix("'").stripSuffix("'")
          .stripPrefix("`").stripSuffix("`"))))
    case _ => None
  }
}

/** A maintenance statement's target: a literal root, or a catalog
  * name resolved at EXECUTION time (the parser must not touch the
  * catalog — EXPLAIN of a statement about a dropped table still
  * parses; execution resolves and refuses with the real name). */
case class GraftMaintTarget(root: Option[String], name: Option[Seq[String]]) {
  def resolve(session: SparkSession): (String, Option[TableIdentifier]) =
    root.map(r => (r, None: Option[TableIdentifier])).getOrElse {
      val parts = name.get
      LakeDml.lakeRootByIdent(session, parts).getOrElse(
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "UNSUPPORTED_FEATURE.TABLE_OPERATION",
          messageParameters = Map(
            "tableName" -> parts.mkString("."),
            "operation" ->
              ("lake maintenance (the statement targets graft-lake " +
                "catalog tables or a quoted '<root>' path)"))))
    }
  def describe: String = root.getOrElse(name.map(_.mkString(".")).getOrElse("?"))
}

/** `OPTIMIZE t` — incremental bin-packing compaction; with `ZORDER BY`
  * a clustered rewrite (per-partition on partitioned tables), with
  * `WHERE` scoped to the dirs the manifest cannot prove clean.
  * Returns the committed version (unchanged on a no-op). */
case class GraftOptimizeCommand(t: GraftMaintTarget,
    whereSql: Option[String], zorderCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, ident) = t.resolve(session)
    require(zorderCols.nonEmpty || whereSql.isEmpty,
      s"OPTIMIZE ${t.describe} WHERE … requires ZORDER BY (…): plain " +
        "bin-packing compaction is whole-table incremental (small dirs " +
        "only) and takes no predicate scope")
    val v =
      if (zorderCols.nonEmpty)
        Lake.clusterCommitted(session, root, zorderCols,
          where = whereSql.map(org.apache.spark.sql.functions.expr))
      else
        Lake.compactCommitted(session, root,
          minBytes = 128L * 1024 * 1024)
    LakeDml.refresh(session, ident)
    Seq(Row(v))
  }
}

/** `VACUUM t [RETAIN n HOURS] [DRY RUN]` — sweep pruned-version
  * leftovers and crash-abandoned staged dirs older than the retention
  * horizon; DRY RUN reports the counts without deleting (the audit
  * step before enforcing a horizon). */
case class GraftVacuumCommand(t: GraftMaintTarget,
    retainHours: Option[Double], dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("swept_manifests", LongType, nullable = false)(),
      AttributeReference("swept_dirs", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = t.resolve(session)
    val (ms, ds) = retainHours match {
      case Some(h) => Lake.vacuumCommitted(session, root,
        staleStagedMs = (h * 3600 * 1000).toLong, dryRun = dryRun)
      case None => Lake.vacuumCommitted(session, root, dryRun = dryRun)
    }
    Seq(Row(ms.size.toLong, ds.size.toLong))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF v` /
  * `… TO TIMESTAMP AS OF '<instant>'` — one manifest write, zero
  * data I/O ([[Lake.restoreCommitted]]; an instant resolves to the
  * snapshot LIVE at that moment via the manifests' commit instants,
  * the same resolver TIMESTAMP AS OF reads use). */
case class GraftRestoreCommand(t: GraftMaintTarget,
    to: Either[Long, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, ident) = t.resolve(session)
    val version = to match {
      case Left(v) => v
      case Right(ts) =>
        val tz = session.sessionState.conf.sessionLocalTimeZone
        val micros = org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(ts),
          org.apache.spark.sql.types.TimestampType, Some(tz)).eval() match {
          case l: java.lang.Long => l.longValue
          case _ => throw new IllegalArgumentException(
            s"RESTORE TO TIMESTAMP AS OF '$ts' does not parse as a timestamp")
        }
        Lake.versionAsOf(session, root, micros)
    }
    val v = Lake.restoreCommitted(session, root, version)
    // a restore across a rename/drop/evolution changes the live
    // schema; the catalog's stored copy must follow
    LakeDml.syncCatalogSchema(session, root, ident)
    LakeDml.refresh(session, ident)
    Seq(Row(v))
  }
}

/** `DESCRIBE HISTORY t` — the audit trail from manifest metadata
  * alone (same rows as the `graft_history` TVF). */
case class GraftDescribeHistoryCommand(t: GraftMaintTarget)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        org.apache.spark.sql.types.StructField("version", LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("commit_ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_dirs",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("row_count", LongType),
        org.apache.spark.sql.types.StructField("dv_dirs",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("dv_rows", LongType,
          nullable = false))))
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = t.resolve(session)
    Lake.describeHistory(session, root).collect().toSeq
  }
}

/** `DESCRIBE DETAIL t` — one row: format, location, live version,
  * layout, table properties and deletion-vector debt
  * ([[Lake.describeDetail]]). */
case class GraftDescribeDetailCommand(t: GraftMaintTarget)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        org.apache.spark.sql.types.StructField("format",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("location",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("version", LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("commit_ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("num_dirs",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("num_files", LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("size_bytes", LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("row_count", LongType),
        org.apache.spark.sql.types.StructField("partition_columns",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("bucket_by",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("properties",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("dv_dirs",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("dv_rows", LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("num_segments",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("table_features",
          org.apache.spark.sql.types.StringType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = t.resolve(session)
    Lake.describeDetail(session, root).collect().toSeq
  }
}

/** `ALTER TABLE t SET TBLPROPERTIES (…)` on a lake root — merge into
  * the manifest property map ([[Lake.setTableProperties]]). */
case class GraftSetPropertiesCommand(t: GraftMaintTarget,
    props: Map[String, String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (root, ident) = t.resolve(session)
    Lake.setTableProperties(session, root, props)
    LakeDml.refresh(session, ident)
    Seq.empty
  }
}

/** `ALTER TABLE t UNSET TBLPROPERTIES [IF EXISTS] (…)`. */
case class GraftUnsetPropertiesCommand(t: GraftMaintTarget,
    keys: Seq[String], ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val (root, ident) = t.resolve(session)
    Lake.unsetTableProperties(session, root, keys, ifExists)
    LakeDml.refresh(session, ident)
    Seq.empty
  }
}

/** `SHOW TBLPROPERTIES t [(key)]` — (key, value) rows from the live
  * manifest; a named absent key yields zero rows. */
case class GraftShowPropertiesCommand(t: GraftMaintTarget,
    key: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
      StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType, nullable = false))))
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = t.resolve(session)
    val props = Lake.tableProperties(session, root)
    key match {
      case Some(k) => props.get(k).map(v => Row(k, v)).toSeq
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** `REORG TABLE t [WHERE p] APPLY (PURGE)` — rewrite exactly the
  * deletion-vector-carrying dirs (predicate-scoped like OPTIMIZE
  * WHERE), materializing vectors away ([[Lake.reorgCommitted]]). */
case class GraftReorgCommand(t: GraftMaintTarget, whereSql: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, ident) = t.resolve(session)
    val v = Lake.reorgCommitted(session, root,
      where = whereSql.map(org.apache.spark.sql.functions.expr))
    LakeDml.refresh(session, ident)
    Seq(Row(v))
  }
}

/** `CREATE TABLE dst SHALLOW CLONE src [VERSION AS OF n]` — zero-copy
  * metadata clone ([[Lake.cloneCommitted]]). A catalog-ident
  * destination gets its root from the session catalog's default
  * table path and is registered as a graft-lake table; a quoted-path
  * destination clones without a catalog entry. The source is a lake
  * catalog table or a quoted root. */
case class GraftCloneCommand(dst: GraftMaintTarget, src: GraftMaintTarget,
    version: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (srcRoot, _) = src.resolve(session)
    val v = dst match {
      case GraftMaintTarget(Some(path), _) =>
        Lake.cloneCommitted(session, srcRoot, path, version)
      case GraftMaintTarget(None, Some(parts)) =>
        require(parts.lengthCompare(2) <= 0,
          s"clone destination ${parts.mkString(".")} — use db.table or table")
        val id = parts match {
          case Seq(t) => TableIdentifier(t)
          case Seq(db, t) => TableIdentifier(t, Some(db))
          case _ => throw new IllegalArgumentException(parts.mkString("."))
        }
        require(!session.sessionState.catalog.tableExists(id),
          s"table ${parts.mkString(".")} already exists — clone creates a " +
            "NEW table")
        val dstRoot = new org.apache.hadoop.fs.Path(
          session.sessionState.catalog.defaultTablePath(id)).toString
        val out = Lake.cloneCommitted(session, srcRoot, dstRoot, version)
        // EXTERNAL registration (LOCATION): the clone already
        // populated the path, which a managed CREATE would refuse
        session.sql(s"CREATE TABLE ${parts.map(p => s"`$p`").mkString(".")} " +
          s"USING `graft-lake` OPTIONS (root '$dstRoot') " +
          s"LOCATION '$dstRoot'")
        out
      case _ => throw new IllegalArgumentException("clone destination missing")
    }
    Seq(Row(v))
  }
}

/** `CONVERT TO GRAFT '<dir>' [STATS BY (c1, c2)]` — adopt a flat
  * parquet directory as a lake table in place
  * ([[Lake.convertParquet]]; same-filesystem file moves + one
  * manifest, no data rewrite). */
case class GraftConvertCommand(root: String, statsCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    Seq(Row(Lake.convertParquet(session, root, statsCols)))
}

/** `COPY INTO t FROM '<dir>'` — idempotent landing-zone ingestion
  * ([[Lake.copyInto]]): appends only the parquet files the table's
  * `#ingested=` ledger has not recorded, and records them atomically
  * with the data commit. A re-run of the same statement loads
  * nothing. Returns (version, files_loaded). */
case class GraftCopyIntoCommand(t: GraftMaintTarget, srcDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("files_loaded", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, ident) = t.resolve(session)
    val (v, n) = Lake.copyInto(session, root, srcDir)
    LakeDml.refresh(session, ident)
    Seq(Row(v, n))
  }
}


/** `SHOW PARTITIONS t` — the manifest-layout report as SQL: one row
  * per live partition-value tuple in Spark's own `c=v/c2=v2` spelling
  * plus the dir count behind it ([[Lake.partitionValues]] — pure
  * manifest metadata, no data file opened at any table size).
  * Unpartitioned tables refuse with the programmatic message. */
case class GraftShowPartitionsCommand(t: GraftMaintTarget)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("partition",
        org.apache.spark.sql.types.StringType, nullable = false)(),
      AttributeReference("n_dirs", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (root, _) = t.resolve(session)
    val pv = Lake.partitionValues(session, root)
    val cols = pv.schema.fieldNames.dropRight(1) // last = n_dirs
    pv.collect().toSeq.map { r =>
      val spec = cols.zipWithIndex.map { case (c, i) =>
        c + "=" + (if (r.isNullAt(i)) "null" else r.get(i).toString)
      }.mkString("/")
      Row(spec, r.getLong(cols.length))
    }.sortBy(_.getString(0))
  }
}
