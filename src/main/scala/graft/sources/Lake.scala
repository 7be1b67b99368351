package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operations for the parquet lake.
  *
  * The reference's only maintenance job is the dedup repair
  * (/root/reference/dags/Main.py:28-47, re-expressed as
  * `Newsmaper.maintenance` + `overwriteRetained`); at 100 TB the same
  * append-only sinks grow a second pathology the reference never
  * meets: SMALL FILES. Every `loadTo` batch appends its own files, so
  * a year of hourly loads leaves ~10⁴ files per table — each scan
  * then pays listing + open cost per file and the 128 MB split floor
  * stops mattering. Compaction rewrites the table into
  * size-targeted files through the same crash-safe staged swap the
  * dedup repair uses (write staging → keep `.bak` until live —
  * no crash point loses the table).
  *
  * The manifest-committed tables below additionally provide: TIME
  * TRAVEL ([[readCommittedAt]] — retention is the read horizon),
  * SCHEMA EVOLUTION (manifests carry the committed schema; appends
  * merge add-nullable-column changes), per-row copy-on-write MERGE
  * INTO ([[mergeCommitted]] — only dirs holding touched keys
  * rewrite), and committed-table compaction ([[compactCommitted]]).
  */
object Lake {

  // ---- manifest-committed tables -----------------------------------
  //
  // The staged-swap family (`Newsmaper.overwriteRetained`, the
  // streaming fold) renames DIRECTORIES, which leaves a momentary
  // window where `path` is absent between the two renames — honest,
  // documented, but real for a concurrent reader. The lakehouse
  // answer is to never move data at all: a table ROOT holds immutable
  // versioned data dirs `v<N>` plus empty commit markers
  // `_commit_<N>`, and the COMMIT POINT is the atomic creation of one
  // new marker file. Readers resolve max committed N and read
  // `v<N>`; at every crash point of the write protocol that
  // resolution finds a complete, readable table:
  //
  //   1. crash mid-write of `v<N+1>`  -> no marker, readers stay on N
  //   2. crash after `v<N+1>` done, before marker -> same
  //   3. crash after marker, before prune -> readers see N+1; the
  //      stale version is pruned by the NEXT commit
  //
  // This is HDFSMetadataLog's protocol (public Spark), with the
  // marker BODY carrying the snapshot: the newline-separated list of
  // data dirs that compose version N. An OVERWRITE commit lists only
  // its own new dir; an APPEND commit lists the previous snapshot's
  // dirs plus its new one — so at 100 TB an append writes O(batch)
  // data and never rewrites the table, while readers still flip
  // between immutable snapshots atomically. Content-bearing markers
  // are committed by writing `_commit_<N>.tmp` and RENAMING it into
  // place — single-file rename is the atomic primitive on HDFS and
  // POSIX, so no reader ever sees a half-written manifest. (An empty
  // marker body is read as `[v<N>]` for back-compat with the
  // body-less overwrite-only protocol.) One writer per root (the same
  // single-writer contract as every sink here); `retain` keeps that
  // many SUPERSEDED snapshots so an in-flight reader of the previous
  // version survives a concurrent commit — the same reader-retention
  // lever as any lakehouse VACUUM horizon — and pruning deletes only
  // data dirs no retained snapshot references.

  private def fsFor(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
      r: Path): Seq[Long] =
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_commit_") && !n.endsWith(".tmp") =>
        n.stripPrefix("_commit_").toLongOption }
      .flatten.toSeq.sorted

  // Manifest body = newline-separated data-dir names, plus optional
  // `#`-prefixed metadata lines. `#schema=<DataType json>` records the
  // committed table schema: appends MERGE it (add-nullable-column
  // evolution) and readers pass it to the scan explicitly — which both
  // makes mixed-schema snapshots read correctly (files missing a
  // column yield NULLs) and skips footer-based schema inference
  // entirely (at 100 TB, one manifest read instead of a
  // list-and-read-footers job). Manifests written before this line
  // existed read as before (inferred schema).
  private val SchemaPrefix = "#schema="

  private def manifestBody(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Seq[String] = {
    val in = fs.open(new Path(r, s"_commit_$v"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    body.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def manifestDirs(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Seq[String] = {
    val dirs = manifestBody(fs, r, v).filterNot(_.startsWith("#"))
    if (dirs.isEmpty) Seq(s"v$v") else dirs // body-less back-compat
  }

  private def manifestSchema(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Option[org.apache.spark.sql.types.StructType] =
    manifestBody(fs, r, v).find(_.startsWith(SchemaPrefix))
      .map(l => org.apache.spark.sql.types.DataType
        .fromJson(l.stripPrefix(SchemaPrefix))
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  // `#rows=<n>` — the snapshot's exact row count, carried when the
  // writer knows it (a load counts its fresh rows anyway; an append
  // adds the batch to the previous snapshot's count; compaction is
  // row-preserving). Metadata-only `count(*)`: on a 100 TB table the
  // count answers from ONE manifest read instead of a full scan.
  // Absent when a writer could not know it cheaply (e.g. a merge with
  // deletes) — honesty over a counting job; the chain resumes at the
  // next counted commit.
  private val RowsPrefix = "#rows="

  private def manifestRows(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      v: Long): Option[Long] =
    manifestBody(fs, r, v).find(_.startsWith(RowsPrefix))
      .flatMap(_.stripPrefix(RowsPrefix).toLongOption)

  /** Highest committed version at `root` whose snapshot is fully
    * present, if any. Manifests referencing lost data dirs are
    * ignored defensively (cannot arise from the protocol — the
    * manifest is renamed in strictly after the data job completes and
    * pruning never touches referenced dirs — but a half-vacuumed root
    * must degrade, not throw). Validation walks DOWN from the highest
    * manifest and stops at the first fully-present snapshot, so the
    * normal-path cost is one manifest read + the live snapshot's dir
    * checks — not O(all versions) metadata RPCs per resolve. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    committedVersions(fs, r).reverseIterator
      .find(v => manifestDirs(fs, r, v).forall(d => fs.exists(new Path(r, d))))
  }

  /** Data-dir paths of the live snapshot — what readers scan. */
  def resolve(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    currentVersion(spark, root)
      .map(v => manifestDirs(fs, r, v).map(d => new Path(r, d).toString))
      .getOrElse(throw new java.util.NoSuchElementException(
        s"no committed table at $root"))
  }

  /** Committed versions whose snapshots are fully present — the
    * TIME-TRAVEL horizon, oldest first. Its breadth is the `retain`
    * lever: each commit keeps `retain` superseded snapshots readable,
    * so `retain = 7` on a daily overwrite gives a week of history. */
  def readableVersions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    committedVersions(fs, r)
      .filter(v => manifestDirs(fs, r, v).forall(d => fs.exists(new Path(r, d))))
  }

  /** TIME TRAVEL: the table contents as of snapshot `version` —
    * exactly what `readCommitted` returned while that version was
    * live, byte-identical, because snapshots are immutable: a commit
    * only ever ADDS a version dir, and pruning deletes strictly
    * outside the retention horizon. Versions carry their OWN schema
    * (see [[SchemaPrefix]]), so a snapshot from before a schema
    * evolution reads back with its original columns.
    *
    * Fails fast with the readable horizon when `version` was pruned
    * (or never committed) — the fix is a larger `retain` at commit
    * time, the same reader-retention lever as any lakehouse VACUUM
    * horizon. */
  def readCommittedAt(spark: SparkSession, root: String,
      version: Long): org.apache.spark.sql.DataFrame = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    def horizon = readableVersions(spark, root).mkString("[", ", ", "]")
    if (!fs.exists(new Path(r, s"_commit_$version")))
      throw new java.util.NoSuchElementException(
        s"version $version is not committed at $root (readable: $horizon) — " +
          "pruned past the retention horizon? Commit with a larger `retain` " +
          "to keep more history readable")
    val dirs = manifestDirs(fs, r, version)
    val missing = dirs.filterNot(d => fs.exists(new Path(r, d)))
    if (missing.nonEmpty)
      throw new java.util.NoSuchElementException(
        s"version $version at $root references lost data dirs " +
          s"${missing.mkString(", ")} (readable: $horizon)")
    val paths = dirs.map(d => new Path(r, d).toString)
    manifestSchema(fs, r, version) match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None    => spark.read.parquet(paths: _*)
    }
  }

  /** The live table contents (union of the snapshot's data dirs),
    * under the snapshot's committed schema when the manifest carries
    * one (schema-evolved appends read merged; no footer inference). */
  def readCommitted(spark: SparkSession, root: String) =
    readCommittedAt(spark, root, currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root")))

  /** Metadata-only exact `count(*)` of the live snapshot: one
    * manifest read, no scan — at 100 TB the difference between free
    * and a full-table job. None when the writer chain could not carry
    * the count (fall back to `readCommitted(...).count()`). */
  def countCommitted(spark: SparkSession, root: String): Option[Long] =
    currentVersion(spark, root)
      .flatMap(v => manifestRows(fsFor(spark, root), new Path(root), v))

  /** [[countCommitted]] for a time-travel version. */
  def countCommittedAt(spark: SparkSession, root: String, version: Long): Option[Long] = {
    val fs = fsFor(spark, root)
    if (!fs.exists(new Path(new Path(root), s"_commit_$version"))) None
    else manifestRows(fs, new Path(root), version)
  }

  /** Next safe version number: past EVERY committed marker, including
    * defensively-ignored ones whose data dirs are lost — such a
    * manifest still owns its number, and renaming a new manifest onto
    * an existing file fails on HDFS on every retry (a permanently
    * wedged writer). Same allocation rule as [[commitOverwrite]] /
    * [[commitAppend]]; package-private for the streaming fold. */
  private[graft] def nextVersion(spark: SparkSession, root: String): Long =
    committedVersions(fsFor(spark, root), new Path(root))
      .maxOption.map(_ + 1).getOrElse(0L)

  /** Re-create the `_applied_*` effectively-once markers found in
    * `fromDirs` inside `toDir` — maintenance ops (merge/compaction)
    * that REPLACE version dirs must carry the streaming folds'
    * replay-skip state forward, or a compacted stat table would
    * silently re-open to double-folds on the next checkpoint replay.
    * Markers are empty files; names are the state. */
  private def preserveMarkers(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      fromDirs: Seq[String], toDir: String): Unit =
    fromDirs.map(d => new Path(r, d)).filter(fs.exists)
      .flatMap(d => fs.listStatus(d).toSeq)
      .map(_.getPath.getName).distinct
      .filter(_.startsWith("_applied_"))
      .foreach(n => fs.create(new Path(new Path(r, toDir), n)).close())

  /** Merge a committed table schema with an incoming batch's: the
    * ADD-NULLABLE-COLUMN evolution every lakehouse needs in week one.
    * New columns append (nullable — old files lack them and read
    * NULL); a column the batch omits stays (nullable — the new files
    * read NULL for it); a column changing TYPE is refused loudly —
    * silent coercion corrupts every prior snapshot's reading of the
    * shared files. */
  private[graft] def mergeSchemas(
      base: org.apache.spark.sql.types.StructType,
      incoming: org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType = {
    val baseNames = base.fieldNames.toSet
    val kept = base.fields.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(g) =>
          require(g.dataType == f.dataType,
            s"schema evolution supports adding nullable columns only; " +
              s"'${f.name}' changes type ${f.dataType.simpleString} -> " +
              s"${g.dataType.simpleString}. Rewrite the table " +
              "(commitOverwrite) to change a column's type.")
          f.copy(nullable = f.nullable || g.nullable)
        case None => f.copy(nullable = true)
      }
    }
    val added = incoming.fields.filterNot(f => baseNames(f.name))
      .map(_.copy(nullable = true))
    org.apache.spark.sql.types.StructType(kept ++ added)
  }

  /** Commit `dirs` as snapshot `version` of `root`. Package-private:
    * the streaming fold pre-writes its own version dir (so its
    * applied-batch marker rides INSIDE the dir and commits atomically
    * with the data) and then calls this. */
  private[graft] def commitVersion(spark: SparkSession, root: String,
      version: Long, dirs: Seq[String], retain: Int,
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit =
    commitManifest(fsFor(spark, root), new Path(root), version, dirs, retain,
      schema)

  private def commitManifest(fs: org.apache.hadoop.fs.FileSystem, r: Path,
      version: Long, dirs: Seq[String], retain: Int,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      rows: Option[Long] = None): Unit = {
    val tmp = new Path(r, s"_commit_$version.tmp")
    val out = fs.create(tmp, true)
    val body = dirs ++ schema.map(s => SchemaPrefix + s.json) ++
      rows.map(n => RowsPrefix + n)
    try out.write(body.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(r, s"_commit_$version"))) // THE commit point
      throw new java.io.IOException(s"manifest rename failed for version $version")
    // prune snapshots beyond the retention horizon: markers first
    // (a crash mid-prune never leaves a committed manifest pointing
    // at deleted data — dirs go only after every manifest referencing
    // them), then sweep EVERY committed-range data dir no surviving
    // manifest references. Sweeping by reference, not by stale list,
    // also reclaims orphans from a PAST crash between a prune's
    // marker and dir deletions — they are referenced by no manifest
    // and could never be resurrected. A writer-in-progress dir is
    // never swept: its version exceeds every committed one.
    val all = committedVersions(fs, r)
    val (stale, kept) = all.splitAt(Math.max(0, all.length - 1 - retain))
    stale.foreach(v => fs.delete(new Path(r, s"_commit_$v"), false))
    val keptRefs = kept.flatMap(v => manifestDirs(fs, r, v)).toSet
    val maxV = all.lastOption.getOrElse(version)
    fs.listStatus(r).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .foreach { n =>
        if (n.startsWith("v") && !keptRefs.contains(n))
          n.stripPrefix("v").toLongOption.foreach { v =>
            if (v <= maxV) fs.delete(new Path(r, n), true)
          }
      }
  }

  /** Replace the table at `root` with `df`, committing via one atomic
    * manifest rename — no reader-visible gap at any crash point (see
    * protocol above). Returns the committed version. */
  def commitOverwrite(df: org.apache.spark.sql.DataFrame, root: String,
      retain: Int = 1, rowCount: Option[Long] = None): Long = {
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val r = new Path(root)
    // allocate past EVERY committed marker, not just the live one: a
    // defensively-ignored manifest (data dirs lost) still owns its
    // number, and renaming a new manifest onto it would fail forever
    val next = committedVersions(fs, r).maxOption.map(_ + 1).getOrElse(0L)
    // data first, completely; an interrupted write leaves an orphan
    // dir the next commit of the same version overwrites
    df.write.mode("overwrite").parquet(new Path(r, s"v$next").toString)
    commitManifest(fs, r, next, Seq(s"v$next"), retain, Some(df.schema), rowCount)
    next
  }

  /** Append `df` to the table at `root` WITHOUT rewriting it: the new
    * snapshot = the previous snapshot's dirs + one new O(batch) dir.
    * This is the lake form of the K1 append sink — at 100 TB the
    * nightly load writes only its batch, and readers still swap
    * snapshots atomically. First commit on an empty root bootstraps
    * the table. Returns the committed version. */
  def commitAppend(df: org.apache.spark.sql.DataFrame, root: String,
      retain: Int = 1, rowCount: Option[Long] = None): Long = {
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root)
    // number allocation vs committedVersions (see commitOverwrite);
    // the snapshot to extend is the LIVE one
    val next = committedVersions(fs, r).maxOption.map(_ + 1).getOrElse(0L)
    val prevDirs = cur.map(v => manifestDirs(fs, r, v)).getOrElse(Nil)
    // the committed schema evolves by MERGE (add-nullable-column; type
    // changes refused — see mergeSchemas). A legacy manifest without a
    // schema line infers its schema once here, so its first post-
    // upgrade append migrates the table to carried-schema reads.
    val prevSchema = cur.flatMap(v => manifestSchema(fs, r, v))
      .orElse(cur.map(v => spark.read.parquet(
        manifestDirs(fs, r, v).map(d => new Path(r, d).toString): _*).schema))
    val schema = prevSchema.map(mergeSchemas(_, df.schema)).getOrElse(df.schema)
    // the appended snapshot's count = previous + batch, when the
    // caller supplied the batch count AND the chain carried one
    // (bootstrap: the batch count alone)
    val rows = rowCount.flatMap { n =>
      cur match {
        case Some(v) => manifestRows(fs, r, v).map(_ + n)
        case None    => Some(n)
      }
    }
    df.write.mode("overwrite").parquet(new Path(r, s"v$next").toString)
    commitManifest(fs, r, next, prevDirs :+ s"v$next", retain, Some(schema), rows)
    next
  }

  /** Per-row MERGE INTO a committed table — the copy-on-write form of
    * [[graft.operators.Cdc.applyChanges]] (q99's oracle-checked
    * semantics), closing the reference's row-level DELETE/update gap
    * (/root/reference/dags/Main.py:44-47) at lake scale. Instead of
    * rewriting the whole table, the merge PROBES which snapshot dirs
    * actually hold touched keys (one map-only broadcast semi-join
    * over the base with `input_file_name` — the "find touched files"
    * pass every lakehouse MERGE runs) and rewrites ONLY those:
    *
    *   new snapshot = untouched dirs, REUSED BY REFERENCE
    *               + one new dir holding (touched dirs' surviving
    *                 rows) ∪ (the batch's winning upserts)
    *
    * At 100 TB under hourly append commits, a CDC batch touching
    * recent keys rewrites O(touched dirs), not the table; a
    * pure-insert batch touches nothing and degenerates to the
    * O(batch) append shape. Commit is the same one atomic manifest
    * rename — readers never see a half-merged table, retention keeps
    * the pre-merge snapshot for in-flight readers/time travel, and a
    * crash before the rename leaves only an orphan dir the retry
    * overwrites.
    *
    * `changes` = base schema + `deleteCol`; `guardVersions` as in
    * [[graft.operators.Cdc.applyChanges]]. Returns the committed
    * version (unchanged when the batch has no effective winners). */
  def mergeCommitted(spark: SparkSession, root: String,
      changes: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      versionCol: String, deleteCol: String,
      guardVersions: Boolean = false, retain: Int = 1): Long = {
    import org.apache.spark.sql.functions._
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed table at $root — bootstrap with commitOverwrite/commitAppend"))
    val snapDirs = manifestDirs(fs, r, cur)
    val base = readCommittedAt(spark, root, cur)
    val latest = graft.operators.Cdc.lastChanges(
      base, changes, keyCols, versionCol, deleteCol, guardVersions).persist()
    try {
      if (latest.isEmpty) return cur
      val touchedKeys = broadcast(latest.select(keyCols.map(col): _*))
      // one map-only probe: which files (→ dirs) hold touched keys.
      // The collected set is bounded by the snapshot's FILE count
      // (metadata-scale), never row count.
      val touchedDirNames: Set[String] = base
        .withColumn("__file", input_file_name())
        .join(touchedKeys, keyCols, "left_semi")
        .select(col("__file")).distinct()
        .collect().map(row => new Path(row.getString(0)).getParent.getName)
        .toSet
      val untouched = snapDirs.filterNot(touchedDirNames)
      val touchedDirs = snapDirs.filter(touchedDirNames)
      // no stored rows touched and nothing to insert → the table is
      // unchanged; skip the commit entirely. This is what makes a
      // crash-REPLAYED guarded batch version-stable: its upserts are
      // stale (guard-rejected) and its deletes find their keys
      // already gone (a delete of an absent key reaches here).
      if (touchedDirs.isEmpty &&
          latest.where(!coalesce(col(deleteCol), lit(false))).isEmpty)
        return cur
      val carried = manifestSchema(fs, r, cur)
      val touchedBase =
        if (touchedDirs.isEmpty) base.limit(0)
        else {
          val paths = touchedDirs.map(d => new Path(r, d).toString)
          carried match {
            case Some(s) => spark.read.schema(s).parquet(paths: _*)
            case None    => spark.read.parquet(paths: _*)
          }
        }
      // the applyChanges fold, scoped to the touched dirs' rows
      val rewritten = touchedBase
        .join(touchedKeys, keyCols, "left_anti")
        .unionByName(
          latest.where(!coalesce(col(deleteCol), lit(false))).drop(deleteCol))
      val next = committedVersions(fs, r).maxOption.map(_ + 1).getOrElse(0L)
      rewritten.write.mode("overwrite").parquet(new Path(r, s"v$next").toString)
      // replaced dirs may hold streaming-fold replay markers — carry
      // them into the replacement before the commit makes it live
      preserveMarkers(fs, r, touchedDirs, s"v$next")
      commitManifest(fs, r, next, untouched :+ s"v$next", retain,
        carried.orElse(Some(rewritten.schema)))
      next
    } finally { latest.unpersist(); () }
  }

  /** [[compact]] for a manifest-committed table: collapse the live
    * snapshot (append commits accumulate one dir per batch — the
    * small-files pathology in manifest form: readers pay listing +
    * open cost per dir) into ONE dir of size-targeted files,
    * committed through the same atomic rename. Row multiset and
    * carried schema unchanged; concurrent readers keep the pre-
    * compaction snapshot until retention passes. Converges like
    * [[compact]]: sizing uses current on-disk bytes. Returns the
    * committed version. */
  def compactCommitted(spark: SparkSession, root: String,
      targetBytes: Long = 128L * 1024 * 1024, retain: Int = 1): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val cur = currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed table at $root"))
    val liveDirs = manifestDirs(fs, r, cur)
    val total = liveDirs
      .flatMap(d => fs.listStatus(new Path(r, d)).toSeq)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    require(total > 0, s"no parquet data in the live snapshot at $root")
    val n = Math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val df = readCommittedAt(spark, root, cur).repartition(n)
    val next = committedVersions(fs, r).maxOption.map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(new Path(r, s"v$next").toString)
    // the collapsed snapshot replaces EVERY live dir — carry their
    // streaming-fold replay markers forward (see preserveMarkers)
    preserveMarkers(fs, r, liveDirs, s"v$next")
    // compaction is row-preserving: the previous count carries over
    commitManifest(fs, r, next, Seq(s"v$next"), retain, Some(df.schema),
      manifestRows(fs, r, cur))
    next
  }

  /** Number of parquet data files currently under `path`. */
  def dataFileCount(spark: SparkSession, path: String): Int =
    listDataFiles(spark, path).length

  private def listDataFiles(spark: SparkSession, path: String) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new Path(path)
    if (!fs.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
    else fs.listStatus(p).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite the table at `path` into `ceil(totalBytes / targetBytes)`
    * files (min 1) and swap the rewrite in. Row multiset is unchanged
    * — this is a layout-only operation. Returns the new file count.
    *
    * Sizing uses the CURRENT on-disk bytes, so compaction converges:
    * re-running on an already-compacted table plans the same file
    * count and rewrites nothing surprising. The repartition is
    * round-robin (no key): compaction must not assume a partition
    * column exists; co-location layouts belong to the bucketed-write
    * path, not the compactor. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val files = listDataFiles(spark, path)
    require(files.nonEmpty, s"no parquet table at $path")
    val total = files.map(_.getLen).sum
    val n = Math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    // the swap (staging write + .bak rename dance) is the SAME
    // crash-safety path the dedup repair uses — one definition
    graft.newsmaper.Newsmaper.overwriteRetained(
      spark.read.parquet(path).repartition(n), path)
    dataFileCount(spark, path)
  }
}
