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
  // This is HDFSMetadataLog's protocol (public Spark) minus the
  // contents: the marker needs no body because data dirs are
  // versioned by name. One writer per root (the same single-writer
  // contract as every sink here); `retain` keeps that many SUPERSEDED
  // versions so an in-flight reader of the previous version survives
  // a concurrent commit — the same reader-retention lever as any
  // lakehouse VACUUM horizon.

  private def fsFor(spark: SparkSession, root: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  /** Highest committed version at `root`, if any. Markers without a
    * data dir are ignored defensively (cannot arise from the protocol
    * — the marker is created strictly after the data job completes —
    * but a half-vacuumed root must degrade, not throw). */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsFor(spark, root)
    val r = new Path(root)
    if (!fs.exists(r)) None
    else fs.listStatus(r).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_commit_") =>
        n.stripPrefix("_commit_").toLongOption }
      .flatten
      .filter(v => fs.exists(new Path(r, s"v$v")))
      .maxOption
  }

  /** Path of the live data dir — what readers scan. */
  def resolve(spark: SparkSession, root: String): String =
    currentVersion(spark, root)
      .map(v => new Path(root, s"v$v").toString)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"no committed table at $root"))

  /** The live table contents. */
  def readCommitted(spark: SparkSession, root: String) =
    spark.read.parquet(resolve(spark, root))

  /** Replace the table at `root` with `df`, committing via one atomic
    * marker-file creation — no reader-visible gap at any crash point
    * (see protocol above). Returns the committed version. */
  def commitOverwrite(df: org.apache.spark.sql.DataFrame, root: String,
      retain: Int = 1): Long = {
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val spark = df.sparkSession
    val fs = fsFor(spark, root)
    val r = new Path(root)
    val next = currentVersion(spark, root).map(_ + 1).getOrElse(0L)
    // data first, completely; an interrupted write leaves an orphan
    // dir the next commit of the same version overwrites
    df.write.mode("overwrite").parquet(new Path(r, s"v$next").toString)
    fs.create(new Path(r, s"_commit_$next")).close() // THE commit point
    // prune superseded versions beyond the retention horizon, marker
    // first (so a crash mid-prune never leaves a committed marker
    // pointing at deleted data)
    val stale = fs.listStatus(r).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("_commit_") =>
        n.stripPrefix("_commit_").toLongOption }
      .flatten.toSeq.sorted
      .dropRight(1 + retain)
    stale.foreach { v =>
      fs.delete(new Path(r, s"_commit_$v"), false)
      fs.delete(new Path(r, s"v$v"), true)
    }
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
