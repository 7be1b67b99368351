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
