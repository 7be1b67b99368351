package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the storage-side
  * answer to repeated large-fact joins: both tables hash-bucketed on
  * the join key into the same bucket count means the join needs NO
  * exchange at read time; at 100 TB that converts the dominant
  * shuffle of a fact-fact join into a bucket-wise local merge.
  *
  * This is the declarative cousin of `repartition`: the partitioning
  * is persisted with the data (catalog metadata), so EVERY downstream
  * join/aggregation on the bucket key skips its shuffle, not just the
  * next one. Bucket counts must match across join sides
  * (`spark.sql.sources.bucketing.enabled` is on by default).
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and in-file
    * sorted) on `bucketCol`. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(bucketCol), buckets)

  /** Composite-key form: bucket (and in-file sort) on all of
    * `bucketCols` — the layout for joins on a multi-column key, e.g.
    * an LSH band index probed on (band, bkey). Key order must match
    * the join's. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Hive-style partitioned layout — the OTHER half of the 100 TB
    * storage story next to bucketing: bucketing kills the join shuffle,
    * partitioning kills the scan. A filter on a partition column prunes
    * whole directories at PLANNING time, so a one-day query over a year
    * of date-partitioned facts lists and reads ~1/365th of the files —
    * the scan cost tracks the queried range, not the table size.
    *
    * Reference analog: the hour-grain calendar star schema
    * (/root/reference/dags/sql/date.sql:1-6) keys the fact by id_date;
    * partitioning by the date itself moves that selectivity from a join
    * predicate into the file listing.
    *
    * Partition columns should be LOW cardinality (a date, not a
    * timestamp): each value is a directory, and a high-cardinality
    * partition key degenerates into millions of tiny files — the
    * opposite of scan efficiency. Date + bucket-by-key is the standard
    * composed layout. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** The composed layout a real 100 TB fact actually uses: Hive-style
    * date partitions (scan prunes to the queried range at planning
    * time) AND hash buckets on the join key within each partition
    * (joins against same-bucketed tables need no exchange). One scan
    * gets both: a one-day query joining a keyed dimension reads 1/Nth
    * of the directories and shuffles nothing. */
  def writePartitionedBucketed(df: DataFrame, table: String,
      partitionCol: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partitionCol)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
