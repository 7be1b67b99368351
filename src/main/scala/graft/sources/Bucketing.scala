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
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
