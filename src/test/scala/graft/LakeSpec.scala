package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Small-files compaction: layout-only rewrite through the crash-safe
  * staged swap, row multiset untouched, file count actually drops. */
class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  test("compact merges a fragmented table without changing its rows") {
    val path = tmpTable("lake")
    val data = (1L to 5000L).map(i => (i, s"row $i")).toDF("id", "payload")
    // simulate many small load batches: 24 separate appends
    (0 until 24).foreach(b =>
      data.where(col("id") % 24 === b).write.mode("append").parquet(path))
    val before = Lake.dataFileCount(spark, path)
    assert(before >= 24)
    val after = Lake.compact(spark, path, targetBytes = 64L * 1024 * 1024)
    assert(after < before && after >= 1)
    val back = spark.read.parquet(path)
    assert(back.count() === 5000L)
    assert(rows(back) === rows(data))
    // the swap cleaned up after itself
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".bak")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path + ".staging")))
  }

  test("compaction converges: a second run keeps the same layout plan") {
    val path = tmpTable("lake2")
    (1L to 100L).toDF("id").write.parquet(path)
    val first = Lake.compact(spark, path, targetBytes = 64L * 1024 * 1024)
    val second = Lake.compact(spark, path, targetBytes = 64L * 1024 * 1024)
    assert(first === second)
    assert(spark.read.parquet(path).count() === 100L)
  }

  test("guards: empty/missing table and non-positive target are rejected") {
    intercept[IllegalArgumentException] {
      Lake.compact(spark, tmpTable("lake3"), targetBytes = 1024)
    }
    intercept[IllegalArgumentException] {
      Lake.compact(spark, "/tmp/nowhere-at-all", targetBytes = 0)
    }
  }
}
