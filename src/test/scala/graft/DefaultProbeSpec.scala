package graft

import org.apache.spark.sql.types._

/** Scratch probe: does the vectorized parquet reader honor
  * EXISTS_DEFAULT metadata for columns missing from the file? */
class DefaultProbeSpec extends SparkSpec {
  import spark.implicits._

  test("EXISTS_DEFAULT fills missing columns per-file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-defprobe")
    val oldDir = dir.resolve("old").toString
    val newDir = dir.resolve("new").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "t").write.parquet(oldDir)
    Seq((3L, "c", Some(9.9)), (4L, "d", Option.empty[Double]))
      .toDF("k", "t", "score").write.parquet(newDir)
    val md = new MetadataBuilder()
      .putString("EXISTS_DEFAULT", "CAST(0.5 AS DOUBLE)")
      .putString("CURRENT_DEFAULT", "CAST(0.5 AS DOUBLE)")
      .build()
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("t", StringType),
      StructField("score", DoubleType, nullable = true, md)))
    val out = spark.read.schema(schema).parquet(oldDir, newDir)
      .select("k", "score").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    info(s"result: $out")
    assert(out(1L) === 0.5 && out(2L) === 0.5, "old files read the default")
    assert(out(3L) === 9.9, "new files read their value")
    assert(out(4L) === null, "explicit NULL stays NULL")
  }
}
