package graft

object DmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dmlprobe").toString
    graft.sources.Lake.commitOverwrite(
      Seq((1L, "a", 10.0), (250L, "fr", 20.0), (300L, "fr", 30.0), (500L, "d", 40.0))
        .toDF("k", "t", "v"), root)
    spark.sql("DROP TABLE IF EXISTS dml_probe")
    spark.sql(s"CREATE TABLE dml_probe USING `graft-lake` OPTIONS (root '$root')")
    try {
      spark.sql("DELETE FROM dml_probe WHERE k BETWEEN 200 AND 399 AND t = 'fr'")
      println("== OK rows=" + graft.sources.Lake.readCommitted(spark, root).count())
    } catch { case e: Throwable => e.printStackTrace() }
    spark.sql("DROP TABLE IF EXISTS dml_probe")
  }
}
