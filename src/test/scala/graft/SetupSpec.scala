package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.newsmaper.{Newsmaper, Setup}

/** Seed sources (S4 CSV, S5 multiLine JSON), the one-shot seed writer
  * (O3), catalog DDL + VALUES seed (K4/K5), and the on-disk sinks
  * (K1 append with anti-join, K3 retained-rows overwrite). */
class SetupSpec extends SparkSpec {
  import spark.implicits._

  private def res(p: String): String = getClass.getResource(p).getPath

  test("readSourcesCsv: header CSV, explicit schema, dense surrogate ids (Setup.py:55-61)") {
    val out = Setup.readSourcesCsv(spark, res("/newsmaper/sources.csv"))
    assert(out.columns.toSeq === Seq("id", "name", "website", "rss"))
    val byName = out.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(byName.values.toSeq.sorted === Seq(1L, 2L, 3L)) // dense, SERIAL-like
    assert(byName("Demo Journal") === 1L)                  // name-ordered surrogate
  }

  test("readReferencesJson: multiLine JSON with nested words array (Transform.py:11)") {
    val out = Setup.readReferencesJson(spark, res("/newsmaper/references.json"))
    assert(out.schema("words").dataType === ArrayType(StringType))
    val words = out.where(col("id") === 44L)
      .select(explode(col("words"))).as[String].collect().toSet
    assert(words === Set("ukraine", "kiev", "guerre"))
  }

  test("seed writes sources/references/date parquet (O3, Setup.py:18-65)") {
    val dir = Files.createTempDirectory("graft-seed").toString
    Setup.seed(spark, res("/newsmaper/sources.csv"), res("/newsmaper/references.json"),
      dir, "2025-08-12 00:00:00", "2025-08-12 06:00:00")
    assert(spark.read.parquet(s"$dir/sources.parquet").count() === 3)
    assert(spark.read.parquet(s"$dir/references.parquet").count() === 2)
    // [start, end): 00,01,..,05 — the 06:00 endpoint belongs to the
    // NEXT range, so adjacent seeds can't emit a boundary hour twice
    assert(spark.read.parquet(s"$dir/date.parquet").count() === 6)
  }

  test("createCountries: DDL + VALUES seed, idempotent (K4/K5)") {
    try {
      Setup.createCountries(spark)
      Setup.createCountries(spark) // second call must not duplicate the seed
      assert(spark.table("countries").count() === 4)
    } finally spark.sql("DROP TABLE IF EXISTS countries")
  }

  test("loadTo appends only unseen natural keys; load ∘ load ≡ load (K1, Load.py:21-28)") {
    val path = Files.createTempDirectory("graft-load").toString + "/news.parquet"
    val batch = Seq(
      (44L, 1L, 12L, "t1", "l1", "d1", null.asInstanceOf[String]),
      (1L, 1L, 14L, "t2", "l2", "d2", null.asInstanceOf[String])
    ).toDF("id_country", "id_source", "id_date", "title", "link", "description", "media")
    assert(Newsmaper.loadTo(batch, path) === 2L)
    assert(Newsmaper.loadTo(batch, path) === 0L) // idempotent vs the on-disk base
    val more = batch.union(Seq(
      (2L, 1L, 15L, "t3", "l3", "d3", null.asInstanceOf[String])
    ).toDF("id_country", "id_source", "id_date", "title", "link", "description", "media"))
    assert(Newsmaper.loadTo(more, path) === 1L)  // only the genuinely new row
    assert(spark.read.parquet(path).count() === 3)
  }

  test("loadTo dedups within one batch: a key arriving twice appends once") {
    val path = Files.createTempDirectory("graft-load-intra").toString + "/news.parquet"
    val batch = Seq(
      (44L, 1L, 12L, "t1", "l1", "d1", null.asInstanceOf[String]),
      (45L, 1L, 12L, "t1", "l1b", "d1b", null.asInstanceOf[String]), // same natural key
      (1L, 1L, 14L, "t2", "l2", "d2", null.asInstanceOf[String])
    ).toDF("id_country", "id_source", "id_date", "title", "link", "description", "media")
    assert(Newsmaper.loadTo(batch, path) === 2L) // 2 distinct keys, not 3 rows
    assert(spark.read.parquet(path).count() === 2)
  }

  test("overwriteRetained swaps the repaired fact on disk (K3, Main.py:44-47)") {
    val path = Files.createTempDirectory("graft-repair").toString + "/news.parquet"
    Seq(
      (1L, 44L, 1L, 12L, "t", "l1", "d", null.asInstanceOf[String]),
      (2L, 44L, 1L, 12L, "t", "l2", "d", null.asInstanceOf[String]),
      (3L, 44L, 1L, 13L, "t", "l3", "d", null.asInstanceOf[String])
    ).toDF("id", "id_country", "id_source", "id_date", "title", "link", "description", "media")
      .write.parquet(path)
    val onDisk = spark.read.parquet(path)
    Newsmaper.overwriteRetained(Newsmaper.maintenance(onDisk), path)
    assert(rows(spark.read.parquet(path).select("id")) === Set(Seq(1L), Seq(3L)))
  }
}
