package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Generated columns (`#genpart=`): declared once, materialized into
  * every batch, validated row-for-row when supplied, and — the point —
  * query conjuncts on the SOURCE column derive pruning conjuncts on
  * the generated PARTITION column, so `WHERE ts BETWEEN …` prunes a
  * `year(ts)`-partitioned table without the query ever naming the
  * partition key. */
class LakeGenPartSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  /** Orders-like fact: 40 rows per year over 1992..1998, dated
    * mid-year, partitioned by the GENERATED o_year = year(o_date). */
  private def genTable(): String = {
    val root = tmpTable("graft-genpart")
    val rows = for (y <- 1992 to 1998; i <- 0 until 40)
      yield (y * 1000L + i, java.sql.Date.valueOf(s"$y-0${1 + i % 9}-15"),
        (i * 7).toDouble)
    Lake.commitOverwrite(rows.toDF("id", "o_date", "amount"), root,
      retain = 8, partitionBy = Seq("o_year"),
      generatedColumns = Map("o_year" -> "year(o_date)"))
    root
  }

  test("materialization: omitted on write, present on read, inherited by appends") {
    val root = genTable()
    val r = Lake.readCommitted(spark, root)
    assert(r.columns.toSeq === Seq("id", "o_date", "amount", "o_year"))
    assert(r.where(col("id") === 1995003L).select("o_year").collect()
      .head.getInt(0) === 1995)
    // an APPEND inherits the declaration and materializes too
    Lake.commitAppend(
      Seq((1999000L, java.sql.Date.valueOf("1999-06-15"), 1.0))
        .toDF("id", "o_date", "amount"), root, retain = 8)
    assert(Lake.readCommitted(spark, root)
      .where(col("o_year") === 1999).count() === 1L)
    // SHOW PARTITIONS sees one partition per generated year
    assert(Lake.partitionValues(spark, root).count() === 8L)
  }

  test("derivation: a range on the SOURCE column prunes the generated partition dirs") {
    val root = genTable()
    // the query never names o_year — the engine derives it
    val p = col("o_date").between(
      java.sql.Date.valueOf("1995-01-01"), java.sql.Date.valueOf("1996-12-31"))
    val (_, skippedDirs, _) = Lake.resolveWhere(spark, root, p)
    assert(skippedDirs.size === 5,
      s"expected 5 of 7 year dirs derived away, skipped: $skippedDirs")
    assert(Lake.readCommittedWhere(spark, root, p).count() === 80L)
    // equality derives too
    val (_, skipEq, _) = Lake.resolveWhere(spark, root,
      col("o_date") === java.sql.Date.valueOf("1994-03-15"))
    assert(skipEq.size === 6, s"expected 6 of 7 skipped, got $skipEq")
    // and the SQL/FileIndex path prunes the same way (partition mode:
    // the scan's partitions shrink although the filter names o_date)
    Lake.registerSql(spark, "genpart_sql", root)
    val df = spark.sql(
      "SELECT id FROM genpart_sql WHERE o_date >= DATE'1998-01-01'")
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.head.metrics("numPartitions").value === 1L,
      "expected the derived conjunct to prune the listing to one dir")
    assert(df.count() === 40L)
  }

  test("a batch SUPPLYING the generated column must agree row-for-row") {
    val root = genTable()
    val bad = Seq((2000000L, java.sql.Date.valueOf("2000-06-15"), 1.0, 1234))
      .toDF("id", "o_date", "amount", "o_year")
    val e = intercept[IllegalArgumentException](
      Lake.commitAppend(bad, root, retain = 8))
    assert(e.getMessage.contains("gen_o_year"))
    // a CORRECT supplied copy commits
    Lake.commitAppend(
      Seq((2000000L, java.sql.Date.valueOf("2000-06-15"), 1.0, 2000))
        .toDF("id", "o_date", "amount", "o_year"), root, retain = 8)
    assert(Lake.readCommitted(spark, root)
      .where(col("o_year") === 2000).count() === 1L)
  }

  test("an UPDATE that breaks generation refuses; a consistent one commits") {
    val root = genTable()
    // moving o_date without recomputing o_year violates gen_o_year
    intercept[IllegalArgumentException](
      Lake.updateWhere(spark, root, col("id") === 1992000L,
        Map("o_date" -> lit(java.sql.Date.valueOf("1997-01-01")))))
    // updating BOTH consistently commits and the row changes partition
    Lake.updateWhere(spark, root, col("id") === 1992000L,
      Map("o_date" -> lit(java.sql.Date.valueOf("1997-01-01")),
        "o_year" -> lit(1997)))
    assert(Lake.readCommitted(spark, root)
      .where(col("id") === 1992000L).select("o_year").collect()
      .head.getInt(0) === 1997)
  }

  test("refusals: divergent re-declaration, rename/drop of source or generated column") {
    val root = genTable()
    intercept[IllegalArgumentException](Lake.commitAppend(
      Seq((1L, java.sql.Date.valueOf("1992-01-15"), 1.0))
        .toDF("id", "o_date", "amount"),
      root, retain = 8, generatedColumns = Map("o_year" -> "month(o_date)")))
    intercept[IllegalArgumentException](
      Lake.renameColumn(spark, root, "o_date", "order_date"))
    intercept[IllegalArgumentException](
      Lake.renameColumn(spark, root, "o_year", "yr"))
    intercept[IllegalArgumentException](Lake.dropColumn(spark, root, "o_date"))
    // an unrelated column still renames fine
    Lake.renameColumn(spark, root, "amount", "price")
    assert(Lake.readCommitted(spark, root).columns.contains("price"))
  }

  test("DataFrameWriter options: partitionBy + generated establish the layout") {
    val root = tmpTable("graft-genpart-writer")
    val rows = for (y <- 2010 to 2012; i <- 0 until 5)
      yield (y * 10L + i, java.sql.Date.valueOf(s"$y-03-0${1 + i}"))
    rows.toDF("id", "d").write.format("graft-lake")
      .option("root", root)
      .option("partitionBy", "y")
      .option("generated", "y:year(d)")
      .mode("overwrite").save()
    assert(Lake.partitionValues(spark, root).count() === 3L)
    val (_, skipped, _) = Lake.resolveWhere(spark, root,
      col("d") === java.sql.Date.valueOf("2011-03-02"))
    assert(skipped.size === 2)
    // appends through the writer inherit everything
    Seq((20130L, java.sql.Date.valueOf("2013-03-01"))).toDF("id", "d")
      .write.format("graft-lake").option("root", root)
      .mode("append").save()
    assert(Lake.readCommitted(spark, root)
      .where(col("y") === 2013).count() === 1L)
  }

  test("SQL CTAS with layout options: one statement creates a generated-partitioned lake table") {
    val root = tmpTable("graft-genpart-ctas")
    val rows = for (y <- 2020 to 2022; i <- 0 until 4)
      yield (y * 10L + i, java.sql.Date.valueOf(s"$y-0${1 + i}-10"))
    rows.toDF("id", "d").createOrReplaceTempView("ctas_src")
    spark.sql("DROP TABLE IF EXISTS genpart_ctas")
    spark.sql(
      s"""CREATE TABLE genpart_ctas USING `graft-lake`
         |OPTIONS (root '$root', partitionBy 'y', generated 'y:year(d)')
         |AS SELECT * FROM ctas_src""".stripMargin)
    assert(Lake.partitionValues(spark, root).count() === 3L)
    assert(spark.sql("SELECT count(*) FROM genpart_ctas")
      .collect().head.getLong(0) === 12L)
    // derivation prunes the catalog read's listing through the source
    val (_, skipped, _) = Lake.resolveWhere(spark, root,
      col("d") >= java.sql.Date.valueOf("2022-01-01"))
    assert(skipped.size === 2)
    spark.sql("DROP TABLE genpart_ctas")
  }

  test("restore across the establishing commit clears the declaration") {
    val root = tmpTable("graft-genpart-restore")
    Lake.commitOverwrite(
      Seq((1L, java.sql.Date.valueOf("1995-06-15"))).toDF("id", "d"),
      root, retain = 8)
    Lake.commitOverwrite(
      Seq((2L, java.sql.Date.valueOf("1996-06-15"))).toDF("id", "d"),
      root, retain = 8, partitionBy = Seq("y"),
      generatedColumns = Map("y" -> "year(d)"))
    Lake.restoreCommitted(spark, root, 0L, retain = 8)
    // a plain append no longer materializes y
    Lake.commitAppend(
      Seq((3L, java.sql.Date.valueOf("1997-06-15"))).toDF("id", "d"),
      root, retain = 8)
    assert(Lake.readCommitted(spark, root).columns.toSeq === Seq("id", "d"))
  }
}
