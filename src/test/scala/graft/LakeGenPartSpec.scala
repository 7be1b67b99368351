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

  test("derivation safety: a non-NULL-preserving expression never derives IS NULL") {
    val root = tmpTable("graft-genpart-nullsafe")
    // coalesce(x, -1) is NOT NULL-preserving: the x-IS-NULL rows live
    // in the b = -1 dir, which `b IS NULL` derivation would wrongly
    // prune (there is no NULL dir at all) — SELECT/DELETE would
    // silently miss every NULL-source row
    val rows = Seq((1L, Some(5L)), (2L, Some(9L)), (3L, None), (4L, None))
      .toDF("id", "x")
    Lake.commitOverwrite(rows, root, retain = 8, partitionBy = Seq("b"),
      generatedColumns = Map("b" -> "coalesce(x, -1)"))
    assert(Lake.readCommittedWhere(spark, root, col("x").isNull)
      .select("id").collect().map(_.getLong(0)).toSet === Set(3L, 4L))
    // deleteWhere classifies through the same derivation — the NULL
    // rows must actually die, not be skipped as "no dir can match"
    Lake.deleteWhere(spark, root, col("x").isNull, retain = 8)
    assert(Lake.readCommitted(spark, root).count() === 2L)
    // EQUALITY still derives for coalesce (it is proven deterministic):
    // x = 5 implies b = coalesce(5, -1) = 5, pruning the other dirs
    val (_, skipEq, _) = Lake.resolveWhere(spark, root, col("x") === 5L)
    assert(skipEq.nonEmpty,
      "deterministic non-whitelist expressions should still derive equality")
    assert(Lake.readCommittedWhere(spark, root, col("x") === 5L)
      .count() === 1L)
  }

  test("derivation safety: a STRING source never derives ranges (lexical != temporal order)") {
    val root = tmpTable("graft-genpart-strsrc")
    // ' 2021-03-04' sorts lexically BEFORE '2020-1-5' (space < '2')
    // but parses to a LATER date: deriving `day <= to_date('2020-1-5')`
    // from `s < '2020-1-5'` would prune the dir holding the row that
    // lexically matches
    val rows = Seq((1L, "2020-1-5"), (2L, " 2021-03-04")).toDF("id", "s")
    Lake.commitOverwrite(rows, root, retain = 8, partitionBy = Seq("day"),
      generatedColumns = Map("day" -> "to_date(s)"))
    val hit = Lake.readCommittedWhere(spark, root, col("s") < "2020-1-5")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hit === Set(2L),
      s"lexical s < '2020-1-5' must return the 2021 row, got $hit")
    // equality on the string source still derives (to_date is
    // deterministic): one dir remains
    val (_, skipEq, _) = Lake.resolveWhere(spark, root,
      col("s") === "2020-1-5")
    assert(skipEq.size === 1)
  }

  test("derivation safety: a query-time-anchored expression derives nothing") {
    val root = tmpTable("graft-genpart-timeanchor")
    // datediff(current_date(), d) is Catalyst-"deterministic" but
    // anchored to the evaluating day: deriving equalities from it
    // would prune with values that drift from the written ones the
    // day after establishment — so it must derive NOTHING, ever
    val rows = Seq(
      (1L, java.sql.Date.valueOf("2020-01-01")),
      (2L, java.sql.Date.valueOf("2021-01-01"))).toDF("id", "d")
    Lake.commitOverwrite(rows, root, retain = 8, partitionBy = Seq("age"),
      generatedColumns = Map("age" -> "datediff(current_date(), d)"))
    val (_, skipped, _) = Lake.resolveWhere(spark, root,
      col("d") === java.sql.Date.valueOf("2020-01-01"))
    assert(skipped.isEmpty,
      s"time-anchored generation must not derive pruning, skipped $skipped")
    assert(Lake.readCommittedWhere(spark, root,
      col("d") === java.sql.Date.valueOf("2020-01-01")).count() === 1L)
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

  test("derivation safety: session-zone-anchored expressions over NON-timestamp sources derive only when zones match") {
    val root = tmpTable("graft-genpart-tzlong")
    // from_unixtime(x) over a LONG source evaluates in the session
    // zone — partition values materialized by a UTC writer differ
    // from what a UTC+14 reader would compute, so a cross-zone reader
    // deriving equality would prune dirs that hold matching rows.
    // (The old gate only fired for TimestampType sources.)
    val rows = Seq(
      (1L, 1700000000L), // 2023-11-14 22:13:20 UTC
      (2L, 1720000000L)  // 2024-07-03 09:46:40 UTC
    ).toDF("id", "x")
    Lake.commitOverwrite(rows, root, retain = 8, partitionBy = Seq("p"),
      generatedColumns = Map("p" -> "from_unixtime(x)"))
    // matching zone (UTC, the establishing one): equality derives
    val (_, skipSame, _) = Lake.resolveWhere(spark, root,
      col("x") === 1700000000L)
    assert(skipSame.nonEmpty,
      "same-zone reader should derive the generated equality")
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Pacific/Kiritimati") // UTC+14, no DST
      // mismatched zone: NO derivation (the expression is
      // zone-anchored), and the read stays CORRECT
      val (_, skipX, _) = Lake.resolveWhere(spark, root,
        col("x") === 1700000000L)
      assert(skipX.isEmpty,
        s"cross-zone reader must not derive zone-anchored equality, skipped $skipX")
      assert(Lake.readCommittedWhere(spark, root, col("x") === 1700000000L)
        .select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    } finally spark.conf.set(tzKey, saved)
    // zone-FREE non-whitelist expressions keep deriving cross-zone
    val zf = tmpTable("graft-genpart-tzfree")
    Lake.commitOverwrite(rows, root = zf, retain = 8,
      partitionBy = Seq("b"),
      generatedColumns = Map("b" -> "pmod(x, 7)"))
    try {
      spark.conf.set(tzKey, "Pacific/Kiritimati")
      val (_, skipB, _) = Lake.resolveWhere(spark, zf,
        col("x") === 1700000000L)
      assert(skipB.nonEmpty,
        "zone-free expression should still derive under a different session zone")
    } finally spark.conf.set(tzKey, saved)
  }

  test("a filter ON the generation expression itself prunes the generated partition key (year(ts) = Y -> y tuples)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-genpart-self").resolve("t").toString
    // NO stats on ts: the only pruning evidence is the generated
    // partition tuples — the filter names the EXPRESSION, not the key
    val df = Seq("1995-03-01 10:00:00", "1996-07-01 10:00:00",
      "1998-11-01 10:00:00").zipWithIndex.map { case (s, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(s)) }.toDF("k", "ts")
    Lake.commitOverwrite(df, root, retain = 8,
      partitionBy = Seq("y"),
      generatedColumns = Map("y" -> "year(ts)"))
    val (kept, skipped) = Lake.pruneDirs(spark, root,
      org.apache.spark.sql.functions.year(col("ts")) === 1996)
    assert(kept.size === 1 && skipped.size === 2,
      s"year(ts) must derive onto the generated key's tuples (kept=$kept)")
    assert(Lake.readCommittedWhere(spark, root,
      org.apache.spark.sql.functions.year(col("ts")) === 1996).count() === 1)
    // a mismatched session zone refuses the derivation (stored tuples
    // froze under the establishing zone) — pruning weakens, never lies
    val prevZone = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try assert(Lake.pruneDirs(spark, root,
      org.apache.spark.sql.functions.year(col("ts")) === 1996)._2.isEmpty)
    finally spark.conf.set("spark.sql.session.timeZone", prevZone)
  }

}
