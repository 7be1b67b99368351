package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Column mapping (rename / drop as metadata): physical file names
  * freeze at column birth; RENAME and DROP are one-manifest-write
  * metadata operations (`#colmap=` / `#colretired=`); readers alias
  * physical→logical, writers rename logical→physical, and a re-added
  * column can never resurrect dropped bytes. */
class LakeColMapSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def liveDirs(root: String): Set[String] =
    Lake.resolve(spark, root)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet

  private def manifestLines(root: String, v: Long): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(root, s"_commit_$v"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  test("rename: one manifest write, dirs untouched, every read path serves the new name") {
    val root = tmpTable("graft-colmap-rename")
    val df = (1L to 100L).map(i => (i, s"v$i", i % 7)).toDF("id", "payload", "grp")
    Lake.commitOverwrite(df, root, retain = 8, statsCols = Seq("id"))
    val dirsBefore = liveDirs(root)
    val v = Lake.renameColumn(spark, root, "payload", "body")
    assert(v === 1L)
    // metadata-only: the dir set is EXACTLY the previous one
    assert(liveDirs(root) === dirsBefore)
    assert(manifestLines(root, v).exists(_.startsWith("#colmap=body:payload")))
    // plain read: new name, old values
    val r = Lake.readCommitted(spark, root)
    assert(r.columns.toSeq === Seq("id", "body", "grp"))
    assert(r.where(col("id") === 42L).select("body").collect()
      .map(_.getString(0)).toSeq === Seq("v42"))
    // predicate read (manifest pruning path)
    assert(Lake.readCommittedWhere(spark, root, col("id") === 7L)
      .select("body").collect().map(_.getString(0)).toSeq === Seq("v7"))
    // SQL temp-view read with a filter ON the renamed column
    Lake.registerSql(spark, "colmap_t1", root)
    assert(spark.sql("SELECT id FROM colmap_t1 WHERE body = 'v9'")
      .collect().map(_.getLong(0)).toSeq === Seq(9L))
    // time travel shows the OLD name at the old version
    assert(Lake.readCommittedAt(spark, root, 0L).columns.toSeq ===
      Seq("id", "payload", "grp"))
  }

  test("append after rename: new files store the FROZEN physical name; stats prune across both") {
    val root = tmpTable("graft-colmap-append")
    val a = (1L to 50L).map(i => (i, i * 10)).toDF("id", "amount")
    Lake.commitOverwrite(a, root, retain = 8, statsCols = Seq("id", "amount"))
    Lake.renameColumn(spark, root, "amount", "price")
    val b = (51L to 100L).map(i => (i, i * 10)).toDF("id", "price")
    Lake.commitAppend(b, root, retain = 8)
    val r = Lake.readCommitted(spark, root)
    assert(r.count() === 100L)
    // rows from BOTH file generations under one logical name
    assert(r.where(col("id").isin(1L, 100L)).select("price")
      .collect().map(_.getLong(0)).toSet === Set(10L, 1000L))
    // the stats line of the NEW dir is keyed by the physical name, so
    // range pruning on the renamed column prunes it
    val (_, skipped, _) = Lake.resolveWhere(spark, root, col("price") <= 100L)
    assert(skipped.nonEmpty, "expected the high-range dir pruned")
    assert(Lake.readCommittedWhere(spark, root, col("price") <= 100L)
      .count() === 10L)
  }

  test("drop + re-add: the re-added column never resurrects dropped bytes") {
    val root = tmpTable("graft-colmap-readd")
    val df = (1L to 20L).map(i => (i, s"secret$i")).toDF("id", "note")
    Lake.commitOverwrite(df, root, retain = 8)
    val dirsBefore = liveDirs(root)
    Lake.dropColumn(spark, root, "note")
    assert(liveDirs(root) === dirsBefore) // metadata-only
    assert(Lake.readCommitted(spark, root).columns.toSeq === Seq("id"))
    // re-add the same logical name by appending a batch that carries it
    Lake.commitAppend(Seq((21L, "fresh")).toDF("id", "note"), root, retain = 8)
    val r = Lake.readCommitted(spark, root)
    assert(r.columns.toSeq === Seq("id", "note"))
    val old = r.where(col("id") <= 20L).select("note")
      .collect().map(r0 => Option(r0.getString(0)))
    assert(old.forall(_.isEmpty),
      s"dropped bytes resurrected: ${old.flatten.take(3).mkString(", ")}")
    assert(r.where(col("id") === 21L).select("note").collect()
      .head.getString(0) === "fresh")
    // the physical name is retired in the manifest
    val v = Lake.currentVersion(spark, root).get
    assert(manifestLines(root, v).exists(_.startsWith("#colretired=note")))
    assert(manifestLines(root, v).exists(l =>
      l.startsWith("#colmap=note:note_r")))
  }

  test("partition-column rename: pruning, partitionValues, and partitioned appends keep working") {
    val root = tmpTable("graft-colmap-part")
    val rows = for (y <- 2001L to 2005L; i <- 0 until 10)
      yield (y * 100 + i, y)
    Lake.commitOverwrite(rows.toDF("id", "y"), root, retain = 8,
      partitionBy = Seq("y"))
    Lake.renameColumn(spark, root, "y", "year")
    // partition pruning on the LOGICAL name
    val (_, skippedDirs, _) =
      Lake.resolveWhere(spark, root, col("year") === 2003L)
    assert(skippedDirs.size === 4, s"expected 4 of 5 dirs pruned: $skippedDirs")
    // partitioned append names the partition column LOGICALLY
    Lake.commitAppend(Seq((200600L, 2006L)).toDF("id", "year"), root,
      retain = 8, partitionBy = Seq("year"))
    assert(Lake.readCommitted(spark, root).count() === 51L)
    // SHOW PARTITIONS reports the logical name
    val pv = Lake.partitionValues(spark, root)
    assert(pv.columns.toSeq === Seq("year", "n_dirs"))
    assert(pv.count() === 6L)
    // partition-schema SQL reads prune on the logical name too
    Lake.registerSql(spark, "colmap_part", root)
    assert(spark.sql("SELECT count(*) FROM colmap_part WHERE year = 2006")
      .collect().head.getLong(0) === 1L)
  }

  test("DML and maintenance after rename: delete, update, merge, compact, z-order") {
    val root = tmpTable("graft-colmap-dml")
    val df = (1L to 200L).map(i => (i, i % 10, s"p$i", 0L))
      .toDF("id", "bucket", "payload", "v")
    Lake.commitOverwrite(df, root, retain = 8, statsCols = Seq("id"))
    Lake.renameColumn(spark, root, "bucket", "grp")
    // COW delete on the renamed column (dvMaxRows=0 forces the rewrite)
    Lake.deleteWhere(spark, root, col("grp") === 3L, dvMaxRows = 0L)
    assert(Lake.readCommitted(spark, root).count() === 180L)
    // DV delete on the renamed column
    Lake.deleteWhere(spark, root, col("grp") === 4L)
    assert(Lake.readCommitted(spark, root).count() === 160L)
    // update SET on the renamed column
    Lake.updateWhere(spark, root, col("grp") === 5L,
      Map("grp" -> lit(50L)))
    val g = Lake.readCommitted(spark, root).groupBy("grp").count()
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    assert(!g.contains(3L) && !g.contains(4L) && !g.contains(5L))
    assert(g(50L) === 20L)
    // merge upserts through the logical schema
    Lake.mergeCommitted(spark, root,
      Seq((1L, 99L, "updated", 1L, false),
        (9999L, 0L, "inserted", 1L, false))
        .toDF("id", "grp", "payload", "v", "del"),
      keyCols = Seq("id"), versionCol = "v", deleteCol = "del")
    val merged = Lake.readCommitted(spark, root)
    assert(merged.where(col("id") === 1L).select("grp").collect()
      .head.getLong(0) === 99L)
    assert(merged.where(col("id") === 9999L).count() === 1L)
    // compact and z-order materialize under the frozen physical names
    Lake.compactCommitted(spark, root)
    Lake.clusterCommitted(spark, root, Seq("id", "grp"))
    val after = Lake.readCommitted(spark, root)
    assert(after.columns.toSeq === Seq("id", "grp", "payload", "v"))
    assert(after.count() === 161L)
    assert(after.where(col("id") === 1L).select("payload").collect()
      .head.getString(0) === "updated")
  }

  test("restore across a rename restores the old names; clone carries the map") {
    val root = tmpTable("graft-colmap-restore")
    Lake.commitOverwrite((1L to 10L).map(i => (i, i * 2)).toDF("id", "twice"),
      root, retain = 8)
    Lake.renameColumn(spark, root, "twice", "doubled")
    Lake.commitAppend(Seq((11L, 22L)).toDF("id", "doubled"), root, retain = 8)
    // restore to v0: the OLD name comes back
    Lake.restoreCommitted(spark, root, 0L, retain = 8)
    val r = Lake.readCommitted(spark, root)
    assert(r.columns.toSeq === Seq("id", "twice"))
    assert(r.count() === 10L)
    // clone the RENAMED version: the map travels
    Lake.renameColumn(spark, root, "twice", "doubled")
    val cl = tmpTable("graft-colmap-clone")
    Lake.cloneCommitted(spark, root, cl)
    val c = Lake.readCommitted(spark, cl)
    assert(c.columns.toSeq === Seq("id", "doubled"))
    assert(c.where(col("id") === 5L).select("doubled").collect()
      .head.getLong(0) === 10L)
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN on a catalog table, reads and writes follow") {
    val root = tmpTable("graft-colmap-sql")
    Lake.commitOverwrite(
      (1L to 30L).map(i => (i, s"t$i", i % 3)).toDF("id", "title", "cat"),
      root, retain = 8, statsCols = Seq("id"))
    spark.sql("DROP TABLE IF EXISTS colmap_sql")
    spark.sql(s"CREATE TABLE colmap_sql USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("ALTER TABLE colmap_sql RENAME COLUMN title TO headline")
    // catalog SELECT resolves the NEW name, with a filter pushed on it
    assert(spark.sql(
      "SELECT id FROM colmap_sql WHERE headline = 't7'")
      .collect().map(_.getLong(0)).toSeq === Seq(7L))
    assert(spark.sql("SELECT * FROM colmap_sql").columns.toSeq ===
      Seq("id", "headline", "cat"))
    // SQL INSERT after the rename stages under the frozen physical name
    spark.sql("INSERT INTO colmap_sql VALUES (31, 't31', 1)")
    assert(spark.sql(
      "SELECT headline FROM colmap_sql WHERE id = 31")
      .collect().head.getString(0) === "t31")
    assert(spark.sql("SELECT count(*) FROM colmap_sql")
      .collect().head.getLong(0) === 31L)
    // SQL DML on the renamed column
    spark.sql("DELETE FROM colmap_sql WHERE headline = 't1'")
    assert(spark.sql("SELECT count(*) FROM colmap_sql")
      .collect().head.getLong(0) === 30L)
    // DROP COLUMN is metadata-only and the catalog read follows
    val dirsBefore = liveDirs(root)
    spark.sql("ALTER TABLE colmap_sql DROP COLUMN cat")
    assert(liveDirs(root) === dirsBefore)
    assert(spark.sql("SELECT * FROM colmap_sql").columns.toSeq ===
      Seq("id", "headline"))
    spark.sql("DROP TABLE colmap_sql")
  }

  test("ADD COLUMN: metadata-only, NULL on existing rows, collision-safe after a drop") {
    val root = tmpTable("graft-colmap-addcol")
    Lake.commitOverwrite((1L to 10L).map(i => (i, s"v$i")).toDF("id", "a"),
      root, retain = 8)
    val dirsBefore = liveDirs(root)
    // Scala API
    Lake.addColumns(spark, root, Seq("score" ->
      org.apache.spark.sql.types.DoubleType))
    assert(liveDirs(root) === dirsBefore)
    val r = Lake.readCommitted(spark, root)
    assert(r.columns.toSeq === Seq("id", "a", "score"))
    assert(r.where(col("score").isNotNull).count() === 0L)
    // a later batch supplies it
    Lake.commitAppend(Seq((11L, "v11", 0.5)).toDF("id", "a", "score"),
      root, retain = 8)
    assert(Lake.readCommitted(spark, root)
      .where(col("score") === 0.5).count() === 1L)
    // drop then RE-ADD via SQL: fresh physical name, no resurrection
    Lake.dropColumn(spark, root, "a")
    spark.sql("DROP TABLE IF EXISTS addcol_t")
    spark.sql(s"CREATE TABLE addcol_t USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("ALTER TABLE addcol_t ADD COLUMN a STRING")
    assert(spark.sql("SELECT a FROM addcol_t WHERE a IS NOT NULL")
      .count() === 0L, "dropped bytes must not resurrect through ADD COLUMN")
    // refusals: duplicate, NOT NULL (DEFAULT is SUPPORTED since
    // round 16 — LakeDefaultSpec owns that surface)
    intercept[Exception](
      spark.sql("ALTER TABLE addcol_t ADD COLUMN id BIGINT"))
    intercept[Exception](
      spark.sql("ALTER TABLE addcol_t ADD COLUMN nn BIGINT NOT NULL"))
    spark.sql("DROP TABLE addcol_t")
  }

  test("streaming a pre-mapped table: the pinned schema serves both file generations") {
    val root = tmpTable("graft-colmap-stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-colmap-stream-ckpt").toString
    Lake.commitAppend(Seq((1L, 10L)).toDF("id", "amount"), root, retain = 8)
    Lake.renameColumn(spark, root, "amount", "price")
    // a post-rename append: its files store the FROZEN physical name
    Lake.commitAppend(Seq((2L, 20L)).toDF("id", "price"), root, retain = 8)
    val sink = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val df = spark.readStream.format("graft-lake").option("root", root).load()
    assert(df.columns.toSeq === Seq("id", "price"))
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = batch.collect().map(_.toSeq)
        sink.synchronized { sink ++= got }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sink.toSet === Set(Seq(1L, 10L), Seq(2L, 20L)))
  }

  test("refusals: constraints, layout columns, duplicates, change feed across a rename") {
    val root = tmpTable("graft-colmap-refuse")
    Lake.commitOverwrite((1L to 10L).map(i => (i, i % 3)).toDF("id", "k"),
      root, retain = 8, partitionBy = Seq("k"))
    Lake.addCheckConstraint(spark, root, "id_pos", "id > 0")
    // rename/drop of a constraint-referenced column refuses
    intercept[IllegalArgumentException](
      Lake.renameColumn(spark, root, "id", "ident"))
    intercept[IllegalArgumentException](Lake.dropColumn(spark, root, "id"))
    // dropping a partition column refuses
    intercept[IllegalArgumentException](Lake.dropColumn(spark, root, "k"))
    // renaming onto an existing name refuses
    intercept[IllegalArgumentException](
      Lake.renameColumn(spark, root, "k", "id"))
    // the change feed refuses to cross a rename silently
    val vBefore = Lake.currentVersion(spark, root).get
    Lake.renameColumn(spark, root, "k", "kk")
    Lake.commitAppend(Seq((11L, 0L)).toDF("id", "kk"), root, retain = 8)
    val vAfter = Lake.currentVersion(spark, root).get
    intercept[IllegalArgumentException](
      Lake.changesBetween(spark, root, vBefore, vAfter, Seq("id")).collect())
    // but a span that does not cross the rename still works
    assert(Lake.changesBetween(spark, root, vBefore + 1, vAfter, Seq("id"))
      .count() === 1L)
  }

  test("nested statsCols + blooms: struct-field ranges prune dirs, and survive a container rename") {
    val root = tmpTable("graft-nested-stats")
    // four appends with DISJOINT meta.v ranges and distinct meta.tag
    (0 until 4).foreach { b =>
      val df = (1L to 50L).map(i => (b * 100L + i, (s"s$b", b * 100.0 + i)))
        .toDF("id", "meta")
        .select(col("id"), col("meta").cast("struct<tag:string,v:double>"))
      Lake.commitAppend(df, root, retain = 8,
        statsCols = Seq("meta.v"), bloomCols = Seq("meta.tag"))
      ()
    }
    // range predicate on the NESTED field prunes to the one dir whose
    // recorded [lo, hi] can match
    val (_, skipped, _) = Lake.resolveWhere(spark, root, col("meta.v") > 250.0)
    assert(skipped.size === 3, s"expected 3 of 4 dirs skipped, got $skipped")
    assert(Lake.readCommittedWhere(spark, root, col("meta.v") > 250.0)
      .count() === 50L)
    // bloom on the nested STRING field prunes equality lookups
    val (_, skipEq, _) = Lake.resolveWhere(spark, root, col("meta.tag") === "s2")
    assert(skipEq.size === 3, s"expected bloom pruning, skipped $skipEq")
    // renaming the CONTAINER keeps the stats keys valid: they are
    // recorded under the frozen PHYSICAL path, and logical predicates
    // translate their head segment before the lookup
    Lake.renameColumn(spark, root, "meta", "m")
    val (_, skipRenamed, _) = Lake.resolveWhere(spark, root, col("m.v") > 250.0)
    assert(skipRenamed.size === 3,
      s"nested pruning must survive the rename, skipped $skipRenamed")
    assert(Lake.readCommittedWhere(spark, root, col("m.v") > 250.0)
      .count() === 50L)
    // correctness floor: a predicate matching two dirs reads both
    assert(Lake.readCommittedWhere(spark, root, col("m.v") > 150.0)
      .count() === 100L)
    // CHECK constraints gate NESTED fields too: existing rows
    // validate, a violating batch refuses by name
    Lake.addCheckConstraint(spark, root, "v_nonneg", "m.v >= 0")
    val e = intercept[IllegalArgumentException] {
      Lake.commitAppend(
        Seq((9999L, ("bad", -1.0))).toDF("id", "m")
          .select(col("id"), col("m").cast("struct<tag:string,v:double>")),
        root, retain = 8)
    }
    assert(e.getMessage.contains("v_nonneg"))
  }

  test("nested fields: struct column through rename, filtered scan pushes the PHYSICAL path") {
    val root = tmpTable("graft-colmap-nested")
    val rows = (1L to 200L).map(i =>
      (i, (if (i % 3 == 0) "click" else "view", i * 0.01)))
      .toDF("id", "meta")
      .select(col("id"), col("meta").cast("struct<etype:string,v:double>"))
    Lake.commitOverwrite(rows, root, retain = 8, statsCols = Seq("id"))
    val preDirs = liveDirs(root)
    // rename the STRUCT CONTAINER: metadata-only like any rename
    Lake.renameColumn(spark, root, "meta", "m")
    assert(liveDirs(root) === preDirs)
    // appends under the new logical name stage under the frozen
    // physical name; both file generations serve one logical column
    Lake.commitAppend(
      Seq((201L, ("click", 9.0))).toDF("id", "m")
        .select(col("id"), col("m").cast("struct<etype:string,v:double>")),
      root, retain = 8)
    // a NESTED predicate under the new name answers exactly…
    val df = Lake.readCommitted(spark, root)
      .where(col("m.etype") === "click" && col("m.v") > 0.5)
    val got = df.select("id").collect().map(_.getLong(0)).toSet
    assert(got === ((51L to 200L).filter(_ % 3 == 0).toSet + 201L))
    // …and the scan PUSHES the nested filter at all (the display
    // shows LOGICAL names; the physical translation happens below,
    // inside buildReaderWithPartitionValues)…
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("m.etype"),
      s"nested filter did not reach the scan: $pushed")
    // …and the TRANSLATION maps the head segment to the physical
    // container so the parquet reader (which sees file schema `meta`)
    // keeps row-group skipping — an untranslated `m.etype` would be
    // silently dropped at filter-conversion time
    import org.apache.spark.sql.sources
    val fmt = new graft.sources.MappedParquetFileFormat(Map("m" -> "meta"))
    assert(fmt.physFilter(sources.EqualTo("m.etype", "click")) ===
      Some(sources.EqualTo("meta.etype", "click")))
    assert(fmt.physFilter(sources.GreaterThan("m.v", 0.5)) ===
      Some(sources.GreaterThan("meta.v", 0.5)))
    // polarity: under NOT an AND must translate whole — a weakened
    // subtree would come back STRONGER and skip matching row groups
    assert(fmt.physFilter(sources.Not(sources.And(
      sources.EqualTo("m.etype", "click"),
      sources.AlwaysTrue()))) ===
      Some(sources.Not(sources.And(
        sources.EqualTo("meta.etype", "click"), sources.AlwaysTrue()))))
    // nested DML assignment works through the struct rewrite — the
    // sibling field survives and unmatched rows are untouched (the
    // dedicated nested-add/UPDATE test covers the full contract).
    // CREATE TABLE (live resolution), not registerSql (pinned view).
    spark.sql("DROP TABLE IF EXISTS colmap_nested")
    spark.sql(
      s"CREATE TABLE colmap_nested USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("UPDATE colmap_nested SET m.etype = 'x' WHERE id = 1")
    assert(spark.sql("SELECT m.etype FROM colmap_nested WHERE id = 1")
      .collect().head.getString(0) === "x")
    assert(spark.sql(
      "SELECT count(*) FROM colmap_nested WHERE m.etype = 'x'")
      .collect().head.getLong(0) === 1L)
    spark.sql("DROP TABLE IF EXISTS colmap_nested")
  }

  test("nested ADD COLUMN + nested UPDATE SET: schema commit, NULL backfill, struct rewrite") {
    import org.apache.spark.sql.types._
    val root = tmpTable("graft-colmap-nestadd")
    // generation 1: struct meta(etype, v)
    Lake.commitOverwrite(
      Seq((1L, "click", 0.4), (2L, "view", 0.9)).toDF("id", "etype", "v")
        .select(col("id"), struct(col("etype"), col("v")).as("meta")),
      root, retain = 8)
    val preDirs = Lake.resolve(spark, root).toSet
    // programmatic nested add: one manifest write, dirs untouched
    Lake.addNestedColumn(spark, root, Seq("meta", "score"), DoubleType)
    assert(Lake.resolve(spark, root).toSet === preDirs)
    val df = Lake.readCommitted(spark, root)
    val metaT = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(metaT.fieldNames.toSeq === Seq("etype", "v", "score"))
    // old files read the new field NULL
    assert(rows(df.select(col("id"), col("meta.score"))) ===
      Set(Seq(1L, null), Seq(2L, null)))
    // generation 2 writes it
    Lake.commitAppend(
      Seq((3L, "click", 0.7, 0.5)).toDF("id", "etype", "v", "score")
        .select(col("id"),
          struct(col("etype"), col("v"), col("score")).as("meta")),
      root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root)
      .select(col("id"), col("meta.score"))) ===
      Set(Seq(1L, null), Seq(2L, null), Seq(3L, 0.5)))
    // SQL: nested add + nested UPDATE (multiple fields, one statement)
    spark.sql("DROP TABLE IF EXISTS nestadd_sql")
    spark.sql(s"CREATE TABLE nestadd_sql USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("ALTER TABLE nestadd_sql ADD COLUMN meta.tag STRING")
    spark.sql("UPDATE nestadd_sql SET meta.score = 9.9, meta.tag = 'hot' " +
      "WHERE meta.etype = 'click'")
    val out = spark.sql(
      "SELECT id, meta.etype, meta.v, meta.score, meta.tag " +
        "FROM nestadd_sql ORDER BY id")
    assert(orderedRows(out) === Seq(
      Seq(1L, "click", 0.4, 9.9, "hot"),
      Seq(2L, "view", 0.9, null, null),
      Seq(3L, "click", 0.7, 9.9, "hot")))
    // absent nested path refuses — never silently adds a field
    // (Spark's own resolution catches it at FIELD_NOT_FOUND; the
    // command's fieldPathExists guard backstops any path that slips
    // through resolution)
    assert(intercept[Exception] {
      spark.sql("UPDATE nestadd_sql SET meta.nope = 1 WHERE id = 1")
    }.getMessage.matches("(?s).*(FIELD_NOT_FOUND|absent nested field).*"))
    // conflicting whole-column + nested assignment refuses
    intercept[Exception] {
      spark.sql("UPDATE nestadd_sql SET meta = named_struct('etype', 'x', " +
        "'v', 0.0, 'score', 0.0, 'tag', 'y'), meta.tag = 'z' WHERE id = 1")
    }
    // plain UPDATE still works alongside
    spark.sql("UPDATE nestadd_sql SET id = 20 WHERE id = 2")
    assert(spark.sql("SELECT count(*) FROM nestadd_sql WHERE id = 20")
      .collect().head.getLong(0) === 1L)
    // refusals: non-struct / missing container, existing leaf
    intercept[IllegalArgumentException] {
      Lake.addNestedColumn(spark, root, Seq("id", "x"), IntegerType)
    }
    intercept[IllegalArgumentException] {
      Lake.addNestedColumn(spark, root, Seq("ghost", "x"), IntegerType)
    }
    intercept[IllegalArgumentException] {
      Lake.addNestedColumn(spark, root, Seq("meta", "etype"), StringType)
    }
    // MERGE with a nested UPDATE SET composes the same struct rewrite
    spark.sql("CREATE OR REPLACE TEMP VIEW nest_src AS " +
      "SELECT 3L AS id, 0.55D AS nv UNION ALL SELECT 77L, 0.1D")
    spark.sql("MERGE INTO nestadd_sql t USING nest_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET meta.v = s.nv, meta.tag = 'merged' " +
      "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)")
    assert(orderedRows(spark.sql(
      "SELECT id, meta.v, meta.tag FROM nestadd_sql WHERE id IN (3, 77) " +
        "ORDER BY id")) === Seq(Seq(3L, 0.55, "merged"), Seq(77L, null, null)))
    // absent nested MERGE target refuses before anything commits
    assert(intercept[Exception] {
      spark.sql("MERGE INTO nestadd_sql t USING nest_src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET meta.ghost = 1")
    }.getMessage.matches("(?s).*(FIELD_NOT_FOUND|absent nested field).*"))
    spark.sql("DELETE FROM nestadd_sql WHERE id = 77")
    // nested UPDATE through a RENAMED container (column mapping)
    spark.sql("ALTER TABLE nestadd_sql RENAME COLUMN meta TO m")
    spark.sql("UPDATE nestadd_sql SET m.tag = 'cold' WHERE m.etype = 'view'")
    assert(spark.sql("SELECT m.tag FROM nestadd_sql WHERE id = 20")
      .collect().head.getString(0) === "cold")
    spark.sql("DROP TABLE nestadd_sql")
  }

  test("CHECK constraints on NESTED fields: gate writes, block container rename/drop while referenced") {
    val root = tmpTable("graft-colmap-nestcheck")
    Lake.commitOverwrite(
      Seq((1L, "click", 0.4)).toDF("id", "etype", "v")
        .select(col("id"), struct(col("etype"), col("v")).as("meta")),
      root, retain = 8)
    Lake.addCheckConstraint(spark, root, "v_range", "meta.v BETWEEN 0 AND 1")
    // violating batch refuses naming the constraint; clean one lands
    val bad = Seq((2L, "view", 1.5)).toDF("id", "etype", "v")
      .select(col("id"), struct(col("etype"), col("v")).as("meta"))
    assert(intercept[IllegalArgumentException] {
      Lake.commitAppend(bad, root, retain = 8)
    }.getMessage.contains("v_range"))
    Lake.commitAppend(
      Seq((2L, "view", 0.9)).toDF("id", "etype", "v")
        .select(col("id"), struct(col("etype"), col("v")).as("meta")),
      root, retain = 8)
    assert(Lake.readCommitted(spark, root).count() === 2L)
    // a nested UPDATE that breaks the constraint refuses too
    spark.sql("DROP TABLE IF EXISTS nestcheck_sql")
    spark.sql(
      s"CREATE TABLE nestcheck_sql USING `graft-lake` OPTIONS (root '$root')")
    assert(intercept[Exception] {
      spark.sql("UPDATE nestcheck_sql SET meta.v = 2.0 WHERE id = 1")
    }.getMessage.contains("v_range"))
    spark.sql("UPDATE nestcheck_sql SET meta.v = 0.95 WHERE id = 1")
    assert(spark.sql("SELECT meta.v FROM nestcheck_sql WHERE id = 1")
      .collect().head.getDouble(0) === 0.95)
    // renaming/dropping the referenced CONTAINER refuses while the
    // constraint stands; after dropping it, the rename goes through
    intercept[IllegalArgumentException] {
      Lake.renameColumn(spark, root, "meta", "m")
    }
    Lake.dropCheckConstraint(spark, root, "v_range")
    Lake.renameColumn(spark, root, "meta", "m")
    assert(Lake.readCommitted(spark, root).columns.toSeq === Seq("id", "m"))
    spark.sql("DROP TABLE IF EXISTS nestcheck_sql")
  }

  test("ALTER COLUMN TYPE: lossless widen is metadata-only, old files read upcast, lossy refuses") {
    import org.apache.spark.sql.types._
    val root = tmpTable("graft-colmap-widen")
    // generation 1: INT n
    Lake.commitOverwrite(
      Seq((1L, 10), (2L, 20)).toDF("k", "n"), root, retain = 8,
      statsCols = Seq("k"))
    val preDirs = Lake.resolve(spark, root).toSet
    val v = Lake.alterColumnType(spark, root, "n", LongType)
    // metadata-only: same dirs, one new version
    assert(Lake.resolve(spark, root).toSet === preDirs)
    assert(Lake.currentVersion(spark, root).get === v)
    val widened = Lake.readCommitted(spark, root)
    assert(widened.schema("n").dataType === LongType)
    // old INT files read UPCAST, exactly
    assert(rows(widened) === Set(Seq(1L, 10L), Seq(2L, 20L)))
    // generation 2 appends LONG values beyond the int range
    Lake.commitAppend(Seq((3L, 5000000000L)).toDF("k", "n"), root,
      retain = 8)
    assert(rows(Lake.readCommitted(spark, root)) ===
      Set(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 5000000000L)))
    // idempotent no-op: same type returns the live version, no commit
    val curV = Lake.currentVersion(spark, root).get
    assert(Lake.alterColumnType(spark, root, "n", LongType) === curV)
    assert(Lake.currentVersion(spark, root).get === curV)
    // LOSSY refuses with the schema-evolution message: long→double
    val ex = intercept[IllegalArgumentException] {
      Lake.alterColumnType(spark, root, "n", DoubleType)
    }
    assert(ex.getMessage.contains("lossless widening only"))
    // narrowing refuses too
    intercept[IllegalArgumentException] {
      Lake.alterColumnType(spark, root, "k", IntegerType)
    }
    // int→double IS lossless and allowed (then float→double chain on a new col)
    Lake.addColumns(spark, root, Seq("f" -> FloatType))
    Lake.alterColumnType(spark, root, "f", DoubleType)
    assert(Lake.readCommitted(spark, root).schema("f").dataType === DoubleType)
    // guards: bucket / generated / identity columns refuse
    val b = tmpTable("graft-widen-bucket")
    Lake.commitOverwrite(Seq((1, "a")).toDF("k", "t"), b,
      bucketBy = Some((2, Seq("k"))))
    assert(intercept[IllegalArgumentException] {
      Lake.alterColumnType(spark, b, "k", LongType)
    }.getMessage.contains("bucket"))
    val g = tmpTable("graft-widen-gen")
    Lake.commitOverwrite(Seq((1, 5)).toDF("k", "x"), g, retain = 8,
      partitionBy = Seq("p"), generatedColumns = Map("p" -> "pmod(x, 7)"))
    assert(intercept[IllegalArgumentException] {
      Lake.alterColumnType(spark, g, "x", LongType)
    }.getMessage.contains("derive from it"))
    val i = tmpTable("graft-widen-id")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("id", "t"), i, retain = 8,
      identity = Some("id"))
    assert(intercept[IllegalArgumentException] {
      Lake.alterColumnType(spark, i, "id", LongType)
    }.getMessage.contains("identity"))
  }

  test("nested ALTER COLUMN TYPE: a struct field widens metadata-only; lossy/missing refuse") {
    import org.apache.spark.sql.types._
    val root = tmpTable("graft-colmap-nestwiden")
    Lake.commitOverwrite(
      Seq((1L, "a", 7), (2L, "b", 9)).toDF("id", "t", "n")
        .select(col("id"), struct(col("t"), col("n")).as("meta")),
      root, retain = 8)
    val preDirs = Lake.resolve(spark, root).toSet
    Lake.alterNestedColumnType(spark, root, Seq("meta", "n"), LongType)
    assert(Lake.resolve(spark, root).toSet === preDirs)
    val df = Lake.readCommitted(spark, root)
    assert(df.schema("meta").dataType.asInstanceOf[StructType]("n")
      .dataType === LongType)
    // old files read the nested field UPCAST, exactly
    assert(rows(df.select(col("id"), col("meta.n"))) ===
      Set(Seq(1L, 7L), Seq(2L, 9L)))
    // generation 2 writes beyond the int range
    Lake.commitAppend(
      Seq((3L, "c", 6000000000L)).toDF("id", "t", "n")
        .select(col("id"), struct(col("t"), col("n")).as("meta")),
      root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root)
      .select(col("id"), col("meta.n"))) ===
      Set(Seq(1L, 7L), Seq(2L, 9L), Seq(3L, 6000000000L)))
    // lossy nested widen refuses; missing path refuses; non-struct refuses
    assert(intercept[IllegalArgumentException] {
      Lake.alterNestedColumnType(spark, root, Seq("meta", "n"), DoubleType)
    }.getMessage.contains("lossless widening only"))
    intercept[IllegalArgumentException] {
      Lake.alterNestedColumnType(spark, root, Seq("meta", "ghost"), LongType)
    }
    intercept[IllegalArgumentException] {
      Lake.alterNestedColumnType(spark, root, Seq("id", "x"), LongType)
    }
    // SQL spelling through the catalog
    spark.sql("DROP TABLE IF EXISTS nestwiden_sql")
    spark.sql(
      s"CREATE TABLE nestwiden_sql USING `graft-lake` OPTIONS (root '$root')")
    // add a narrow nested field, widen it through SQL
    spark.sql("ALTER TABLE nestwiden_sql ADD COLUMN meta.m INT")
    spark.sql("ALTER TABLE nestwiden_sql ALTER COLUMN meta.m TYPE BIGINT")
    assert(spark.sql("SELECT meta.m FROM nestwiden_sql WHERE id = 1")
      .schema.head.dataType === LongType)
    spark.sql("DROP TABLE nestwiden_sql")
  }

  test("SQL surface: ALTER TABLE ... ALTER COLUMN ... TYPE on a catalog table, stored schema re-syncs") {
    import org.apache.spark.sql.types._
    val root = tmpTable("graft-colmap-widensql")
    Lake.commitOverwrite(Seq((1L, 7), (2L, 9)).toDF("k", "n"), root,
      retain = 8)
    spark.sql("DROP TABLE IF EXISTS widen_sql")
    spark.sql(s"CREATE TABLE widen_sql USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("ALTER TABLE widen_sql ALTER COLUMN n TYPE BIGINT")
    // catalog stored schema re-synced; reads serve the wide type
    val df = spark.sql("SELECT k, n FROM widen_sql ORDER BY k")
    assert(df.schema("n").dataType === LongType)
    assert(orderedRows(df) === Seq(Seq(1L, 7L), Seq(2L, 9L)))
    // appends through SQL write the wide type
    spark.sql("INSERT INTO widen_sql VALUES (3, 6000000000)")
    assert(spark.sql("SELECT n FROM widen_sql WHERE k = 3").collect()
      .head.getLong(0) === 6000000000L)
    // lossy spelling refuses through SQL too
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE widen_sql ALTER COLUMN n TYPE DOUBLE")
    }
    assert(ex.getMessage.contains("lossless widening only"))
    // non-TYPE/DEFAULT facets refuse loudly
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE widen_sql ALTER COLUMN n COMMENT 'x'")
    }.getMessage.contains("TYPE widening and SET/DROP DEFAULT only"))
    spark.sql("DROP TABLE widen_sql")
  }

  test("case-insensitive DDL/DML paths resolve like the analyzer; case-spelled conflicts refuse") {
    import org.apache.spark.sql.types._
    val root = tmpTable("graft-colmap-caseres")
    Lake.commitOverwrite(
      Seq((1L, "click", 7)).toDF("id", "etype", "n")
        .select(col("id"), struct(col("etype"), col("n")).as("meta")),
      root, retain = 8)
    // nested ADD through a case-varied container path lands on `meta`
    Lake.addNestedColumn(spark, root, Seq("Meta", "score"), DoubleType)
    val metaT = Lake.readCommitted(spark, root).schema("meta")
      .dataType.asInstanceOf[StructType]
    assert(metaT.fieldNames.contains("score"))
    // adding a case-twin of an existing field refuses (the session
    // resolver treats `N` and `n` as the same name)
    assert(intercept[IllegalArgumentException] {
      Lake.addNestedColumn(spark, root, Seq("meta", "N"), IntegerType)
    }.getMessage.contains("already exists"))
    // nested widen through a case-varied path lands on meta.n
    Lake.alterNestedColumnType(spark, root, Seq("Meta", "N"), LongType)
    assert(Lake.readCommitted(spark, root).schema("meta").dataType
      .asInstanceOf[StructType]("n").dataType === LongType)
    // SQL: nested UPDATE with a case-varied spelling is legal …
    spark.sql("DROP TABLE IF EXISTS caseres_sql")
    spark.sql(s"CREATE TABLE caseres_sql USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("UPDATE caseres_sql SET Meta.Score = 1.5 WHERE id = 1")
    assert(spark.sql("SELECT meta.score FROM caseres_sql WHERE id = 1")
      .collect().head.getDouble(0) === 1.5)
    // … but two case-spellings of ONE field in a single SET refuse
    // (they would silently last-write-win through withField)
    assert(intercept[Exception] {
      spark.sql("UPDATE caseres_sql SET meta.score = 1.0, meta.Score = 2.0 " +
        "WHERE id = 1")
    }.getMessage.contains("duplicate assignment targets"))
    spark.sql("DROP TABLE caseres_sql")
  }

  test("prefix-overlapping SET targets refuse (order-dependent writes)") {
    val root = tmpTable("graft-colmap-prefixset")
    Lake.commitOverwrite(
      Seq((1L, 0.5, "a")).toDF("id", "v", "tag")
        .select(col("id"),
          struct(struct(col("v"), col("tag")).as("inner")).as("meta")),
      root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS prefixset_sql")
    spark.sql(s"CREATE TABLE prefixset_sql USING `graft-lake` OPTIONS (root '$root')")
    // meta.inner and meta.inner.v in one statement: the whole-struct
    // write and the field write apply order-dependently — refuse
    assert(intercept[Exception] {
      spark.sql("UPDATE prefixset_sql SET " +
        "meta.inner = named_struct('v', 0.1, 'tag', 'b'), " +
        "meta.inner.v = 0.2 WHERE id = 1")
    }.getMessage.contains("prefix"))
    // disjoint nested paths still compose fine
    spark.sql("UPDATE prefixset_sql SET meta.inner.v = 0.9, " +
      "meta.inner.tag = 'z' WHERE id = 1")
    assert(rows(spark.sql(
      "SELECT meta.inner.v, meta.inner.tag FROM prefixset_sql")) ===
      Set(Seq(0.9, "z")))
    spark.sql("DROP TABLE prefixset_sql")
  }

  test("multi-column DDL statements are ATOMIC: one manifest commit, all-or-nothing") {
    import org.apache.spark.sql.types._
    val root = tmpTable("graft-colmap-atomicddl")
    Lake.commitOverwrite(
      Seq((1L, "x", 3)).toDF("id", "etype", "n")
        .select(col("id"), struct(col("etype")).as("meta"), col("n")),
      root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS atomicddl_sql")
    spark.sql(s"CREATE TABLE atomicddl_sql USING `graft-lake` OPTIONS (root '$root')")
    // mixed top-level + nested ADD COLUMNS: ONE version bump
    val v0 = Lake.currentVersion(spark, root).get
    spark.sql("ALTER TABLE atomicddl_sql ADD COLUMNS (w INT, meta.x INT)")
    assert(Lake.currentVersion(spark, root).get === v0 + 1)
    val sch = Lake.readCommitted(spark, root).schema
    assert(sch.fieldNames.contains("w"))
    assert(sch("meta").dataType.asInstanceOf[StructType]
      .fieldNames.contains("x"))
    // a statement whose SECOND column fails validation applies NOTHING
    val v1 = Lake.currentVersion(spark, root).get
    intercept[Exception] {
      spark.sql("ALTER TABLE atomicddl_sql ADD COLUMNS (ok INT, ghost.y INT)")
    }
    assert(Lake.currentVersion(spark, root).get === v1)
    assert(!Lake.readCommitted(spark, root).columns.contains("ok"))
    // multi-column ALTER TYPE: one commit; a lossy second column
    // applies nothing (n stays IntegerType)
    val v2 = Lake.currentVersion(spark, root).get
    intercept[Exception] {
      spark.sql("ALTER TABLE atomicddl_sql ALTER COLUMN n TYPE BIGINT, " +
        "id TYPE DOUBLE")
    }
    assert(Lake.currentVersion(spark, root).get === v2)
    assert(Lake.readCommitted(spark, root).schema("n").dataType ===
      IntegerType)
    spark.sql("ALTER TABLE atomicddl_sql ALTER COLUMN n TYPE BIGINT, " +
      "w TYPE BIGINT")
    assert(Lake.currentVersion(spark, root).get === v2 + 1)
    val sch2 = Lake.readCommitted(spark, root).schema
    assert(sch2("n").dataType === LongType && sch2("w").dataType === LongType)
    spark.sql("DROP TABLE atomicddl_sql")
  }

  test("ADD COLUMNS duplicate checks run under the session resolver (case-insensitive by default)") {
    val root = tmpTable("graft-colmap-casedup")
    Lake.commitOverwrite(Seq((1L, 0.5)).toDF("k", "score"), root, retain = 8)
    // a case-twin of an existing column refuses — committing it would
    // leave the analyzer unable to resolve either unambiguously
    assert(intercept[IllegalArgumentException] {
      Lake.addColumns(spark, root,
        Seq("Score" -> org.apache.spark.sql.types.IntegerType))
    }.getMessage.contains("already exists"))
    // intra-statement case twins refuse the whole statement
    assert(intercept[IllegalArgumentException] {
      Lake.addColumns(spark, root,
        Seq("a" -> org.apache.spark.sql.types.IntegerType,
          "A" -> org.apache.spark.sql.types.IntegerType))
    }.getMessage.contains("duplicate"))
    assert(Lake.readCommitted(spark, root).columns.toSeq === Seq("k", "score"))
  }
}
