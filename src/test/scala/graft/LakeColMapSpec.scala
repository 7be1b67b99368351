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
    // refusals: duplicate, NOT NULL, nested, DEFAULT
    intercept[Exception](
      spark.sql("ALTER TABLE addcol_t ADD COLUMN id BIGINT"))
    intercept[Exception](
      spark.sql("ALTER TABLE addcol_t ADD COLUMN nn BIGINT NOT NULL"))
    intercept[Exception](
      spark.sql("ALTER TABLE addcol_t ADD COLUMN d BIGINT DEFAULT 7"))
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
    // nested DML assignment still refuses loudly (mapping is
    // top-level; the refusal names the contract)
    Lake.registerSql(spark, "colmap_nested", root)
    val e = intercept[Exception] {
      spark.sql("UPDATE colmap_nested SET m.etype = 'x' WHERE id = 1")
    }
    assert(e.getMessage.toLowerCase.contains("nested") ||
      e.getMessage.contains("m.etype"))
    spark.sql("DROP TABLE IF EXISTS colmap_nested")
  }
}
