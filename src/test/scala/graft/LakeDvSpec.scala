package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Deletion vectors (merge-on-read deletes): a predicate DELETE under
  * the `dvMaxRows` bound commits `#dv_` position lines against the
  * UNCHANGED dir set instead of rewriting dirs; every read path honors
  * the vector; every rewrite path materializes it away. */
class LakeDvSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def fsOf(root: String) = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def liveDirs(root: String): Set[String] =
    Lake.resolve(spark, root)
      .map(p => new org.apache.hadoop.fs.Path(p).getName).toSet

  private def manifestLines(root: String, v: Long): Seq[String] = {
    val fs = fsOf(root)
    val in = fs.open(new org.apache.hadoop.fs.Path(root, s"_commit_$v"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def dvLines(root: String, v: Long): Seq[String] =
    manifestLines(root, v).filter(_.startsWith("#dv_"))

  private def fileSigs(root: String, dirs: Set[String]) = {
    val fs = fsOf(root)
    dirs.map(d => d -> fs.listStatus(new org.apache.hadoop.fs.Path(root, d))
      .map(f => (f.getPath.getName, f.getModificationTime, f.getLen)).toSet)
      .toMap
  }

  test("DV delete: dirs untouched byte-for-byte, every read path excludes the rows") {
    val root = tmpTable("graft-dv-basic")
    (0L until 4L).foreach { b =>
      Lake.commitAppend(
        (b * 10L until (b + 1) * 10L).map(k => (k, s"r$k")).toDF("k", "t"),
        root, retain = 8, rowCount = Some(10L), statsCols = Seq("k"))
      ()
    }
    val preDirs = liveDirs(root)
    val preSigs = fileSigs(root, preDirs)
    val preV = Lake.currentVersion(spark, root).get
    // straddling delete: k in {15, 22} touches two dirs — DV path
    val v = Lake.deleteWhere(spark, root, col("k").isin(15L, 22L), retain = 8)
    assert(v === preV + 1)
    // THE merge-on-read gate: the dir set is unchanged and every data
    // file is byte-identical — only a manifest line was added
    assert(liveDirs(root) === preDirs)
    assert(fileSigs(root, preDirs) === preSigs)
    assert(dvLines(root, v).size === 2) // one line per touched dir
    // reads exclude the soft-deleted rows on every path
    val want = (0L until 40L).toSet -- Set(15L, 22L)
    assert(rows(Lake.readCommitted(spark, root).select("k")) ===
      want.map(Seq(_)))
    assert(rows(Lake.readCommittedWhere(spark, root,
      col("k").between(10L, 29L)).select("k")) ===
      ((10L until 30L).toSet -- Set(15L, 22L)).map(Seq(_)))
    assert(Lake.sqlTable(spark, root).count() === 38L)
    // metadata count stays exact through the DV delete
    assert(Lake.countCommitted(spark, root) === Some(38L))
    // time travel: the pre-delete snapshot still serves all 40
    assert(Lake.readCommittedAt(spark, root, preV).count() === 40L)
    // SQL catalog read (bare-relation path → GraftLakeDvRule)
    spark.sql("DROP TABLE IF EXISTS dv_basic")
    spark.sql(s"CREATE TABLE dv_basic USING `graft-lake` OPTIONS (root '$root')")
    assert(spark.sql("SELECT count(*) AS n FROM dv_basic").collect()
      .head.getLong(0) === 38L)
    assert(spark.sql(
      "SELECT count(*) AS n FROM dv_basic WHERE k IN (15, 22)").collect()
      .head.getLong(0) === 0L)
    // … and inside a subquery expression
    assert(spark.sql(
      "SELECT count(*) AS n FROM dv_basic WHERE k IN " +
        "(SELECT k FROM dv_basic WHERE k >= 20)").collect()
      .head.getLong(0) === 19L) // 20..39 minus 22
    spark.sql("DROP TABLE dv_basic")
  }

  test("DV delete merges with an existing vector; second delete stays merge-on-read") {
    val root = tmpTable("graft-dv-merge")
    Lake.commitOverwrite((0L until 20L).map(k => (k, s"r$k")).toDF("k", "t"),
      root, retain = 8, rowCount = Some(20L))
    val preDirs = liveDirs(root)
    val v1 = Lake.deleteWhere(spark, root, col("k") === 3L, retain = 8)
    val v2 = Lake.deleteWhere(spark, root, col("k").isin(5L, 7L), retain = 8)
    assert(liveDirs(root) === preDirs)
    assert(dvLines(root, v2).size === 1)
    assert(rows(Lake.readCommitted(spark, root).select("k")) ===
      ((0L until 20L).toSet -- Set(3L, 5L, 7L)).map(Seq(_)))
    assert(Lake.countCommitted(spark, root) === Some(17L))
    // deleting an already-DV'd row is a no-op (the read pre-filters)
    assert(Lake.deleteWhere(spark, root, col("k") === 3L, retain = 8) === v2)
    // v1 time travel shows exactly the first vector's view
    assert(rows(Lake.readCommittedAt(spark, root, v1).select("k")) ===
      ((0L until 20L).toSet - 3L).map(Seq(_)))
  }

  test("rewrites materialize the vector: compact, update, merge, z-order never resurrect") {
    val root = tmpTable("graft-dv-mat")
    (0L until 3L).foreach { b =>
      Lake.commitAppend(
        (b * 10L until (b + 1) * 10L).map(k => (k, k * 100L)).toDF("k", "amt"),
        root, retain = 8, rowCount = Some(10L), statsCols = Seq("k"))
      ()
    }
    Lake.deleteWhere(spark, root, col("k").isin(4L, 14L, 24L), retain = 8)
    assert(Lake.countCommitted(spark, root) === Some(27L))
    // update on a DV'd dir, COW path pinned: reads through the
    // vector, rewrites the dir (the DV fast path has its own test)
    Lake.updateWhere(spark, root, col("k") === 15L,
      Map("amt" -> lit(-1L)), retain = 8, dvMaxRows = 0L)
    assert(Lake.readCommitted(spark, root).where(col("k") === 14L).isEmpty)
    // compaction collapses the rest and materializes every vector
    val vc = Lake.compactCommitted(spark, root, targetBytes = 1L << 20, retain = 8)
    assert(dvLines(root, vc).isEmpty)
    assert(rows(Lake.readCommitted(spark, root).select("k")) ===
      ((0L until 30L).toSet -- Set(4L, 14L, 24L)).map(Seq(_)))
    assert(Lake.countCommitted(spark, root) === Some(27L))
    // z-order after a fresh DV: also materializes
    Lake.deleteWhere(spark, root, col("k") === 0L, retain = 8)
    val vz = Lake.clusterCommitted(spark, root, Seq("k"),
      targetBytes = 1L << 20, retain = 8)
    assert(dvLines(root, vz).isEmpty)
    assert(Lake.readCommitted(spark, root).where(col("k") === 0L).isEmpty)
    assert(Lake.readCommitted(spark, root).count() === 26L)
    // MERGE on a DV'd dir: upsert next to a soft-deleted key
    Lake.deleteWhere(spark, root, col("k") === 1L, retain = 8)
    Lake.mergeInto(spark, root,
      Seq((2L, -2L)).toDF("sk", "samt"),
      on = Seq((col("t.k"), col("sk"))),
      matched = Seq(graft.sources.LakeMergeUpdate(None,
        Map("amt" -> col("s.samt")))),
      retain = 8)
    val after = Lake.readCommitted(spark, root)
    assert(after.where(col("k") === 1L).isEmpty) // not resurrected
    assert(rows(after.where(col("k") === 2L)) === Set(Seq(2L, -2L)))
  }

  test("DV update: dirs untouched, matched rows soft-delete and re-append updated") {
    val root = tmpTable("graft-dv-upd")
    (0L until 3L).foreach { b =>
      Lake.commitAppend(
        (b * 10L until (b + 1) * 10L).map(k => (k, k * 100L)).toDF("k", "amt"),
        root, retain = 8, rowCount = Some(10L), statsCols = Seq("k"))
      ()
    }
    val preDirs = liveDirs(root)
    val preSigs = fileSigs(root, preDirs)
    val v = Lake.updateWhere(spark, root, col("k").isin(5L, 15L),
      Map("amt" -> lit(-5L)), retain = 8)
    // every pre-update dir byte-identical and still referenced; one
    // O(matched) dir appended; two dirs carry fresh vectors
    val dirsAfter = liveDirs(root)
    assert(preDirs.subsetOf(dirsAfter))
    assert(fileSigs(root, preDirs) === preSigs)
    assert((dirsAfter -- preDirs).size === 1)
    assert(dvLines(root, v).size === 2)
    // values: exactly the matched rows updated, count preserved
    val r = Lake.readCommitted(spark, root)
    assert(r.count() === 30L)
    assert(Lake.countCommitted(spark, root) === Some(30L))
    assert(rows(r.where(col("amt") === -5L).select("k")) ===
      Set(Seq(5L), Seq(15L)))
    assert(r.where(col("k") === 5L).count() === 1L) // no duplicate copy
    // predicate read path agrees
    assert(rows(Lake.readCommittedWhere(spark, root, col("k") === 15L)
      .select("amt")) === Set(Seq(-5L)))
    // the change feed pairs each killed row with its appended copy
    val feed = Lake.changesBetween(spark, root, v - 1, v, Seq("k"))
    assert(rows(feed.select("k", "change_type")) === Set(
      Seq(5L, "update_preimage"), Seq(5L, "update_postimage"),
      Seq(15L, "update_preimage"), Seq(15L, "update_postimage")))
    // SQL catalog path agrees
    spark.sql("DROP TABLE IF EXISTS dv_upd_t")
    spark.sql(s"CREATE TABLE dv_upd_t USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("UPDATE dv_upd_t SET amt = -7 WHERE k = 25")
    assert(spark.sql("SELECT amt FROM dv_upd_t WHERE k = 25")
      .collect().map(_.getLong(0)).toSeq === Seq(-7L))
    assert(spark.sql("SELECT count(*) FROM dv_upd_t")
      .collect().head.getLong(0) === 30L)
    spark.sql("DROP TABLE dv_upd_t")
    // compaction materializes the vectors away, values survive
    val vc = Lake.compactCommitted(spark, root, targetBytes = 1L << 20,
      retain = 8)
    assert(dvLines(root, vc).isEmpty)
    assert(rows(Lake.readCommitted(spark, root)
      .where(col("amt") < 0L).select("k")) ===
      Set(Seq(5L), Seq(15L), Seq(25L)))
  }

  test("DV merge: touched dirs untouched, winners append, feed pairs exactly") {
    val root = tmpTable("graft-dv-merge")
    (0L until 3L).foreach { b =>
      Lake.commitAppend(
        (b * 10L until (b + 1) * 10L).map(k => (k, 0L, s"r$k"))
          .toDF("k", "ver", "t"),
        root, retain = 8, rowCount = Some(10L), statsCols = Seq("k"))
      ()
    }
    val preDirs = liveDirs(root)
    val preSigs = fileSigs(root, preDirs)
    val preV = Lake.currentVersion(spark, root).get
    // one update, one delete, one insert — across two dirs
    val v = Lake.mergeCommitted(spark, root,
      Seq((5L, 1L, "UP", false), (15L, 1L, "x", true), (99L, 1L, "NEW", false))
        .toDF("k", "ver", "t", "del"),
      keyCols = Seq("k"), versionCol = "ver", deleteCol = "del", retain = 8)
    // every pre-merge dir byte-identical; ONE appended winners dir
    val dirsAfter = liveDirs(root)
    assert(preDirs.subsetOf(dirsAfter))
    assert(fileSigs(root, preDirs) === preSigs)
    assert((dirsAfter -- preDirs).size === 1)
    assert(dvLines(root, v).size === 2) // the two touched dirs
    val r = Lake.readCommitted(spark, root)
    assert(r.count() === 30L) // 30 - update - delete + update' + insert
    assert(rows(r.where(col("k") === 5L)) === Set(Seq(5L, 1L, "UP")))
    assert(r.where(col("k") === 15L).isEmpty)
    assert(rows(r.where(col("k") === 99L)) === Set(Seq(99L, 1L, "NEW")))
    // the change feed pairs the update, isolates the delete and insert
    val feed = Lake.changesBetween(spark, root, preV, v, Seq("k"))
    assert(rows(feed.select("k", "change_type")) === Set(
      Seq(5L, "update_preimage"), Seq(5L, "update_postimage"),
      Seq(15L, "delete"), Seq(99L, "insert")))
    // a pure-delete DV merge commits vectors only (no appended dir)
    val dirsB4 = liveDirs(root)
    Lake.mergeCommitted(spark, root,
      Seq((6L, 2L, "x", true)).toDF("k", "ver", "t", "del"),
      Seq("k"), "ver", "del", retain = 8)
    assert(liveDirs(root) === dirsB4)
    assert(Lake.readCommitted(spark, root).count() === 29L)
    // guarded stale batch is still a version-stable no-op
    val vNow = Lake.currentVersion(spark, root).get
    assert(Lake.mergeCommitted(spark, root,
      Seq((5L, 0L, "stale", false)).toDF("k", "ver", "t", "del"),
      Seq("k"), "ver", "del", guardVersions = true, retain = 8) === vNow)
    // compaction materializes everything away
    val vc = Lake.compactCommitted(spark, root, targetBytes = 1L << 20,
      retain = 8)
    assert(dvLines(root, vc).isEmpty)
    assert(Lake.readCommitted(spark, root).count() === 29L)
  }

  test("cap overflow falls back to copy-on-write; dvMaxRows=0 disables") {
    val root = tmpTable("graft-dv-cap")
    Lake.commitOverwrite((0L until 100L).map(k => (k, s"r$k")).toDF("k", "t"),
      root, retain = 8)
    val preDirs = liveDirs(root)
    // 50 hits > cap of 10 → COW rewrite, no DV line
    val v = Lake.deleteWhere(spark, root, col("k") < 50L, retain = 8,
      dvMaxRows = 10)
    assert(liveDirs(root) !== preDirs)
    assert(dvLines(root, v).isEmpty)
    assert(Lake.readCommitted(spark, root).count() === 50L)
    // dvMaxRows = 0: even a one-row delete rewrites
    val preDirs2 = liveDirs(root)
    val v2 = Lake.deleteWhere(spark, root, col("k") === 60L, retain = 8,
      dvMaxRows = 0)
    assert(liveDirs(root) !== preDirs2)
    assert(dvLines(root, v2).isEmpty)
    assert(Lake.readCommitted(spark, root).count() === 49L)
  }

  test("restore across a DV delete revives the rows; restore onto it re-applies them") {
    val root = tmpTable("graft-dv-restore")
    Lake.commitOverwrite((0L until 10L).map(k => (k, s"r$k")).toDF("k", "t"),
      root, retain = 8, rowCount = Some(10L))                       // v0
    val vDel = Lake.deleteWhere(spark, root, col("k") === 4L, retain = 8) // v1
    Lake.commitAppend(Seq((100L, "x")).toDF("k", "t"), root, retain = 8,
      rowCount = Some(1L))                                          // v2
    // restore to v0: the row revives — the live vector must NOT carry
    val vr = Lake.restoreCommitted(spark, root, 0L, retain = 8)
    assert(dvLines(root, vr).isEmpty)
    assert(rows(Lake.readCommitted(spark, root).select("k")) ===
      (0L until 10L).map(Seq(_)).toSet)
    // restore onto the DV'd version: the vector comes back with it
    val vr2 = Lake.restoreCommitted(spark, root, vDel, retain = 8)
    assert(dvLines(root, vr2).size === 1)
    assert(rows(Lake.readCommitted(spark, root).select("k")) ===
      ((0L until 10L).toSet - 4L).map(Seq(_)))
  }

  test("change feed derives DV deletes exactly; streaming guards and CDF compose") {
    val root = tmpTable("graft-dv-cdf")
    Lake.commitOverwrite((0L until 10L).map(k => (k, s"r$k")).toDF("k", "t"),
      root, retain = 8)                                             // v0
    val v1 = Lake.deleteWhere(spark, root, col("k").isin(2L, 6L), retain = 8)
    // batch feed: exactly two deletes, nothing else
    val feed = Lake.changesBetween(spark, root, 0L, v1, Seq("k"))
    assert(feed.where(col("change_type") =!= "delete").isEmpty)
    assert(rows(feed.select("k")) === Set(Seq(2L), Seq(6L)))
    // append another batch after the delete: feed across both versions
    val v2BatchRoot = Lake.commitAppend(Seq((50L, "y")).toDF("k", "t"),
      root, retain = 8)
    val feed2 = Lake.changesBetween(spark, root, 0L, v2BatchRoot, Seq("k"))
    assert(rows(feed2.select("k", "change_type")) ===
      Set(Seq(2L, "delete"), Seq(6L, "delete"), Seq(50L, "insert")))
    // CDF STREAM over the whole history emits the row-level deletes
    val outDir = java.nio.file.Files.createTempDirectory("graft-dv-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dv-ckpt").toString
    val q = spark.readStream.format("graft-lake")
      .option("root", root).option("readChangeFeed", "true")
      .option("keyCols", "k")
      .load().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(outDir)
    assert(got.where(col("change_type") === "delete").count() === 2L)
    // append-mode stream REFUSES a DV delete (a delete it cannot see
    // in the dir diff) unless ignoreDeletes is set
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-dv-ckpt2").toString
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      spark.readStream.format("graft-lake").option("root", root)
        .load().writeStream.format("noop")
        .option("checkpointLocation", ckpt2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(120000)
    }
    assert(ex.getMessage.contains("deletion vectors") ||
      Option(ex.getCause).exists(_.getMessage.contains("deletion vectors")))
    // with ignoreDeletes the stream proceeds (added dirs only)
    val ckpt3 = java.nio.file.Files.createTempDirectory("graft-dv-ckpt3").toString
    val outDir3 = java.nio.file.Files.createTempDirectory("graft-dv-out3").toString
    spark.readStream.format("graft-lake").option("root", root)
      .option("ignoreDeletes", "true")
      .load().writeStream.format("parquet")
      .option("path", outDir3).option("checkpointLocation", ckpt3)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000)
    assert(spark.read.parquet(outDir3).count() === 11L) // 10 + the append
  }

  test("SQL DELETE takes the DV path; clone carries the vector; vacuum composes") {
    val root = tmpTable("graft-dv-sql")
    Lake.commitOverwrite((0L until 30L).map(k => (k, s"r$k")).toDF("k", "t"),
      root, retain = 8, rowCount = Some(30L))
    spark.sql("DROP TABLE IF EXISTS dv_sql")
    spark.sql(s"CREATE TABLE dv_sql USING `graft-lake` OPTIONS (root '$root')")
    val preDirs = liveDirs(root)
    spark.sql("DELETE FROM dv_sql WHERE k % 10 = 3")
    assert(liveDirs(root) === preDirs) // merge-on-read through SQL too
    val vNow = Lake.currentVersion(spark, root).get
    assert(dvLines(root, vNow).nonEmpty)
    assert(spark.sql("SELECT count(*) AS n FROM dv_sql").collect()
      .head.getLong(0) === 27L)
    // shallow clone of the DV'd snapshot: the vector travels
    val cloneRoot = tmpTable("graft-dv-clone")
    Lake.cloneCommitted(spark, root, cloneRoot)
    assert(Lake.readCommitted(spark, cloneRoot).count() === 27L)
    assert(rows(Lake.readCommitted(spark, cloneRoot)
      .where(col("k") % 10 === 3).select("k")) === Set.empty[Seq[Any]])
    // vacuum on the source: DV'd dirs are still referenced, nothing breaks
    Lake.vacuumCommitted(spark, root)
    assert(Lake.readCommitted(spark, root).count() === 27L)
    spark.sql("DROP TABLE dv_sql")
  }

  test("DV ship path: large vectors broadcast (bounded plan), small ones embed inline") {
    import graft.sources.{DvBroadcastRef, DvContains, DvInline}
    def dvCarrierOf(df: org.apache.spark.sql.DataFrame): Seq[graft.sources.DvCarrier] =
      df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect { case c: DvContains => c.dv }
      }.flatten
    // SMALL vector: embeds in the plan, no broadcast bookkeeping
    val small = tmpTable("graft-dv-inline")
    Lake.commitOverwrite((1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "v"),
      small, retain = 8)
    Lake.deleteWhere(spark, small, col("k") <= 10L, retain = 8)
    val sc = dvCarrierOf(Lake.readCommitted(spark, small))
    assert(sc.nonEmpty && sc.forall(_.isInstanceOf[DvInline]))
    // LARGE vector (>= threshold): ships as an executor broadcast and
    // the serialized FILTER CONDITION stays bounded — the plan copy
    // every task receives carries a handle, not the position set
    val big = tmpTable("graft-dv-bcast")
    Lake.commitOverwrite((1L to 60000L).map(i => (i, i * 2.0)).toDF("k", "v"),
      big, retain = 8)
    Lake.deleteWhere(spark, big, col("k") % 3L === 0L, retain = 8,
      dvMaxRows = 30000L) // 20k positions soft-delete
    val read = Lake.readCommitted(spark, big)
    assert(read.count() === 40000L)
    assert(read.where(col("k") === 9L).isEmpty)
    val bc = dvCarrierOf(read)
    assert(bc.nonEmpty && bc.forall(_.isInstanceOf[DvBroadcastRef]))
    val cond = read.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.head
    val bytes = {
      val bo = new java.io.ByteArrayOutputStream()
      val oo = new java.io.ObjectOutputStream(bo)
      oo.writeObject(cond); oo.close(); bo.size()
    }
    assert(bytes < 64 * 1024,
      s"serialized DV filter is $bytes bytes — the position set " +
        "is riding the plan instead of the broadcast")
    // the SQL catalog path broadcasts identically
    spark.sql("DROP TABLE IF EXISTS dv_bcast")
    spark.sql(s"CREATE TABLE dv_bcast USING `graft-lake` OPTIONS (root '$big')")
    assert(spark.sql("SELECT count(*) AS n FROM dv_bcast").collect()
      .head.getLong(0) === 40000L)
    spark.sql("DROP TABLE dv_bcast")
    // ONE SNAPSHOT, ONE BROADCAST: repeated read assemblies of the
    // same (root, version) reuse the cached broadcast instead of
    // shipping a fresh copy of the position set per query and leaving
    // the blocks to pile up until ContextCleaner runs
    val id1 = dvCarrierOf(Lake.readCommitted(spark, big))
      .collect { case b: DvBroadcastRef => b.bc.id }
    val id2 = dvCarrierOf(Lake.readCommitted(spark, big))
      .collect { case b: DvBroadcastRef => b.bc.id }
    assert(id1.nonEmpty && id1 === id2,
      s"same snapshot re-broadcast its DV set: $id1 vs $id2")
    // a NEW version (more deletes) must NOT reuse the old entry
    Lake.deleteWhere(spark, big, col("k") === 2L, retain = 8,
      dvMaxRows = 30000L)
    val id3 = dvCarrierOf(Lake.readCommitted(spark, big))
      .collect { case b: DvBroadcastRef => b.bc.id }
    assert(id3.nonEmpty && id3 != id1,
      "a new DV commit must ship a fresh broadcast, not the stale set")
  }

  test("REORG APPLY (PURGE): vectors materialize away regardless of dir size, answer unchanged") {
    val root = tmpTable("graft-dv-reorg")
    // three append dirs; sizes irrelevant — compactCommitted(minBytes)
    // would never select a LARGE one, REORG selects by VECTOR
    (0 until 3).foreach { b =>
      Lake.commitAppend(
        (1L to 40L).map(i => (b * 100L + i, i * 1.5)).toDF("k", "v"),
        root, retain = 8, statsCols = Seq("k"))
      ()
    }
    // sparse deletes land vectors on dirs 0 and 2 (k-ranges disjoint)
    Lake.deleteWhere(spark, root, col("k") === 5L, retain = 8)   // dir 0
    Lake.deleteWhere(spark, root, col("k") === 205L, retain = 8) // dir 2
    val vDel = Lake.currentVersion(spark, root).get
    assert(dvLines(root, vDel).size === 2)
    val before = Lake.readCommitted(spark, root).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    val dirsBefore = liveDirs(root)
    // WHERE-scoped purge: only the dir whose range may match rewrites;
    // the other KEEPS its vector (and its bytes, by reference)
    val v1 = Lake.reorgCommitted(spark, root,
      where = Some(col("k") < 100L), retain = 8)
    assert(v1 === vDel + 1)
    assert(dvLines(root, v1).size === 1)
    val dirsAfterScoped = liveDirs(root)
    assert((dirsBefore -- dirsAfterScoped).size === 1, "exactly one dir purged")
    assert(Lake.readCommitted(spark, root).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet === before)
    // unscoped purge pays the rest; a vector-free table is a no-op
    val v2 = Lake.reorgCommitted(spark, root, retain = 8)
    assert(dvLines(root, v2).isEmpty)
    assert(Lake.reorgCommitted(spark, root) === v2) // version-stable
    assert(Lake.readCommitted(spark, root).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet === before)
    // the DV debt columns in DESCRIBE HISTORY track the payoff
    val hist = Lake.describeHistory(spark, root)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getInt(5), r.getLong(6)))
    assert(hist.find(_._1 == vDel).get._2 === 2)
    assert(hist.find(_._1 == v2).get._2 === 0)
    // an un-prunable WHERE refuses instead of silently purging all
    intercept[IllegalArgumentException] {
      Lake.reorgCommitted(spark, root, where = Some(col("k") + 1 > 0))
    }
  }

  test("REORG SQL spelling; append races COMPOSE (disjoint-file rebase); source-dir DV races refuse") {
    val root = tmpTable("graft-dv-reorg-sql")
    val rows = (1L to 120L).map(i => (i, (i % 4).toString, i * 2.0))
    Lake.commitOverwrite(rows.toDF("k", "part", "v"), root, retain = 8,
      partitionBy = Seq("part"), statsCols = Seq("k"))
    Lake.deleteWhere(spark, root, col("k") === 7L, retain = 8)
    spark.sql("DROP TABLE IF EXISTS reorg_sql")
    spark.sql(s"CREATE TABLE reorg_sql USING `graft-lake` OPTIONS (root '$root')")
    try {
      // an APPEND lands inside REORG's pin->publish window: layout-
      // only + row-preserving + disjoint dirs → the purge REBASES and
      // BOTH commit (Delta's disjoint-file conflict rule) — a rewrite
      // that may have moved terabytes is not discarded for one
      // appendlet
      Lake.afterSlotPin = () => {
        Lake.afterSlotPin = () => ()
        Lake.commitAppend(Seq((999L, "3", 1.0)).toDF("k", "part", "v"),
          root, retain = 8)
        ()
      }
      val vr = Lake.reorgCommitted(spark, root, retain = 8)
      assert(dvLines(root, vr).isEmpty)
      assert(Lake.readCommitted(spark, root).count() === 120L) // 119 + 999
      assert(Lake.readCommitted(spark, root)
        .where(col("k") === 999L).count() === 1L) // interloper kept
      // but a DV delete landing ON A SOURCE DIR mid-purge refuses:
      // the rewrite materialized a vector that is no longer current
      Lake.deleteWhere(spark, root, col("k") === 8L, retain = 8) // part 0
      Lake.afterSlotPin = () => {
        Lake.afterSlotPin = () => ()
        Lake.deleteWhere(spark, root, col("k") === 12L, retain = 8) // part 0 too
        ()
      }
      intercept[java.util.ConcurrentModificationException] {
        Lake.reorgCommitted(spark, root, retain = 8)
      }
      // the interloper's delete WON and nothing of it was lost
      assert(Lake.readCommitted(spark, root).count() === 118L)
      // the re-run purges cleanly; SQL spelling; layout survives
      val v = spark.sql("REORG TABLE reorg_sql APPLY (PURGE)")
        .collect().head.getLong(0)
      assert(dvLines(root, v).isEmpty)
      assert(Lake.readCommitted(spark, root).count() === 118L)
      assert(Lake.partitionValues(spark, root).count() === 4L)
      val (_, skipped, _) = Lake.resolveWhere(spark, root, col("part") === "2")
      assert(skipped.nonEmpty, "partition pruning must survive the purge")
    } finally {
      Lake.afterSlotPin = () => ()
      spark.sql("DROP TABLE IF EXISTS reorg_sql")
    }
  }

  test("OPTIMIZE/z-order rebase across an interleaved append: both commit, replay exact") {
    val root = tmpTable("graft-dv-maintrebase")
    (0 until 4).foreach { b =>
      Lake.commitAppend(
        (1L to 25L).map(i => (b * 100L + i, i * 1.0)).toDF("k", "v"),
        root, retain = 8, statsCols = Seq("k"))
      ()
    }
    try {
      // compaction: appender lands in the build->publish window; the
      // compaction rebases and publishes (its sources + the new dir)
      Lake.beforePublish = () => {
        Lake.beforePublish = () => ()
        Lake.commitAppend(Seq((9001L, 1.0)).toDF("k", "v"), root, retain = 8)
        ()
      }
      val vc = Lake.compactCommitted(spark, root, targetBytes = 1L << 20,
        retain = 8)
      assert(Lake.currentVersion(spark, root) === Some(vc))
      assert(Lake.readCommitted(spark, root).count() === 101L)
      assert(Lake.readCommitted(spark, root)
        .where(col("k") === 9001L).count() === 1L)
      // replay-by-version ≡ final table: the interloper's version and
      // the compaction's version BOTH serve exactly their snapshots
      assert(Lake.readCommittedAt(spark, root, vc - 1).count() === 101L)
      // z-order: same discipline
      Lake.beforePublish = () => {
        Lake.beforePublish = () => ()
        Lake.commitAppend(Seq((9002L, 2.0)).toDF("k", "v"), root, retain = 8)
        ()
      }
      val vz = Lake.clusterCommitted(spark, root, Seq("k"),
        targetBytes = 1L << 20, retain = 8)
      assert(Lake.currentVersion(spark, root) === Some(vz))
      assert(Lake.readCommitted(spark, root).count() === 102L)
      assert(Lake.readCommitted(spark, root)
        .where(col("k") === 9002L).count() === 1L)
      // a DIR-REMOVING interloper still refuses: an overwrite lands
      // mid-compaction and the compaction's sources are gone
      Lake.beforePublish = () => {
        Lake.beforePublish = () => ()
        Lake.commitOverwrite(Seq((1L, 1.0)).toDF("k", "v"), root, retain = 8)
        ()
      }
      intercept[java.util.ConcurrentModificationException] {
        Lake.compactCommitted(spark, root, targetBytes = 1L << 20,
          retain = 8)
      }
      assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(1L, 1.0)))
    } finally Lake.beforePublish = () => ()
  }
}
