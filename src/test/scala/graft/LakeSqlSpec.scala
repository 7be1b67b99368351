package graft

import graft.sources.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** SQL-native lake reads: `Lake.sqlTable` plans through a
  * `LakeFileIndex`, so data skipping fires on whatever predicate the
  * QUERY applies — through `spark.sql` over a registered view, not an
  * up-front argument — while the scan stays Spark's own vectorized
  * parquet path. */
class LakeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  /** Files the executed plan's parquet scan actually selected (AFTER
    * the index pruned): collect leaves post-execution. The queries
    * here are scan+filter only — no exchange, so no AQE re-wrap. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec in the plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** Four key-ranged appends of k=0..39, stats on k — the ordered-
    * ingest layout every skipping test uses. Returns the root. */
  private def rangedTable(bloom: Boolean = false): String = {
    val root = tmpTable("graft-lakesql")
    (0 until 4).foreach { b =>
      val df = ((b * 10) until ((b + 1) * 10)).map(k => (k.toLong, s"t$k"))
        .toDF("k", "t")
      Lake.commitAppend(df, root, retain = 8, statsCols = Seq("k"),
        bloomCols = if (bloom) Seq("k") else Nil)
    }
    root
  }

  test("sqlTable equals readCommitted, including schema evolution NULL backfill") {
    val root = tmpTable("graft-lakesql-evo")
    Lake.commitAppend(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root, retain = 8)
    // evolved append: adds a nullable column; old dir reads NULL
    Lake.commitAppend(Seq((3L, "c", 30L)).toDF("k", "t", "extra"), root, retain = 8)
    val viaSql = Lake.sqlTable(spark, root)
    assert(viaSql.schema === Lake.readCommitted(spark, root).schema)
    assert(rows(viaSql) === rows(Lake.readCommitted(spark, root)))
    assert(rows(viaSql) === Set(Seq(1L, "a", null), Seq(2L, "b", null), Seq(3L, "c", 30L)))
  }

  test("spark.sql WHERE over a registered view skips files the manifest excludes") {
    val root = rangedTable()
    Lake.registerSql(spark, "lakesql_ranged", root)
    val total = scannedFiles(spark.sql("SELECT * FROM lakesql_ranged"))
    val q = spark.sql("SELECT k, t FROM lakesql_ranged WHERE k BETWEEN 12 AND 17")
    // correctness first: pruning must be invisible in the answer
    assert(rows(q) === (12L to 17L).map(k => Seq(k, s"t$k")).toSet)
    // then the I/O: only the dir covering [10,19] can match
    val pruned = scannedFiles(
      spark.sql("SELECT k, t FROM lakesql_ranged WHERE k BETWEEN 12 AND 17"))
    assert(pruned < total, s"expected < $total files scanned, got $pruned")
  }

  test("a .where added later in the DataFrame chain prunes the same way") {
    val root = rangedTable()
    val base = Lake.sqlTable(spark, root)
    val total = scannedFiles(base.select("k", "t"))
    val chained = base.select("k", "t").where(col("k") < 10L)
    assert(rows(chained) === (0L until 10L).map(k => Seq(k, s"t$k")).toSet)
    assert(scannedFiles(base.select("k", "t").where(col("k") < 10L)) < total)
  }

  test("bloom pruning fires on SQL equality point lookups") {
    val root = rangedTable(bloom = true)
    Lake.registerSql(spark, "lakesql_bloom", root)
    val total = scannedFiles(spark.sql("SELECT * FROM lakesql_bloom"))
    val q = "SELECT k, t FROM lakesql_bloom WHERE k = 23"
    assert(rows(spark.sql(q)) === Set(Seq(23L, "t23")))
    assert(scannedFiles(spark.sql(q)) < total)
  }

  test("provably-empty predicate reads zero files but keeps schema and residual filter") {
    val root = rangedTable()
    val q = Lake.sqlTable(spark, root).where(col("k") > 1000L)
    assert(q.schema.fieldNames.toSeq === Seq("k", "t"))
    assert(q.collect().isEmpty)
    assert(scannedFiles(Lake.sqlTable(spark, root).where(col("k") > 1000L)) === 0L)
  }

  test("handles are snapshot-pinned: a registered view survives a concurrent commit") {
    val root = tmpTable("graft-lakesql-pin")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.registerSql(spark, "lakesql_pinned", root)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    // the view keeps its registration-time snapshot...
    assert(rows(spark.sql("SELECT * FROM lakesql_pinned")) === Set(Seq(1L, "a")))
    // ...a fresh handle follows the live table...
    assert(rows(Lake.sqlTable(spark, root)) === Set(Seq(1L, "a"), Seq(2L, "b")))
    // ...and an explicit version is SQL time travel
    assert(rows(Lake.sqlTable(spark, root, version = Some(0L))) === Set(Seq(1L, "a")))
    intercept[java.util.NoSuchElementException] {
      Lake.sqlTable(spark, root, version = Some(99L))
    }
  }

  test("sizeInBytes feeds the optimizer: a small lake dim auto-broadcasts") {
    val root = tmpTable("graft-lakesql-bc")
    Lake.commitOverwrite(
      (0L until 20L).map(k => (k, s"n$k")).toDF("k", "name"), root, retain = 8)
    Lake.registerSql(spark, "lakesql_dim", root)
    spark.range(0, 1000).toDF("k").createOrReplaceTempView("lakesql_fact")
    val j = spark.sql(
      """SELECT f.k, d.name FROM lakesql_fact f
        |JOIN lakesql_dim d ON f.k = d.k""".stripMargin)
    assert(j.count() === 20L)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the lake dim to broadcast, plan:\n$plan")
  }

  test("spark.read.format(graft-lake) is the same index-planned read, version = time travel") {
    val root = rangedTable()
    def load() = spark.read.format("graft-lake").option("root", root).load()
    assert(rows(load()) === rows(Lake.sqlTable(spark, root)))
    // skipping fires through the format path too (fresh datasets per
    // measurement: a re-collected plan reports stale driver metrics)
    val total = scannedFiles(load())
    assert(scannedFiles(load().where(col("k") >= 30L)) < total)
    // time travel: version 0 holds only the first ranged append
    val v0 = spark.read.format("graft-lake").option("root", root)
      .option("version", "0").load()
    assert(rows(v0) === (0L until 10L).map(k => Seq(k, s"t$k")).toSet)
    intercept[java.util.NoSuchElementException] {
      spark.read.format("graft-lake").option("root", root)
        .option("version", "99").load()
    }
  }

  test("df.write.format(graft-lake) commits by SaveMode contract") {
    val root = tmpTable("graft-lakesql-write")
    def write(df: org.apache.spark.sql.DataFrame,
        mode: String): Unit =
      df.write.format("graft-lake").option("root", root).mode(mode).save()

    write(Seq((1L, "a")).toDF("k", "t"), "errorifexists")
    assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(1L, "a")))
    intercept[IllegalStateException] {
      write(Seq((9L, "x")).toDF("k", "t"), "errorifexists")
    }
    write(Seq((2L, "b")).toDF("k", "t"), "append")
    assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(1L, "a"), Seq(2L, "b")))
    write(Seq((9L, "x")).toDF("k", "t"), "ignore") // exists: untouched
    assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(1L, "a"), Seq(2L, "b")))
    write(Seq((3L, "c")).toDF("k", "t"), "overwrite")
    assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(3L, "c")))
    // and the write's returned relation reads back through the index
    assert(rows(spark.read.format("graft-lake").option("root", root).load())
      === Set(Seq(3L, "c")))
  }

  test("CREATE TABLE USING graft-lake: catalog tables resolve the LIVE snapshot per query") {
    val root = tmpTable("graft-lakesql-cat")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS lakesql_cat")
    spark.sql(
      s"CREATE TABLE lakesql_cat USING `graft-lake` OPTIONS (root '$root')")
    try {
      assert(rows(spark.sql("SELECT * FROM lakesql_cat")) === Set(Seq(1L, "a")))
      // Spark caches the resolved relation, so the table stays on its
      // snapshot until the standard lever — REFRESH TABLE — which
      // re-invokes the provider and pins the new live version
      Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
      assert(rows(spark.sql("SELECT * FROM lakesql_cat")) === Set(Seq(1L, "a")))
      spark.sql("REFRESH TABLE lakesql_cat")
      assert(rows(spark.sql("SELECT * FROM lakesql_cat")) ===
        Set(Seq(1L, "a"), Seq(2L, "b")))
      // the version option works through DDL too: SQL time travel
      spark.sql("DROP TABLE IF EXISTS lakesql_cat_v0")
      spark.sql(s"CREATE TABLE lakesql_cat_v0 USING `graft-lake` " +
        s"OPTIONS (root '$root', version '0')")
      assert(rows(spark.sql("SELECT * FROM lakesql_cat_v0")) === Set(Seq(1L, "a")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS lakesql_cat")
      spark.sql("DROP TABLE IF EXISTS lakesql_cat_v0")
      ()
    }
  }

  test("SQL INSERT INTO/OVERWRITE commit through the manifest — never a silent root write") {
    val root = tmpTable("graft-lakesql-ins")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS lakesql_ins")
    spark.sql(
      s"CREATE TABLE lakesql_ins USING `graft-lake` OPTIONS (root '$root')")
    try {
      // INSERT INTO = a real append commit: visible to SQL WITHOUT a
      // manual REFRESH (the command invalidates the cached relation,
      // the DML contract), to readCommitted, and to the change feed;
      // the manifest records the op
      spark.sql("INSERT INTO lakesql_ins VALUES (2, 'b')")
      assert(rows(Lake.readCommitted(spark, root)) ===
        Set(Seq(1L, "a"), Seq(2L, "b")))
      assert(rows(spark.sql("SELECT * FROM lakesql_ins")) ===
        Set(Seq(1L, "a"), Seq(2L, "b")))
      assert(Lake.currentVersion(spark, root) === Some(1L))
      // no stray parquet files at the table root (the silent-loss
      // failure mode this rule exists to prevent)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
      assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root)).exists(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")))
      // INSERT OVERWRITE = a snapshot replace, same protocol, same
      // no-REFRESH visibility
      spark.sql("INSERT OVERWRITE lakesql_ins VALUES (9, 'z')")
      assert(rows(Lake.readCommitted(spark, root)) === Set(Seq(9L, "z")))
      assert(rows(spark.sql("SELECT * FROM lakesql_ins")) === Set(Seq(9L, "z")))
      // time travel still serves the pre-overwrite snapshot
      assert(rows(Lake.readCommittedAt(spark, root, 1L)) ===
        Set(Seq(1L, "a"), Seq(2L, "b")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS lakesql_ins")
      ()
    }
  }

  test("SQL DELETE/UPDATE commit through the COW engines — feed-visible, time travel intact, no REFRESH needed") {
    val root = tmpTable("graft-lakesql-dml")
    Lake.commitOverwrite(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
        .toDF("k", "t", "v"), root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS lakesql_dml")
    spark.sql(
      s"CREATE TABLE lakesql_dml USING `graft-lake` OPTIONS (root '$root')")
    try {
      spark.sql("DELETE FROM lakesql_dml WHERE k = 1")
      assert(rows(Lake.readCommitted(spark, root)) ===
        Set(Seq(2L, "b", 20.0), Seq(3L, "c", 30.0), Seq(4L, "d", 40.0)))
      // the DML command refreshes the catalog relation itself: SQL
      // reads see the commit without an explicit REFRESH TABLE
      assert(rows(spark.sql("SELECT * FROM lakesql_dml")) ===
        Set(Seq(2L, "b", 20.0), Seq(3L, "c", 30.0), Seq(4L, "d", 40.0)))
      // the change feed carries the row-level delete, and time travel
      // still serves the pre-DML snapshot
      assert(rows(Lake.changesBetween(spark, root, 0L, 1L, Seq("k"))
        .select(col("k"), col("change_type"))) === Set(Seq(1L, "delete")))
      assert(rows(Lake.readCommittedAt(spark, root, 0L)).size === 4)
      // multi-assignment UPDATE with expressions over the row
      spark.sql("UPDATE lakesql_dml SET v = v + 5, t = upper(t) WHERE k >= 3")
      assert(rows(spark.sql("SELECT * FROM lakesql_dml")) ===
        Set(Seq(2L, "b", 20.0), Seq(3L, "C", 35.0), Seq(4L, "D", 45.0)))
      assert(rows(Lake.changesBetween(spark, root, 1L, 2L, Seq("k"))
        .select(col("k"), col("change_type"))) ===
        Set(Seq(3L, "update_preimage"), Seq(3L, "update_postimage"),
          Seq(4L, "update_preimage"), Seq(4L, "update_postimage")))
      // ops recorded in history (DML commits use the default
      // retention, so only the recent window stays readable)
      val hist = Lake.describeHistory(spark, root).select("version", "op")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(hist(1L) === "delete" && hist(2L) === "update")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lakesql_dml")
      ()
    }
  }

  test("SQL MERGE INTO: conditional upsert, delete, BY SOURCE, cardinality violation, loud refusals") {
    val root = tmpTable("graft-lakesql-mrg")
    Lake.commitOverwrite(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("k", "t", "v"), root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS lakesql_mrg")
    spark.sql(
      s"CREATE TABLE lakesql_mrg USING `graft-lake` OPTIONS (root '$root')")
    try {
      // conditional update + INSERT * upsert
      spark.sql("""MERGE INTO lakesql_mrg tg
        |USING (SELECT * FROM VALUES (2, 'zz', 99.0), (7, 'gg', 70.0)
        |       AS s(k, t, v)) s
        |ON tg.k = s.k
        |WHEN MATCHED AND tg.v < 25 THEN UPDATE SET v = s.v, t = s.t
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(rows(spark.sql("SELECT * FROM lakesql_mrg")) ===
        Set(Seq(1L, "a", 10.0), Seq(2L, "zz", 99.0), Seq(3L, "c", 30.0),
          Seq(7L, "gg", 70.0)))
      // MATCHED DELETE + NOT MATCHED BY SOURCE UPDATE (whole-snapshot
      // rewrite by definition)
      spark.sql("""MERGE INTO lakesql_mrg tg
        |USING (SELECT 7 AS k) s
        |ON tg.k = s.k
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED BY SOURCE AND tg.k > 2 THEN UPDATE SET t = 'kept'
        |""".stripMargin)
      assert(rows(spark.sql("SELECT * FROM lakesql_mrg")) ===
        Set(Seq(1L, "a", 10.0), Seq(2L, "zz", 99.0), Seq(3L, "kept", 30.0)))
      // a target row matched by two source rows is a cardinality
      // violation — the job fails, the table is unchanged
      val before = rows(Lake.readCommitted(spark, root))
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO lakesql_mrg tg
          |USING (SELECT * FROM VALUES (2, 'p'), (2, 'q') AS s(k, t)) s
          |ON tg.k = s.k
          |WHEN MATCHED THEN UPDATE SET t = s.t""".stripMargin)
      }
      assert(e.getMessage != null &&
        e.getMessage.contains("MERGE cardinality violation"))
      assert(rows(Lake.readCommitted(spark, root)) === before)
      // non-equi ON refuses loudly, naming the programmatic path
      val ne = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO lakesql_mrg tg
          |USING (SELECT 1 AS k) s ON tg.k > s.k
          |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(ne.getMessage.contains("conjunction of target-column"))
      // subquery conditions refuse loudly
      val sq = intercept[UnsupportedOperationException] {
        spark.sql(
          "DELETE FROM lakesql_mrg WHERE k IN (SELECT k FROM lakesql_mrg)")
      }
      assert(sq.getMessage.contains("subquery"))
      // DML on a time-travel handle refuses (commits advance the LIVE
      // table; a pinned reader must never think it wrote "its" version)
      val live = Lake.currentVersion(spark, root).get
      spark.sql("DROP TABLE IF EXISTS lakesql_mrg_v0")
      spark.sql(s"CREATE TABLE lakesql_mrg_v0 USING `graft-lake` " +
        s"OPTIONS (root '$root', version '$live')")
      val tt = intercept[UnsupportedOperationException] {
        spark.sql("DELETE FROM lakesql_mrg_v0 WHERE k = 1")
      }
      assert(tt.getMessage.contains("time-travel"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS lakesql_mrg")
      spark.sql("DROP TABLE IF EXISTS lakesql_mrg_v0")
      ()
    }
  }

  test("SQL INSERT into a partitioned lake table inherits the layout: new dirs per value, pruning exact") {
    val root = tmpTable("graft-lakesql-partins")
    Lake.commitOverwrite(
      Seq((1L, 1995L, "a"), (2L, 1996L, "b")).toDF("k", "y", "t"), root,
      retain = 8, partitionBy = Seq("y"))
    spark.sql("DROP TABLE IF EXISTS lakesql_partins")
    spark.sql(
      s"CREATE TABLE lakesql_partins USING `graft-lake` OPTIONS (root '$root')")
    try {
      // the INSERT routes through commitAppend, which inherits the
      // declared layout: two new partition dirs, one per value
      spark.sql(
        "INSERT INTO lakesql_partins VALUES (3, 1995, 'c'), (4, 1997, 'd')")
      assert(rows(Lake.readCommitted(spark, root)) ===
        Set(Seq(1L, 1995L, "a"), Seq(2L, 1996L, "b"),
          Seq(3L, 1995L, "c"), Seq(4L, 1997L, "d")))
      assert(rows(Lake.partitionValues(spark, root)) ===
        Set(Seq(1995L, 2L), Seq(1996L, 1L), Seq(1997L, 1L)))
      val (kept, skipped, _) = Lake.resolveWhere(spark, root, col("y") === 1995L)
      assert(kept.length === 2 && skipped.length === 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lakesql_partins")
      ()
    }
  }

  test("CREATE TABLE ... PARTITIONED BY is honored: the first INSERT establishes the lake layout; mismatches refuse") {
    val root = tmpTable("graft-lakesql-ddlpart")
    Lake.commitOverwrite(Seq((1L, 1995L)).toDF("k", "y"), root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS lakesql_ddlpart")
    spark.sql(s"CREATE TABLE lakesql_ddlpart (k BIGINT, y BIGINT) " +
      s"USING `graft-lake` PARTITIONED BY (y) OPTIONS (root '$root')")
    try {
      // pre-layout dir stays value-less (conservatively scanned); the
      // INSERT establishes #partcols=y from the DDL and stages its
      // rows one dir per value
      spark.sql("INSERT INTO lakesql_ddlpart VALUES (2, 1996), (3, 1996), (4, 1997)")
      assert(rows(Lake.partitionValues(spark, root)) ===
        Set(Seq(1996L, 1L), Seq(1997L, 1L)))
      assert(rows(Lake.readCommitted(spark, root)) ===
        Set(Seq(1L, 1995L), Seq(2L, 1996L), Seq(3L, 1996L), Seq(4L, 1997L)))
      // static PARTITION (col=value) specs refuse loudly — Spark's
      // analyzer already rejects them against the relation's empty
      // partition schema (values travel in the rows here); the rule's
      // own require is the backstop for any path that slips through
      val sp = intercept[Exception] {
        spark.sql("INSERT INTO lakesql_ddlpart PARTITION (y=1998) VALUES (5)")
      }
      assert(sp.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        sp.getMessage.contains("static PARTITION"))
      assert(rows(Lake.readCommitted(spark, root)).size === 4,
        "a refused static-partition INSERT must not commit")
      // a DDL declaration diverging from an established layout is
      // FORWARD EVOLUTION (Iceberg's spec evolution): the INSERT
      // stages under the DDL's layout, old dirs keep their tuples
      val other = tmpTable("graft-lakesql-ddlpart2")
      Lake.commitOverwrite(Seq((1L, 5L)).toDF("k", "y"), other, retain = 8,
        partitionBy = Seq("k"))
      spark.sql("DROP TABLE IF EXISTS lakesql_ddlpart2")
      spark.sql(s"CREATE TABLE lakesql_ddlpart2 (k BIGINT, y BIGINT) " +
        s"USING `graft-lake` PARTITIONED BY (y) OPTIONS (root '$other')")
      spark.sql("INSERT INTO lakesql_ddlpart2 VALUES (2, 6)")
      assert(rows(spark.sql("SELECT k, y FROM lakesql_ddlpart2")) ===
        Set(Seq(1L, 5L), Seq(2L, 6L)))
      // the new generation's dir carries a y tuple (evolved layout)
      assert(rows(Lake.partitionValues(spark, other))
        .exists(r => r.head == 6L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS lakesql_ddlpart")
      spark.sql("DROP TABLE IF EXISTS lakesql_ddlpart2")
      ()
    }
  }

  test("SHOW PARTITIONS: manifest-layout report as SQL, path and catalog forms") {
    val root = tmpTable("graft-lakesql-showparts")
    Lake.commitOverwrite(
      Seq((1L, 1995L), (2L, 1995L), (3L, 1996L)).toDF("k", "y"),
      root, retain = 8, partitionBy = Seq("y"))
    Lake.commitAppend(Seq((4L, 1995L)).toDF("k", "y"), root, retain = 8)
    // path form (delegating parser)
    val byPath = spark.sql(s"SHOW PARTITIONS '$root'").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byPath === Seq(("y=1995", 2L), ("y=1996", 1L)))
    // catalog form (Hints-batch rule); non-lake tables keep Spark's own
    spark.sql("DROP TABLE IF EXISTS showparts_sql")
    spark.sql(
      s"CREATE TABLE showparts_sql USING `graft-lake` OPTIONS (root '$root')")
    assert(spark.sql("SHOW PARTITIONS showparts_sql").collect()
      .map(_.getString(0)).toSeq === Seq("y=1995", "y=1996"))
    // a PARTITION (…) filter spec refuses (filter the output instead)
    intercept[Exception] {
      spark.sql("SHOW PARTITIONS showparts_sql PARTITION (y=1995)")
    }
    spark.sql("DROP TABLE showparts_sql")
    // unpartitioned tables refuse with the programmatic message
    val flat = tmpTable("graft-lakesql-showflat")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), flat)
    assert(intercept[IllegalArgumentException] {
      spark.sql(s"SHOW PARTITIONS '$flat'").collect()
    }.getMessage.contains("no partition columns"))
  }

  test("parquet footer pushdown still rides along under the lake index") {
    val root = rangedTable()
    val q = Lake.sqlTable(spark, root).where(col("k") === 5L)
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("EqualTo"))),
      "expected EqualTo pushed to the parquet reader")
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF pin snapshots; non-lake tables keep the standard refusal") {
    import spark.implicits._
    val root = tmpTable("lakesql-tt")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS lakesql_tt")
    try {
      spark.sql(s"CREATE TABLE lakesql_tt USING `graft-lake` OPTIONS (root '$root')")
      // both grammars, pinned to the first commit
      assert(rows(spark.sql("SELECT k FROM lakesql_tt VERSION AS OF 0")) ===
        Set(Seq(1L)))
      assert(rows(spark.sql("SELECT k FROM lakesql_tt FOR VERSION AS OF 0")) ===
        Set(Seq(1L)))
      // a far-future TIMESTAMP AS OF resolves to the LATEST commit
      assert(rows(spark.sql(
        "SELECT k FROM lakesql_tt TIMESTAMP AS OF '9999-01-01 00:00:00'")) ===
        Set(Seq(1L), Seq(2L)))
      // two versions of one table join in a single statement, each
      // side planned from its own manifest
      assert(rows(spark.sql(
        """SELECT cur.k FROM lakesql_tt cur
          |LEFT ANTI JOIN lakesql_tt VERSION AS OF 0 v0 ON cur.k = v0.k
          |""".stripMargin)) === Set(Seq(2L)))
      // a timestamp before every retained commit refuses with the
      // readable horizon, not a silent empty read
      val early = intercept[java.util.NoSuchElementException] {
        spark.sql(
          "SELECT k FROM lakesql_tt TIMESTAMP AS OF '1990-01-01 00:00:00'")
      }
      assert(early.getMessage.contains("no version committed at or before"))
      // an uncommitted version refuses through the pinned-read gate
      val missing = intercept[java.util.NoSuchElementException] {
        spark.sql("SELECT k FROM lakesql_tt VERSION AS OF 99")
      }
      assert(missing.getMessage.contains("not committed"))
      // a non-literal timestamp expression refuses with the contract
      // named (the rule runs before expression resolution)
      val fn = intercept[IllegalArgumentException] {
        spark.sql("SELECT k FROM lakesql_tt TIMESTAMP AS OF current_date()")
      }
      assert(fn.getMessage.contains("constant literal"))
      // non-lake catalog tables keep Spark's standard refusal — the
      // hint rule passes anything without the graft-lake provider
      spark.sql("DROP TABLE IF EXISTS lakesql_tt_plain")
      spark.sql("CREATE TABLE lakesql_tt_plain (k BIGINT) USING parquet")
      try {
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql("SELECT k FROM lakesql_tt_plain VERSION AS OF 0")
        }
        assert(e.getMessage.contains("Time travel"))
      } finally {
        spark.sql("DROP TABLE IF EXISTS lakesql_tt_plain"); ()
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS lakesql_tt"); ()
    }
  }

  test("SQL constraint DDL: ALTER TABLE ADD/DROP CONSTRAINT gates writes through the manifest property") {
    import spark.implicits._
    val root = tmpTable("lakesql-cons")
    Lake.commitOverwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), root,
      retain = 8)
    spark.sql("DROP TABLE IF EXISTS lakesql_cons")
    try {
      spark.sql(s"CREATE TABLE lakesql_cons USING `graft-lake` OPTIONS (root '$root')")
      spark.sql("ALTER TABLE lakesql_cons ADD CONSTRAINT v_pos CHECK (v > 0)")
      assert(Lake.checkConstraints(spark, root) === Seq("v_pos" -> "v > 0"))
      // the gate holds on the SQL write path too
      val bad = intercept[Exception] {
        spark.sql("INSERT INTO lakesql_cons VALUES (3, -1.0)")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(bad).exists(_.contains("v_pos")))
      assert(spark.sql("SELECT count(*) AS n FROM lakesql_cons")
        .collect().head.getLong(0) === 2L)
      // adding a constraint the existing rows violate refuses
      val pre = intercept[IllegalArgumentException] {
        spark.sql("ALTER TABLE lakesql_cons ADD CONSTRAINT v_big CHECK (v > 15)")
      }
      assert(pre.getMessage.contains("existing rows violate"))
      // NOT ENFORCED is refused for CHECK by Spark's own parser (and
      // belt-and-braces by the rule); the explicit ENFORCED spelling
      // routes through and gates like the bare form
      val ne = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
        spark.sql(
          "ALTER TABLE lakesql_cons ADD CONSTRAINT v_ne CHECK (v > 0) NOT ENFORCED")
      }
      assert(ne.getMessage.contains("NOT ENFORCED"))
      spark.sql(
        "ALTER TABLE lakesql_cons ADD CONSTRAINT v_cap CHECK (v < 1e9) ENFORCED")
      assert(Lake.checkConstraints(spark, root).map(_._1) ===
        Seq("v_pos", "v_cap"))
      spark.sql("ALTER TABLE lakesql_cons DROP CONSTRAINT v_cap")
      // drop lifts the gate; IF EXISTS tolerates absence
      spark.sql("ALTER TABLE lakesql_cons DROP CONSTRAINT v_pos")
      spark.sql("ALTER TABLE lakesql_cons DROP CONSTRAINT IF EXISTS v_pos")
      spark.sql("INSERT INTO lakesql_cons VALUES (3, -1.0)")
      assert(spark.sql("SELECT count(*) AS n FROM lakesql_cons")
        .collect().head.getLong(0) === 3L)
      // non-lake tables keep the standard refusal
      spark.sql("DROP TABLE IF EXISTS lakesql_cons_plain")
      spark.sql("CREATE TABLE lakesql_cons_plain (k BIGINT) USING parquet")
      try {
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql(
            "ALTER TABLE lakesql_cons_plain ADD CONSTRAINT c CHECK (k > 0)")
        }
        assert(e.getMessage.contains("does not support"))
      } finally { spark.sql("DROP TABLE IF EXISTS lakesql_cons_plain"); () }
    } finally { spark.sql("DROP TABLE IF EXISTS lakesql_cons"); () }
  }

  test("metadata table functions: graft_history and graft_partitions answer from the manifest in SQL") {
    import spark.implicits._
    val root = tmpTable("lakesql-tvf")
    Lake.commitOverwrite(Seq((1L, 1995L), (2L, 1996L)).toDF("k", "y"), root,
      retain = 8, partitionBy = Seq("y"))
    Lake.commitAppend(Seq((3L, 1995L)).toDF("k", "y"), root, retain = 8)
    Lake.deleteWhere(spark, root, col("y") === 1996L, retain = 8)
    // DESCRIBE HISTORY spelling: op per version, newest last
    val hist = spark.sql(
      s"SELECT version, op FROM graft_history('$root') ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hist === Seq((0L, "overwrite"), (1L, "append"), (2L, "delete")))
    // SHOW PARTITIONS spelling: live tuples with dir counts — the
    // y=1996 partition was dropped by the delete
    assert(rows(spark.sql(
      s"SELECT y, n_dirs FROM graft_partitions('$root') ORDER BY y")) ===
      Set(Seq(1995L, 2L)))
    // table_changes spelling: the NET row-level changes v0 -> v2 in
    // SQL — the append's insert and the delete's retraction
    val ch = spark.sql(
      s"""SELECT k, change_type FROM graft_changes('$root', 0, 2, 'k')
         |ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ch === Seq((2L, "delete"), (3L, "insert")))
    // wrong arity / non-literal refuses with the function named
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_history()")
    }
    assert(e.getMessage.contains("graft_history"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_changes('x', 0)")
    }
    assert(e2.getMessage.contains("graft_changes"))
  }

  test("graft_changes timestamp boundaries: instants resolve via #ts=, horizon misses refuse") {
    import org.apache.spark.sql.functions.col
    val root = tmpTable("lakesql-tsch")
    Lake.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root,
      retain = 8)                                               // v0
    Thread.sleep(10) // #ts= lines are millisecond-granular
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8) // v1
    Thread.sleep(10)
    Lake.deleteWhere(spark, root, col("k") === 2L, retain = 8)  // v2
    val ts = Lake.describeHistory(spark, root).orderBy("version")
      .select("commit_ts").collect().map(_.getTimestamp(0))
    val want = Seq((2L, "delete"), (3L, "insert"))
    def changes(fromLit: String, toLit: String): Seq[(Long, String)] =
      spark.sql(s"SELECT k, change_type FROM " +
        s"graft_changes('$root', $fromLit, $toLit, 'k') ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(changes("0", "2") === want)
    // timestamp literals resolve to the snapshots LIVE at each
    // instant (versionAsOf over the manifests' own commit instants)
    assert(changes(s"TIMESTAMP'${ts(0)}'", s"TIMESTAMP'${ts(2)}'") === want)
    // plain strings parse as instants in the session zone
    assert(changes(s"'${ts(0)}'", s"'${ts(2)}'") === want)
    // mixed version + instant boundaries compose
    assert(changes("0", s"'${ts(2)}'") === want)
    // an instant between v0 and v1 resolves to v0 (latest at-or-
    // before): same feed
    val mid = new java.sql.Timestamp(ts(0).getTime + 5)
    assert(changes(s"'$mid'", "2") === want)
    // programmatic spelling
    assert(Lake.changesBetweenInstants(spark, root, ts(0), ts(2), Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type")))
      .toSeq === want)
    // an instant predating the whole retained horizon refuses fast,
    // naming what IS readable
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM " +
        s"graft_changes('$root', '1990-01-01 00:00:00', 2, 'k')").collect()
    }
    assert(e.getMessage.contains("no version committed"))
    // an unparseable boundary refuses with the contract named
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM " +
        s"graft_changes('$root', 'not-a-time', 2, 'k')").collect()
    }
    assert(e2.getMessage.contains("does not parse") ||
      e2.getMessage.contains("cannot be cast")) // ANSI cast names it first
    // RESTORE TO TIMESTAMP AS OF resolves through the same instants:
    // restoring to v1's instant rolls the delete back
    spark.sql(s"RESTORE TABLE '$root' TO TIMESTAMP AS OF '${ts(1)}'")
    assert(Lake.readCommitted(spark, root).count() === 3L)
    val e3 = intercept[Exception] {
      spark.sql(s"RESTORE TABLE '$root' TO TIMESTAMP AS OF 'junk'")
    }
    assert(e3.getMessage.contains("does not parse") ||
      e3.getMessage.contains("cannot be cast")) // ANSI cast names it first
  }

  test("CONVERT TO GRAFT adopts a plain parquet dir in place; SHALLOW CLONE SQL spellings") {
    import org.apache.spark.sql.functions.col
    // CONVERT: flat parquet dir → lake table, file moves only
    val dir = tmpTable("lakesql-convert")
    (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v").coalesce(2)
      .write.mode("overwrite").parquet(dir)
    val v0 = spark.sql(s"CONVERT TO GRAFT '$dir' STATS BY (k)")
      .collect().head.getLong(0)
    assert(v0 === 0L)
    assert(Lake.readCommitted(spark, dir).count() === 100L)
    // the converted dir is a REAL lake table: stats prune, DML works
    val (_, skipped, _) = Lake.resolveWhere(spark, dir, col("k") > 1000L)
    assert(skipped.nonEmpty, "converted stats must prune")
    Lake.deleteWhere(spark, dir, col("k") === 1L, retain = 8)
    assert(Lake.readCommitted(spark, dir).count() === 99L)
    assert(Lake.readCommittedAt(spark, dir, 0L).count() === 100L)
    // converting an existing lake table refuses
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"CONVERT TO GRAFT '$dir'").collect()
    }
    assert(e.getMessage.contains("already exists"))
    // a hive-partitioned (subdir) layout refuses with the alternative
    val hive = tmpTable("lakesql-convert-hive")
    Seq((1L, "a")).toDF("k", "p").write.partitionBy("p")
      .mode("overwrite").parquet(hive)
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"CONVERT TO GRAFT '$hive'").collect()
    }
    assert(e2.getMessage.contains("FLAT"))
    // SHALLOW CLONE, path form + version pin
    val cl = tmpTable("lakesql-clonepath")
    spark.sql(s"CREATE TABLE '$cl' SHALLOW CLONE '$dir'")
    assert(Lake.readCommitted(spark, cl).count() === 99L)
    val cl0 = tmpTable("lakesql-clonev0")
    spark.sql(s"CREATE TABLE '$cl0' SHALLOW CLONE '$dir' VERSION AS OF 0")
    assert(Lake.readCommitted(spark, cl0).count() === 100L)
    // catalog-ident destination registers a graft-lake table at the
    // session catalog's default path (DROP TABLE keeps external
    // files, so a rerun must clear the default path first)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf)
      f.delete(); ()
    }
    def clearDefaultPath(): Unit = rmrf(new java.io.File(new java.net.URI(
      new org.apache.hadoop.fs.Path(spark.sessionState.catalog
        .defaultTablePath(org.apache.spark.sql.catalyst
          .TableIdentifier("clone_cat"))).toString)))
    spark.sql("DROP TABLE IF EXISTS clone_cat")
    clearDefaultPath()
    try {
      spark.sql(s"CREATE TABLE clone_cat SHALLOW CLONE '$dir'")
      assert(spark.sql("SELECT count(*) AS n FROM clone_cat").collect()
        .head.getLong(0) === 99L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS clone_cat")
      clearDefaultPath()
    }
  }

  test("SQL maintenance spellings: OPTIMIZE / VACUUM / RESTORE / DESCRIBE HISTORY") {
    val root = tmpTable("lakesql-maint")
    // a fragmented table: four small appends
    (0L until 4L).foreach { b =>
      Lake.commitAppend(
        (b * 10L until (b + 1) * 10L).map(k => (k, k * 2L)).toDF("k", "v"),
        root, retain = 8, rowCount = Some(10L), statsCols = Seq("k"))
      ()
    }
    spark.sql("DROP TABLE IF EXISTS maint_sql")
    spark.sql(s"CREATE TABLE maint_sql USING `graft-lake` OPTIONS (root '$root')")
    // plain OPTIMIZE: incremental bin-packing — four small dirs
    // collapse into one, rows unchanged, catalog SELECT follows
    val preDirs = Lake.resolve(spark, root).size
    val vOpt = spark.sql("OPTIMIZE maint_sql").collect().head.getLong(0)
    assert(Lake.resolve(spark, root).size < preDirs)
    assert(spark.sql("SELECT count(*) AS n FROM maint_sql").collect()
      .head.getLong(0) === 40L)
    // OPTIMIZE ZORDER BY: clustered rewrite, op recorded, rows stable
    val vZ = spark.sql("OPTIMIZE maint_sql ZORDER BY (k)").collect()
      .head.getLong(0)
    assert(spark.sql("SELECT sum(v) AS s FROM maint_sql").collect()
      .head.getLong(0) === (0L until 40L).map(_ * 2).sum)
    // OPTIMIZE WHERE without ZORDER refuses loudly
    val we = intercept[IllegalArgumentException] {
      spark.sql("OPTIMIZE maint_sql WHERE k < 10")
    }
    assert(we.getMessage.contains("ZORDER"))
    // DESCRIBE HISTORY: audit rows, newest op last; quoted-root form too
    val hist = spark.sql("DESCRIBE HISTORY maint_sql").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(hist(vOpt).contains("compact") && hist(vZ).contains("zorder"))
    assert(spark.sql(s"DESCRIBE HISTORY '$root'").count() ===
      Lake.readableVersions(spark, root).size.toLong)
    // RESTORE TABLE … TO VERSION AS OF: rows revert, SELECT follows
    spark.sql("DELETE FROM maint_sql WHERE k >= 20")
    assert(spark.sql("SELECT count(*) AS n FROM maint_sql").collect()
      .head.getLong(0) === 20L)
    val vR = spark.sql(
      s"RESTORE TABLE maint_sql TO VERSION AS OF $vZ").collect()
      .head.getLong(0)
    assert(vR > vZ)
    assert(spark.sql("SELECT count(*) AS n FROM maint_sql").collect()
      .head.getLong(0) === 40L)
    // VACUUM sweeps a crash-abandoned staged dir past the horizon
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "zdeadbeefcafe"))
    // DRY RUN reports the same counts WITHOUT deleting (the audit
    // step before enforcing a horizon)
    val dry = spark.sql("VACUUM maint_sql RETAIN 0 HOURS DRY RUN")
      .collect().head
    assert(dry.getLong(1) >= 1L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "zdeadbeefcafe")),
      "DRY RUN must not delete")
    val swept = spark.sql("VACUUM maint_sql RETAIN 0 HOURS").collect().head
    assert(swept.getLong(1) >= 1L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "zdeadbeefcafe")))
    assert(spark.sql("SELECT count(*) AS n FROM maint_sql").collect()
      .head.getLong(0) === 40L)
    // a non-lake target refuses with the table named; standard
    // statements pass through the delegating parser untouched
    spark.sql("DROP TABLE IF EXISTS maint_plain")
    spark.sql("CREATE TABLE maint_plain (k BIGINT) USING parquet")
    val ne = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("OPTIMIZE maint_plain")
    }
    assert(ne.getMessage.contains("maint_plain"))
    assert(spark.sql("SELECT 1 AS one").collect().head.getInt(0) === 1)
    spark.sql("DROP TABLE maint_sql")
    spark.sql("DROP TABLE maint_plain")
  }

  test("CREATE TABLE ... AS SELECT commits the query result as the table's v0") {
    val root = tmpTable("lakesql-ctas")
    spark.sql("DROP TABLE IF EXISTS ctas_t")
    spark.sql(s"CREATE TABLE ctas_t USING `graft-lake` OPTIONS (root '$root') " +
      "AS SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v FROM range(100)")
    // the write went through the manifest protocol, not a raw file dump
    assert(Lake.currentVersion(spark, root).contains(0L))
    assert(spark.sql("SELECT count(*) AS n FROM ctas_t").collect()
      .head.getLong(0) === 100L)
    assert(Lake.readCommitted(spark, root).count() === 100L)
    // and the table is a full citizen: DML + time travel work on it
    spark.sql("DELETE FROM ctas_t WHERE k < 10")
    assert(spark.sql("SELECT count(*) AS n FROM ctas_t").collect()
      .head.getLong(0) === 90L)
    spark.sql("DROP TABLE ctas_t")
  }

  test("MERGE WITH SCHEMA EVOLUTION lands the drifted column (round-17 lift of the refusal)") {
    val root = tmpTable("lakesql-mergeevo")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS mergeevo_t")
    spark.sql(s"CREATE TABLE mergeevo_t USING `graft-lake` OPTIONS (root '$root')")
    // the round-16 refusal is LIFTED: the pre-resolution rule evolves
    // the schema first, so INSERT * keeps the source-only column
    // instead of silently dropping it (the hazard the refusal guarded)
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO mergeevo_t t " +
      "USING (SELECT CAST(2 AS BIGINT) AS k, 'b' AS t, CAST(1.5 AS DOUBLE) AS extra) s " +
      "ON t.k = s.k WHEN NOT MATCHED THEN INSERT *")
    assert(rows(spark.sql("SELECT k, t, extra FROM mergeevo_t")) ===
      Set(Seq(1L, "a", null), Seq(2L, "b", 1.5)))
    // the plain spelling still works against the evolved table
    spark.sql("MERGE INTO mergeevo_t t USING (SELECT CAST(3 AS BIGINT) " +
      "AS k, 'c' AS t) s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT (k, t) VALUES (s.k, s.t)")
    assert(spark.sql("SELECT count(*) AS n FROM mergeevo_t").collect()
      .head.getLong(0) === 3L)
    spark.sql("DROP TABLE mergeevo_t")
  }

  test("governed CREATE TABLE: IDENTITY + DEFAULT + GENERATED ALWAYS AS in one statement; an omitting insert materializes all three") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-create-gov").resolve("t").toString
    spark.sql("DROP TABLE IF EXISTS gov_create")
    spark.sql(
      s"""CREATE TABLE gov_create (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY,
         |  name STRING,
         |  score DOUBLE DEFAULT 0.5,
         |  n BIGINT,
         |  feat BIGINT GENERATED ALWAYS AS (n * 2)
         |) USING `graft-lake` OPTIONS (root '$root')""".stripMargin)
    // the table is BORN governed: one insert omitting id/score/feat
    // allocates, defaults and materializes
    spark.sql("INSERT INTO gov_create (name, n) VALUES ('a', 10), ('b', 20)")
    assert(rows(spark.sql(
      "SELECT id, name, score, n, feat FROM gov_create ORDER BY id")) ===
      Set(Seq(1L, "a", 0.5, 10L, 20L), Seq(2L, "b", 0.5, 20L, 40L)))
    // declarations live in the manifest, not just the catalog
    assert(graft.sources.Lake.identityColumn(spark, root) ===
      Some(("id", 3L)))
    // explicit identity values refuse (ALWAYS)
    assert(intercept[Exception] {
      spark.sql("INSERT INTO gov_create VALUES (9, 'x', 1.0, 1, 2)")
    }.getMessage.contains("GENERATED ALWAYS"))
    // a stale generated copy refuses row-for-row
    assert(intercept[Exception] {
      spark.sql("INSERT INTO gov_create (name, n, feat) " +
        "VALUES ('bad', 5, 99)")
    }.getMessage.contains("gen_feat"))
    spark.sql("DROP TABLE gov_create")

    // BY DEFAULT + START WITH spelling: explicit keys pass, omitted
    // keys allocate from the declared start
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-create-gov2").resolve("t").toString
    spark.sql("DROP TABLE IF EXISTS gov_create2")
    spark.sql(
      s"""CREATE TABLE gov_create2 (
         |  id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 100),
         |  name STRING
         |) USING `graft-lake` OPTIONS (root '$root2')""".stripMargin)
    spark.sql("INSERT INTO gov_create2 VALUES (7, 'seeded')")
    spark.sql("INSERT INTO gov_create2 (name) VALUES ('alloc')")
    assert(rows(spark.sql("SELECT id, name FROM gov_create2")) ===
      Set(Seq(7L, "seeded"), Seq(100L, "alloc")))
    spark.sql("DROP TABLE gov_create2")

    // refusals: non-BIGINT identity, step != 1, an already-committed root
    assert(intercept[Exception] {
      spark.sql("CREATE TABLE gov_bad1 (id INT GENERATED ALWAYS AS " +
        s"IDENTITY, t STRING) USING `graft-lake` OPTIONS (root '${root}_b1')")
    }.getMessage.contains("BIGINT"))
    assert(intercept[Exception] {
      spark.sql("CREATE TABLE gov_bad2 (id BIGINT GENERATED ALWAYS AS " +
        "IDENTITY (INCREMENT BY 2), t STRING) USING `graft-lake` " +
        s"OPTIONS (root '${root}_b2')")
    }.getMessage.contains("step"))
    assert(intercept[Exception] {
      spark.sql("CREATE TABLE gov_bad3 (c INT DEFAULT 5) " +
        s"USING `graft-lake` OPTIONS (root '$root2')")
    }.getMessage.contains("already exists"))
  }

}
