package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Durable table properties (`#prop_<k>=<v>`): TBLPROPERTIES as
  * manifest state. The point — `graft.retain` and `graft.dvMaxRows`
  * were per-call arguments two writers could silently disagree on;
  * now the TABLE owns the default and an explicit per-call value is
  * the override. */
class LakePropsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  test("set/unset round-trip, inheritance by every commit, time travel sees each version's map") {
    val root = tmpTable("graft-props-basic")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    assert(Lake.tableProperties(spark, root) === Map.empty)
    Lake.setTableProperties(spark, root,
      Map("owner" -> "data-eng", "graft.retain" -> "8"))
    assert(Lake.tableProperties(spark, root) ===
      Map("owner" -> "data-eng", "graft.retain" -> "8"))
    // a plain append INHERITS the map (no props argument anywhere)
    Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root)
    assert(Lake.tableProperties(spark, root) ===
      Map("owner" -> "data-eng", "graft.retain" -> "8"))
    // merge semantics: a second SET adds/overwrites only its keys
    Lake.setTableProperties(spark, root, Map("owner" -> "ml-platform"))
    assert(Lake.tableProperties(spark, root)("owner") === "ml-platform")
    // UNSET of an absent key refuses without IF EXISTS, passes with
    intercept[IllegalArgumentException] {
      Lake.unsetTableProperties(spark, root, Seq("nope"))
    }
    Lake.unsetTableProperties(spark, root, Seq("nope"), ifExists = true)
    Lake.unsetTableProperties(spark, root, Seq("owner"))
    assert(Lake.tableProperties(spark, root) === Map("graft.retain" -> "8"))
    // grammar/domain gates
    intercept[IllegalArgumentException] {
      Lake.setTableProperties(spark, root, Map("bad=key" -> "v"))
    }
    intercept[IllegalArgumentException] {
      Lake.setTableProperties(spark, root, Map("graft.retain" -> "-3"))
    }
    intercept[IllegalArgumentException] {
      Lake.setTableProperties(spark, root, Map("graft.dvMaxRows" -> "x"))
    }
  }

  test("graft.retain governs commits whose callers pass nothing; explicit arg overrides") {
    val root = tmpTable("graft-props-retain")
    // no property, no arg: the built-in default (1) prunes history
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root)
    Lake.commitOverwrite(Seq((2L, "b")).toDF("k", "t"), root)
    Lake.commitOverwrite(Seq((3L, "c")).toDF("k", "t"), root)
    assert(Lake.readableVersions(spark, root) === Seq(1L, 2L))
    // the property, set ONCE, widens the horizon for argless callers
    Lake.setTableProperties(spark, root, Map(Lake.PropRetain -> "10"))
    Lake.commitOverwrite(Seq((4L, "d")).toDF("k", "t"), root)
    Lake.commitOverwrite(Seq((5L, "e")).toDF("k", "t"), root)
    assert(Lake.readableVersions(spark, root) === Seq(1L, 2L, 3L, 4L, 5L))
    // time travel works across the whole property-kept horizon
    assert(Lake.readCommittedAt(spark, root, 2L).collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    // an EXPLICIT per-call retain still overrides the property
    Lake.commitOverwrite(Seq((6L, "f")).toDF("k", "t"), root, retain = 0)
    assert(Lake.readableVersions(spark, root) === Seq(6L))
    // vacuum with no arg honors the property too (no manifest loss)
    Lake.setTableProperties(spark, root, Map(Lake.PropRetain -> "4"))
    Lake.commitAppend(Seq((7L, "g")).toDF("k", "t"), root)
    val (pruned, _) = Lake.vacuumCommitted(spark, root)
    assert(pruned.isEmpty)
    assert(Lake.readCommitted(spark, root).count() === 2L)
  }

  test("graft.dvMaxRows governs the DELETE/UPDATE/MERGE fast path; explicit arg overrides") {
    val root = tmpTable("graft-props-dv")
    Lake.commitOverwrite((1L to 50L).map(i => (i, i * 2.0)).toDF("k", "v"),
      root, retain = 8)
    // property 0 = DV path OFF: a sparse delete takes copy-on-write
    Lake.setTableProperties(spark, root, Map(Lake.PropDvMaxRows -> "0"))
    Lake.deleteWhere(spark, root, col("k") === 1L)
    assert(Lake.describeHistory(spark, root).orderBy(desc("version"))
      .select("dv_dirs").collect().head.getInt(0) === 0)
    assert(Lake.readCommitted(spark, root).count() === 49L)
    // property raised: the same shape soft-deletes via a vector
    Lake.setTableProperties(spark, root, Map(Lake.PropDvMaxRows -> "1000"))
    Lake.deleteWhere(spark, root, col("k") === 2L)
    val h = Lake.describeHistory(spark, root).orderBy(desc("version"))
      .select("dv_dirs", "dv_rows").collect().head
    assert(h.getInt(0) === 1 && h.getLong(1) === 1L)
    assert(Lake.readCommitted(spark, root).count() === 48L)
    // explicit per-call override beats the property
    Lake.deleteWhere(spark, root, col("k") === 3L, dvMaxRows = 0L)
    assert(Lake.describeHistory(spark, root).orderBy(desc("version"))
      .select("dv_dirs").collect().head.getInt(0) === 0)
    assert(Lake.readCommitted(spark, root).count() === 47L)
  }

  test("OCC: a property commit losing its slot refuses loudly; serialized last-writer-wins per key") {
    val root = tmpTable("graft-props-occ")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    try {
      Lake.beforePublish = () => {
        Lake.beforePublish = () => ()
        Lake.commitAppend(Seq((2L, "b")).toDF("k", "t"), root, retain = 8)
        ()
      }
      intercept[java.util.ConcurrentModificationException] {
        Lake.setTableProperties(spark, root, Map("owner" -> "x"))
      }
      assert(Lake.tableProperties(spark, root) === Map.empty)
      assert(Lake.readCommitted(spark, root).count() === 2L)
      // the retry lands; two SERIALIZED property commits merge by key
      Lake.setTableProperties(spark, root, Map("owner" -> "x", "a" -> "1"))
      Lake.setTableProperties(spark, root, Map("owner" -> "y"))
      assert(Lake.tableProperties(spark, root) ===
        Map("owner" -> "y", "a" -> "1"))
    } finally Lake.beforePublish = () => ()
  }

  test("graft.autoCompact: appends self-compact past the small-dir threshold; off by default; best-effort") {
    val root = tmpTable("graft-props-autocompact")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    (2L to 5L).foreach(i =>
      Lake.commitAppend(Seq((i, s"r$i")).toDF("k", "t"), root, retain = 8))
    // no property: small dirs accumulate — the pathology
    assert(Lake.resolve(spark, root).length === 5)
    // durable retention too: the AUTO-triggered compaction inherits
    // TABLE state (it has no per-call retain), so a table relying on
    // per-call retain args would see the trigger prune history to the
    // built-in default — retention belongs in the property map
    Lake.setTableProperties(spark, root,
      Map(Lake.PropAutoCompact -> "4", Lake.PropRetain -> "8"))
    // the next append sees >= 4 small dirs and bin-packs before returning
    Lake.commitAppend(Seq((6L, "r6")).toDF("k", "t"), root, retain = 8)
    assert(Lake.resolve(spark, root).length === 1,
      s"auto-compact should have bin-packed, dirs = ${Lake.resolve(spark, root)}")
    assert(Lake.readCommitted(spark, root).count() === 6L)
    val hist = Lake.describeHistory(spark, root)
      .orderBy(org.apache.spark.sql.functions.desc("version"))
      .select("op").collect().map(_.getString(0))
    assert(hist.head === "compact" && hist(1) === "append")
    // trigger disarmed until debt rebuilds: next appends just append
    Lake.commitAppend(Seq((7L, "r7")).toDF("k", "t"), root, retain = 8)
    assert(Lake.resolve(spark, root).length === 2)
    assert(Lake.readCommitted(spark, root).count() === 7L)
    // debt rebuilds past the threshold → the trigger re-arms: the
    // 9th append sees 4 small dirs and bin-packs; the two appends
    // after it accumulate again below the threshold
    (8L to 11L).foreach(i =>
      Lake.commitAppend(Seq((i, s"r$i")).toDF("k", "t"), root, retain = 8))
    assert(Lake.resolve(spark, root).length === 3,
      s"re-armed trigger should have bin-packed at the 4-dir point, " +
        s"dirs = ${Lake.resolve(spark, root).length}")
    assert(Lake.describeHistory(spark, root)
      .where(col("op") === "compact").count() === 2L)
    assert(Lake.readCommitted(spark, root).count() === 11L)
    // domain guard
    intercept[IllegalArgumentException] {
      Lake.setTableProperties(spark, root, Map(Lake.PropAutoCompact -> "1"))
    }
  }

  test("auto-compact is best-effort for EVERY failure shape: a fault after the append commits never surfaces") {
    // the append has durably committed before the compaction runs, so
    // ANY throw here would break the atomic-append contract — a caller
    // retrying commitAppend on exception would double-ingest the batch
    val root = tmpTable("graft-props-autocompact-fault")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    (2L to 5L).foreach(i =>
      Lake.commitAppend(Seq((i, s"r$i")).toDF("k", "t"), root, retain = 8))
    Lake.setTableProperties(spark, root,
      Map(Lake.PropAutoCompact -> "4", Lake.PropRetain -> "8"))
    // first publish = the append itself; second = the triggered
    // compaction — fail THAT one with a non-OCC fault (disk full)
    var publishes = 0
    Lake.beforePublish = () => {
      publishes += 1
      if (publishes == 2) {
        Lake.beforePublish = () => ()
        throw new RuntimeException("simulated IO failure mid-compaction")
      }
    }
    try Lake.commitAppend(Seq((6L, "r6")).toDF("k", "t"), root, retain = 8)
    finally Lake.beforePublish = () => ()
    assert(publishes === 2, "the compaction must have been attempted")
    // the append stuck; the compaction was dropped, not surfaced
    assert(Lake.readCommitted(spark, root).count() === 6L)
    assert(Lake.resolve(spark, root).length === 6)
    assert(Lake.describeHistory(spark, root)
      .where(col("op") === "compact").count() === 0L)
    // the next triggering append retries the compaction and succeeds
    Lake.commitAppend(Seq((7L, "r7")).toDF("k", "t"), root, retain = 8)
    assert(Lake.resolve(spark, root).length === 1)
    assert(Lake.readCommitted(spark, root).count() === 7L)
  }

  test("graft.optimizeWrite: tiny appends stage one file instead of one per shuffle partition") {
    def filesOfNewestDir(root: String): Int = {
      val newest = Lake.resolve(spark, root).last
      new java.io.File(new java.net.URI(newest).getPath match {
        case "" => newest; case p => p
      }).listFiles().count(_.getName.endsWith(".parquet"))
    }
    val root = tmpTable("graft-props-optwrite")
    // OFF: a multi-partition tiny batch splinters into many files
    Lake.commitOverwrite(
      spark.range(0, 1000, 1, 8).toDF("k").withColumn("t", col("k") * 2),
      root, retain = 8)
    assert(filesOfNewestDir(root) === 8)
    Lake.setTableProperties(spark, root, Map(Lake.PropOptimizeWrite -> "true"))
    // ON: the same shape coalesces to ONE file (est << 128 MB)
    Lake.commitAppend(
      spark.range(1000, 2000, 1, 8).toDF("k").withColumn("t", col("k") * 2),
      root, retain = 8)
    assert(filesOfNewestDir(root) === 1,
      s"optimize-write should coalesce, got ${filesOfNewestDir(root)} files")
    assert(Lake.readCommitted(spark, root).count() === 2000L)
    // partitioned slices size per tuple too
    val p2 = tmpTable("graft-props-optwrite-part")
    Lake.commitOverwrite(
      spark.range(0, 100, 1, 8).toDF("k").withColumn("p", col("k") % 2),
      p2, retain = 8, partitionBy = Seq("p"))
    Lake.setTableProperties(spark, p2, Map(Lake.PropOptimizeWrite -> "true"))
    Lake.commitAppend(
      spark.range(100, 200, 1, 8).toDF("k").withColumn("p", col("k") % 2),
      p2, retain = 8)
    Lake.resolve(spark, p2).takeRight(2).foreach { d =>
      assert(new java.io.File(new java.net.URI(d).getPath match {
        case "" => d; case q => q
      }).listFiles().count(_.getName.endsWith(".parquet")) === 1)
    }
    assert(Lake.readCommitted(spark, p2).count() === 200L)
    // domain guard
    intercept[IllegalArgumentException] {
      Lake.setTableProperties(spark, root, Map(Lake.PropOptimizeWrite -> "yes"))
    }
  }

  test("SQL spellings: SET/UNSET/SHOW TBLPROPERTIES and DESCRIBE DETAIL, catalog and path forms") {
    val root = tmpTable("graft-props-sql")
    Lake.commitOverwrite((1L to 20L).map(i => (i, s"r$i")).toDF("k", "t"),
      root, retain = 8)
    spark.sql(
      s"CREATE TABLE props_sql USING `graft-lake` OPTIONS (root '$root')")
    try {
      // catalog-ident spelling (Spark grammar → Hints-batch rule)
      // ('owner'/'location'/… are Spark-RESERVED property keys the
      // parser itself refuses — user keys must avoid them)
      spark.sql("ALTER TABLE props_sql SET TBLPROPERTIES " +
        "('dept' = 'data-eng', 'graft.retain' = '6')")
      assert(Lake.tableProperties(spark, root) ===
        Map("dept" -> "data-eng", "graft.retain" -> "6"))
      val shown = spark.sql("SHOW TBLPROPERTIES props_sql").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(shown === Map("dept" -> "data-eng", "graft.retain" -> "6"))
      assert(spark.sql("SHOW TBLPROPERTIES props_sql (dept)").collect()
        .map(_.getString(1)).toSeq === Seq("data-eng"))
      assert(spark.sql("SHOW TBLPROPERTIES props_sql (absent)").count() === 0L)
      spark.sql("ALTER TABLE props_sql UNSET TBLPROPERTIES ('dept')")
      assert(Lake.tableProperties(spark, root) === Map("graft.retain" -> "6"))
      // quoted-path spelling (delegating parser)
      spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES (team = 'ml')")
      assert(spark.sql(s"SHOW TBLPROPERTIES '$root'").count() === 2L)
      // a quoted VALUE may itself contain commas (and '=' ): the pair
      // scanner is quote-aware, not a raw split on ','
      spark.sql(s"ALTER TABLE '$root' SET TBLPROPERTIES " +
        "('owners' = 'a,b', 'note' = 'x=y, z')")
      assert(Lake.tableProperties(spark, root)("owners") === "a,b")
      assert(Lake.tableProperties(spark, root)("note") === "x=y, z")
      spark.sql(s"ALTER TABLE '$root' UNSET TBLPROPERTIES (owners, note)")
      spark.sql(s"ALTER TABLE '$root' UNSET TBLPROPERTIES IF EXISTS " +
        "(team, ghost)")
      assert(Lake.tableProperties(spark, root) === Map("graft.retain" -> "6"))
      // a NON-lake table keeps Spark's own TBLPROPERTIES behavior
      spark.sql("CREATE TABLE props_plain (k INT) USING parquet")
      spark.sql("ALTER TABLE props_plain SET TBLPROPERTIES ('x' = '1')")
      assert(spark.sql("SHOW TBLPROPERTIES props_plain").collect()
        .exists(r => r.getString(0) == "x" && r.getString(1) == "1"))
      // DESCRIBE DETAIL: one row, layout + properties + dv debt
      val d = spark.sql("DESCRIBE DETAIL props_sql").collect().head
      assert(d.getAs[String]("format") === "graft-lake")
      assert(d.getAs[String]("location") === root)
      assert(d.getAs[Long]("num_files") >= 1L)
      assert(d.getAs[Long]("size_bytes") > 0L)
      assert(d.getAs[String]("properties") === "graft.retain=6")
      assert(d.getAs[Int]("dv_dirs") === 0)
      // DV debt becomes visible in DETAIL after a soft delete
      Lake.deleteWhere(spark, root, col("k") <= 2L)
      val d2 = spark.sql(s"DESCRIBE DETAIL '$root'").collect().head
      assert(d2.getAs[Int]("dv_dirs") === 1 &&
        d2.getAs[Long]("dv_rows") === 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS props_sql")
      spark.sql("DROP TABLE IF EXISTS props_plain")
    }
  }
}
