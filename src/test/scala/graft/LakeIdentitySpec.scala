package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Identity columns (`#identity=<col>:<next>`): GENERATED ALWAYS AS
  * IDENTITY as manifest state — batches omit the column, each append
  * allocates a contiguous block and advances the high-water mark in
  * the same manifest write, and OCC losers re-stage under the new
  * mark so concurrent appends get disjoint ranges. */
class LakeIdentitySpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def ids(root: String): Seq[Long] =
    Lake.readCommitted(spark, root).select("id").collect()
      .map(_.getLong(0)).toSeq.sorted

  test("establishment allocates 1..n; appends continue the sequence; supplying refuses") {
    val root = tmpTable("graft-id-basic")
    Lake.commitOverwrite(Seq("a", "b", "c").toDF("t"), root, retain = 8,
      identity = Some("id"))
    assert(ids(root) === Seq(1L, 2L, 3L))
    assert(Lake.identityColumn(spark, root) === Some(("id", 4L)))
    // the append allocates the NEXT contiguous block
    Lake.commitAppend(Seq("d", "e").toDF("t"), root, retain = 8)
    assert(ids(root) === (1L to 5L))
    assert(Lake.identityColumn(spark, root) === Some(("id", 6L)))
    // GENERATED ALWAYS: a batch carrying the column refuses
    val e = intercept[IllegalArgumentException] {
      Lake.commitAppend(Seq((99L, "x")).toDF("id", "t"), root, retain = 8)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // UPDATE cannot assign it either
    val e2 = intercept[IllegalArgumentException] {
      Lake.updateWhere(spark, root, col("t") === "a",
        Map("id" -> lit(77L)), retain = 8)
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS"))
    // re-declaring a DIFFERENT identity column refuses
    val e3 = intercept[IllegalArgumentException] {
      Lake.commitOverwrite(Seq("z").toDF("t"), root, retain = 8,
        identity = Some("id2"))
    }
    assert(e3.getMessage.contains("one identity per table"))
  }

  test("seeded establishment: existing unique keys set the mark; duplicates refuse") {
    val root = tmpTable("graft-id-seed")
    Lake.commitOverwrite(Seq((10L, "a"), (42L, "b")).toDF("id", "t"), root,
      retain = 8, identity = Some("id"))
    assert(Lake.identityColumn(spark, root) === Some(("id", 43L)))
    Lake.commitAppend(Seq("c").toDF("t"), root, retain = 8)
    assert(ids(root) === Seq(10L, 42L, 43L))
    // a duplicate-seeded establishment refuses
    val dup = tmpTable("graft-id-dup")
    val e = intercept[IllegalArgumentException] {
      Lake.commitOverwrite(Seq((1L, "a"), (1L, "b")).toDF("id", "t"), dup,
        retain = 8, identity = Some("id"))
    }
    assert(e.getMessage.contains("unique non-NULL"))
  }

  test("OCC: concurrent appends allocate disjoint gap-free blocks (loser re-stages)") {
    val root = tmpTable("graft-id-occ")
    Lake.commitOverwrite(Seq("a").toDF("t"), root, retain = 8,
      identity = Some("id")) // id 1, mark 2
    try {
      // appender B (3 rows) lands inside appender A's stage->publish
      // window: A staged ids [2,5) from the pre-B mark, loses the
      // slot, sees the mark at 5, RE-STAGES as [5,9) and commits —
      // disjoint contiguous blocks, nothing lost, nothing colliding
      Lake.beforePublish = () => {
        Lake.beforePublish = () => ()
        Lake.commitAppend(Seq("b1", "b2", "b3").toDF("t"), root, retain = 8)
        ()
      }
      Lake.commitAppend(Seq("a1", "a2", "a3", "a4").toDF("t"), root,
        retain = 8)
      assert(ids(root) === (1L to 8L)) // 1 seed + 3 + 4, no gaps/dupes
      assert(Lake.identityColumn(spark, root) === Some(("id", 9L)))
      // each batch's block is CONTIGUOUS
      val byBatch = Lake.readCommitted(spark, root)
        .where(col("t").startsWith("b")).select("id").collect()
        .map(_.getLong(0)).sorted
      assert(byBatch.last - byBatch.head === 2L)
    } finally Lake.beforePublish = () => ()
  }

  test("restore re-points the mark; freed ids re-allocate with the restored rows gone") {
    val root = tmpTable("graft-id-restore")
    Lake.commitOverwrite(Seq("a", "b").toDF("t"), root, retain = 8,
      identity = Some("id"))                                  // v0: 1,2 mark 3
    Lake.commitAppend(Seq("c", "d").toDF("t"), root, retain = 8) // v1: 3,4 mark 5
    Lake.restoreCommitted(spark, root, 0L, retain = 8)           // mark back to 3
    assert(Lake.identityColumn(spark, root) === Some(("id", 3L)))
    Lake.commitAppend(Seq("e").toDF("t"), root, retain = 8)
    assert(ids(root) === Seq(1L, 2L, 3L)) // 3 reused: its old row is gone
    // the full history stays consistent per version
    assert(Lake.readCommittedAt(spark, root, 1L).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === (1L to 4L))
  }

  test("CTAS OPTIONS (identity 'id') establishes the allocator; appends must inherit, not declare") {
    val root = tmpTable("graft-id-ctas")
    Seq("a", "b").toDF("t").createOrReplaceTempView("id_ctas_src")
    spark.sql("DROP TABLE IF EXISTS id_ctas")
    spark.sql(s"""CREATE TABLE id_ctas USING `graft-lake`
      |OPTIONS (root '$root', identity 'id')
      |AS SELECT * FROM id_ctas_src""".stripMargin)
    try {
      assert(spark.sql("SELECT id FROM id_ctas ORDER BY id").collect()
        .map(_.getLong(0)).toSeq === Seq(1L, 2L))
      spark.sql("INSERT INTO id_ctas (t) VALUES ('c')")
      assert(spark.sql("SELECT id FROM id_ctas ORDER BY id").collect()
        .map(_.getLong(0)).toSeq === (1L to 3L))
      // an APPEND-mode write declaring a DIFFERENT identity refuses
      val e = intercept[IllegalArgumentException] {
        Seq("d").toDF("t").write.format("graft-lake")
          .option("root", root).option("identity", "other")
          .mode("append").save()
      }
      assert(e.getMessage.contains("inherit"))
    } finally spark.sql("DROP TABLE IF EXISTS id_ctas")
  }

  test("identity composes with partitions/generated columns and SQL INSERT") {
    val root = tmpTable("graft-id-compose")
    val rows = Seq(("x", java.sql.Date.valueOf("1995-06-15")),
      ("y", java.sql.Date.valueOf("1996-06-15"))).toDF("t", "d")
    Lake.commitOverwrite(rows, root, retain = 8,
      partitionBy = Seq("y"), generatedColumns = Map("y" -> "year(d)"),
      identity = Some("id"))
    assert(ids(root) === Seq(1L, 2L))
    spark.sql("DROP TABLE IF EXISTS id_sql")
    spark.sql(s"CREATE TABLE id_sql USING `graft-lake` OPTIONS (root '$root')")
    try {
      // SQL INSERT routes through commitAppend → allocates too
      spark.sql("INSERT INTO id_sql (t, d) VALUES ('z', DATE'1997-06-15')")
      assert(spark.sql("SELECT id FROM id_sql ORDER BY id").collect()
        .map(_.getLong(0)).toSeq === (1L to 3L))
      assert(spark.sql("SELECT y FROM id_sql WHERE id = 3").collect()
        .head.getInt(0) === 1997)
    } finally spark.sql("DROP TABLE IF EXISTS id_sql")
  }

  test("GENERATED BY DEFAULT: the allocator fills only omitted/NULL values; explicit keys pass and advance the mark") {
    val root = tmpTable("graft-id-bydefault")
    // establishing commit declares the mode with the column
    Lake.commitOverwrite(
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.StringType)))),
      root, retain = 8, identity = Some("id"), identityByDefault = true)
    // a MIXED batch: explicit keys (migration-seeded SERIAL values)
    // pass through verbatim; NULL keys take the next block
    Lake.commitAppend(Seq((Some(100L), "a"), (None, "b"), (Some(200L), "c"),
      (None, "d")).toDF("id", "t"), root, retain = 8)
    val r1 = rows(Lake.readCommitted(spark, root))
    assert(r1 === Set(Seq(100L, "a"), Seq(1L, "b"), Seq(200L, "c"),
      Seq(2L, "d")))
    // the mark advanced past the explicit max: the next omitted batch
    // can never reuse 100 or 200
    assert(Lake.identityColumn(spark, root) === Some(("id", 201L)))
    Lake.commitAppend(Seq(Tuple1("e")).toDF("t"), root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root).where(col("t") === "e")
      .select("id")) === Set(Seq(201L)))
    // a fully-explicit batch just advances the mark
    Lake.commitAppend(Seq((500L, "f")).toDF("id", "t"), root, retain = 8)
    assert(Lake.identityColumn(spark, root) === Some(("id", 501L)))
    // mode is immutable: re-declaring as ALWAYS refuses
    assert(intercept[IllegalArgumentException] {
      Lake.commitOverwrite(Seq((1L, "x")).toDF("id", "t"), root,
        retain = 8, identity = Some("id"))
    }.getMessage.contains("mode"))
    // an ALWAYS table still refuses explicit values, naming the remedy
    val aroot = tmpTable("graft-id-always")
    Lake.commitOverwrite(Seq(Tuple1("a")).toDF("t"), aroot, retain = 8,
      identity = Some("id"))
    assert(intercept[IllegalArgumentException] {
      Lake.commitAppend(Seq((9L, "x")).toDF("id", "t"), aroot, retain = 8)
    }.getMessage.contains("BY DEFAULT"))
  }

  test("GENERATED BY DEFAULT under an OCC race: the loser re-fills its NULL block past the winner's mark") {
    val root = tmpTable("graft-id-bydefault-occ")
    Lake.commitOverwrite(
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.StringType)))),
      root, retain = 8, identity = Some("id"), identityByDefault = true)
    // interloper allocates [1,2] while our mixed batch is mid-commit
    Lake.beforePublish = () => {
      Lake.beforePublish = () => ()
      Lake.commitAppend(Seq(Tuple1("w1"), Tuple1("w2")).toDF("t"), root,
        retain = 8); ()
    }
    Lake.commitAppend(Seq((Some(50L), "x"), (None, "y")).toDF("id", "t"),
      root, retain = 8)
    val r = rows(Lake.readCommitted(spark, root))
    // winner took 1,2; the loser re-staged its NULL row at 3; explicit
    // 50 passed verbatim; mark past max(4, 51)
    assert(r === Set(Seq(1L, "w1"), Seq(2L, "w2"), Seq(50L, "x"),
      Seq(3L, "y")))
    assert(Lake.identityColumn(spark, root) === Some(("id", 51L)))
  }


  test("empty incremental batches with NULL-padded specials commit cleanly (omitted semantics)") {
    import org.apache.spark.sql.types._
    val root = tmpTable("graft-id-empty")
    Lake.commitOverwrite(Seq("a", "b").toDF("t"), root, retain = 8,
      identity = Some("id")) // GENERATED ALWAYS, ids 1..2
    val padded = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], padded)
    // the v1 SQL INSERT path pads the identity column with NULL; a
    // ZERO-row incremental batch must read as OMITTED, not as a seeding
    // attempt — both the append and the overwrite spellings
    val v1 = Lake.commitAppend(empty, root, retain = 8)
    assert(ids(root) === Seq(1L, 2L))
    assert(Lake.identityColumn(spark, root) === Some(("id", 3L)))
    Lake.commitOverwrite(empty, root, retain = 8)
    assert(Lake.readCommitted(spark, root).count() === 0L)
    // the declaration (and mark) survive the empty overwrite
    assert(Lake.identityColumn(spark, root).map(_._1) === Some("id"))
    // appends keep allocating past the mark
    Lake.commitAppend(Seq("c").toDF("t"), root, retain = 8)
    assert(ids(root).nonEmpty)
    assert(v1 === 1L)
  }

  test("BY DEFAULT explicit values that cast to BIGINT as NULL refuse (block-overrun guard)") {
    val root = tmpTable("graft-id-badcast")
    Lake.commitOverwrite(Seq("a").toDF("t"), root, retain = 8,
      identity = Some("id"), identityByDefault = true) // id 1, mark 2
    // a string key that is not a number casts to NULL: the fill (which
    // splits on the POST-cast column) would allocate it past the block
    // the mark reserved — the commit must refuse instead
    val e = intercept[IllegalArgumentException] {
      Lake.commitAppend(Seq(("abc", "x"), ("7", "y")).toDF("id", "t"),
        root, retain = 8)
    }
    assert(e.getMessage.contains("cast to BIGINT as NULL"))
    assert(ids(root) === Seq(1L)) // nothing landed
    // numeric strings cast losslessly and pass through verbatim
    Lake.commitAppend(Seq(("7", "y")).toDF("id", "t"), root, retain = 8)
    assert(ids(root) === Seq(1L, 7L))
    assert(Lake.identityColumn(spark, root) === Some(("id", 8L)))
    // same guard on the overwrite path
    val e2 = intercept[IllegalArgumentException] {
      Lake.commitOverwrite(Seq(("xyz", "z")).toDF("id", "t"), root,
        retain = 8)
    }
    assert(e2.getMessage.contains("cast to BIGINT as NULL"))
  }

}
