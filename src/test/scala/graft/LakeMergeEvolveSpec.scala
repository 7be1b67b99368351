package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** CDC merge schema evolution (`allowSchemaEvolution`): a change batch
  * carrying columns the table lacks evolves the committed schema by
  * the append rule — add-nullable + lossless widening, lossy refused —
  * while untouched dirs carry by reference and read NULL-backfilled. */
class LakeMergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  test("a drifted CDC batch refuses without the opt-in, evolves with it") {
    val root = tmpTable("graft-mergevo")
    // two dirs so one stays untouched (carried by reference)
    Lake.commitAppend((1L to 50L).map(i => (i, s"p$i", 0L))
      .toDF("id", "payload", "v"), root, retain = 8)
    Lake.commitAppend((51L to 100L).map(i => (i, s"p$i", 0L))
      .toDF("id", "payload", "v"), root, retain = 8)
    val drifted = Seq(
      (1L, "updated", 1L, "en", false),   // update touches dir 1 only
      (200L, "inserted", 1L, "fr", false))
      .toDF("id", "payload", "v", "lang", "del")
    // strict mode refuses the unknown column loudly
    intercept[Exception](Lake.mergeCommitted(spark, root, drifted,
      keyCols = Seq("id"), versionCol = "v", deleteCol = "del"))
    // opt-in evolves
    val preDirs = Lake.resolve(spark, root).toSet
    Lake.mergeCommitted(spark, root, drifted,
      keyCols = Seq("id"), versionCol = "v", deleteCol = "del",
      allowSchemaEvolution = true)
    val r = Lake.readCommitted(spark, root)
    assert(r.columns.toSeq === Seq("id", "payload", "v", "lang"))
    assert(r.count() === 101L)
    // upserted rows carry the new column; everything else reads NULL
    assert(r.where(col("id") === 1L).select("payload", "lang").collect()
      .head.toSeq === Seq("updated", "en"))
    assert(r.where(col("id") === 200L).select("lang").collect()
      .head.getString(0) === "fr")
    assert(r.where(col("lang").isNotNull).count() === 2L)
    // the untouched dir carried by reference (no rewrite)
    assert(Lake.resolve(spark, root).toSet.intersect(preDirs).nonEmpty,
      "expected the untouched dir reused by reference")
    // a follow-up widening through merge works too; a lossy change refuses
    val widening = Seq((2L, "widened", 2L, false))
      .toDF("id", "payload", "v", "del")
      .select(col("id"), col("payload"), col("v"), lit(null).cast("string")
        .as("lang"), col("del"))
    Lake.mergeCommitted(spark, root, widening, Seq("id"), "v", "del",
      allowSchemaEvolution = true)
    assert(Lake.readCommitted(spark, root)
      .where(col("id") === 2L).select("payload").collect()
      .head.getString(0) === "widened")
    val lossy = Seq((3L, 9.9, 3L, "x", false))
      .toDF("id", "payload", "v", "lang", "del") // payload string -> double
    intercept[IllegalArgumentException](Lake.mergeCommitted(spark, root,
      lossy, Seq("id"), "v", "del", allowSchemaEvolution = true))
  }

  test("NESTED evolution: struct fields add (NULL-backfilled) and widen; lossy nested refuses") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-evolve-nested").resolve("t").toString
    // v0: struct<tag:string, n:int>
    Lake.commitAppend(
      Seq((1L, ("a", 1)), (2L, ("b", 2))).toDF("id", "m")
        .select(col("id"), col("m").cast("struct<tag:string,n:int>")),
      root, retain = 8)
    // append ADDS a nested field and WIDENS n to long in one batch
    Lake.commitAppend(
      Seq((3L, ("c", 30L, 0.5))).toDF("id", "m")
        .select(col("id"),
          col("m").cast("struct<tag:string,n:bigint,score:double>")),
      root, retain = 8)
    val r = Lake.readCommitted(spark, root)
    assert(r.schema("m").dataType.simpleString ===
      "struct<tag:string,n:bigint,score:double>")
    // old rows read the added nested field NULL and n upcast to long
    val rows3 = r.orderBy("id").select("id", "m.n", "m.score").collect()
    assert(rows3.map(x => (x.getLong(0), x.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 2L), (3L, 30L)))
    assert(rows3.take(2).forall(_.isNullAt(2)) && rows3(2).getDouble(2) === 0.5)
    // pruning on the evolved nested field still composes
    assert(Lake.readCommittedWhere(spark, root, col("m.n") >= 30L)
      .count() === 1L)
    // a LOSSY nested change refuses naming the container
    val e = intercept[IllegalArgumentException] {
      Lake.commitAppend(
        Seq((4L, (1.0, 4L, 0.1))).toDF("id", "m")
          .select(col("id"),
            col("m").cast("struct<tag:double,n:bigint,score:double>")),
        root, retain = 8)
    }
    assert(e.getMessage.contains("'m'"))
    // a conforming append lands under the evolved schema
    Lake.commitAppend(
      Seq((5L, ("e", 50L, 0.9))).toDF("id", "m")
        .select(col("id"),
          col("m").cast("struct<tag:string,n:bigint,score:double>")),
      root, retain = 8)
    assert(Lake.readCommitted(spark, root).count() === 4L)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION: the schema evolves before resolution; star and explicit actions land the drifted columns") {
    val root = tmpTable("graft-mergevo-sql")
    Lake.commitAppend((1L to 50L).map(i => (i, s"p$i")).toDF("id", "payload"),
      root, retain = 8)
    Lake.commitAppend((51L to 100L).map(i => (i, s"p$i")).toDF("id", "payload"),
      root, retain = 8)
    spark.sql("DROP TABLE IF EXISTS mrgevo_sql")
    spark.sql(s"CREATE TABLE mrgevo_sql USING `graft-lake` OPTIONS (root '$root')")
    Seq((60L, "upd", "en"), (200L, "ins", "fr"))
      .toDF("id", "payload", "lang").createOrReplaceTempView("mrgevo_src")
    val preDirs = Lake.resolve(spark, root).toSet
    // star actions: the analyzer must expand them against the EVOLVED
    // schema — without the pre-resolution evolution the source-only
    // `lang` column would be silently dropped (the old refusal)
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mrgevo_sql t
        |USING mrgevo_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val r = spark.table("mrgevo_sql")
    assert(r.columns.toSeq === Seq("id", "payload", "lang"))
    assert(r.count() === 101L)
    assert(rows(r.where(col("lang").isNotNull).select("id", "payload", "lang")) ===
      Set(Seq(60L, "upd", "en"), Seq(200L, "ins", "fr")))
    // dir 1 (ids 1..50) untouched: carried by reference
    assert(Lake.resolve(spark, root).toSet.intersect(preDirs).nonEmpty,
      "the untouched dir must carry by reference across the evolution")
    // EXPLICIT assignment to a drifted column resolves too (it would
    // fail analysis against the un-evolved target)
    Seq((61L, "upd2", "de", 1.5)).toDF("id", "payload", "lang", "score")
      .createOrReplaceTempView("mrgevo_src2")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mrgevo_sql t
        |USING mrgevo_src2 s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET lang = s.lang, score = s.score""".stripMargin)
    assert(rows(spark.sql(
      "SELECT lang, score FROM mrgevo_sql WHERE id = 61")) ===
      Set(Seq("de", 1.5)))
    // idempotent shape: a NON-drifted source under the flag is a plain
    // merge (evolveSchema no-ops)
    Seq((62L, "upd3", "it", 2.5)).toDF("id", "payload", "lang", "score")
      .createOrReplaceTempView("mrgevo_src3")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mrgevo_sql t
        |USING mrgevo_src3 s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(rows(spark.sql(
      "SELECT payload, lang FROM mrgevo_sql WHERE id = 62")) ===
      Set(Seq("upd3", "it")))
    // a LOSSY drift still refuses loudly (the append rule)
    Seq((63L, 1.0)).toDF("id", "score_bad")
      .withColumn("payload", lit(2.0)) // double vs string payload
      .createOrReplaceTempView("mrgevo_src4")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO mrgevo_sql t
          |USING mrgevo_src4 s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("schema evolution"))
    spark.sql("DROP TABLE mrgevo_sql")
  }


  test("MERGE WITH SCHEMA EVOLUTION into a TEMP-VIEW (path) target evolves like the catalog spelling; typos refuse pre-commit") {
    val root = tmpTable("graft-mergevo-view")
    Lake.commitAppend((1L to 50L).map(i => (i, s"p$i")).toDF("id", "payload"),
      root, retain = 8)
    Lake.commitAppend((51L to 100L).map(i => (i, s"p$i")).toDF("id", "payload"),
      root, retain = 8)
    // the path spelling: a temp view over the snapshot-pinned handle
    Lake.registerSql(spark, "mrgevo_view", root)
    Seq((60L, "upd", "en"), (200L, "ins", "fr"))
      .toDF("id", "payload", "lang").createOrReplaceTempView("mrgevo_vsrc")
    val vPre = Lake.currentVersion(spark, root).get
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mrgevo_view t
        |USING mrgevo_vsrc s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the view itself serves the evolved live table afterwards
    val r = spark.table("mrgevo_view")
    assert(r.columns.toSeq === Seq("id", "payload", "lang"))
    assert(r.count() === 101L)
    assert(rows(r.where(col("lang").isNotNull).select("id", "payload", "lang")) ===
      Set(Seq(60L, "upd", "en"), Seq(200L, "ins", "fr")))
    // the GLOBAL temp view spelling works too
    Lake.sqlTable(spark, root).createOrReplaceGlobalTempView("mrgevo_gview")
    Seq((61L, "upd2", "de", 9L)).toDF("id", "payload", "lang", "hits")
      .createOrReplaceTempView("mrgevo_vsrc2")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO global_temp.mrgevo_gview t
        |USING mrgevo_vsrc2 s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET lang = s.lang, hits = s.hits""".stripMargin)
    assert(rows(spark.sql(
      "SELECT lang, hits FROM global_temp.mrgevo_gview WHERE id = 61")) ===
      Set(Seq("de", 9L)))
    // a TYPO'D column refuses BEFORE the evolution commit: the dry run
    // applies nothing — not even the additive schema change
    val vBefore = Lake.currentVersion(spark, root).get
    val schemaBefore = Lake.readCommitted(spark, root).columns.toSeq
    val e = intercept[IllegalArgumentException] {
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO mrgevo_view t
          |USING mrgevo_vsrc2 s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET laang = s.lang""".stripMargin)
    }
    assert(e.getMessage.contains("nothing was applied"))
    assert(Lake.currentVersion(spark, root).get === vBefore)
    assert(Lake.readCommitted(spark, root).columns.toSeq === schemaBefore)
    assert(vPre < vBefore) // the earlier merges really committed
    spark.sql("DROP VIEW mrgevo_view")
  }


  test("a DERIVED temp view (filter over the handle) refuses MERGE WITH SCHEMA EVOLUTION loudly — never a silent whole-table merge") {
    val root = tmpTable("graft-mergevo-derived")
    Lake.commitAppend((1L to 40L).map(i => (i, s"p$i", if (i <= 20) "eu" else "us"))
      .toDF("id", "payload", "region"), root, retain = 8)
    // a FILTERED view: its subset contract must not be silently widened
    Lake.sqlTable(spark, root).where(col("region") === "eu")
      .createOrReplaceTempView("eu_docs")
    Seq((5L, "hacked", "eu", "x"), (35L, "hacked", "us", "y"))
      .toDF("id", "payload", "region", "extra")
      .createOrReplaceTempView("eu_src")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO eu_docs t
          |USING eu_src s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("MERGE WITH SCHEMA EVOLUTION"))
    // nothing applied: no evolution commit, no rows touched, and the
    // view kept its filter
    assert(Lake.readCommitted(spark, root).columns.toSeq ===
      Seq("id", "payload", "region"))
    assert(Lake.readCommitted(spark, root)
      .where(col("payload") === "hacked").count() === 0L)
    assert(spark.table("eu_docs").count() === 20L)
  }

}
