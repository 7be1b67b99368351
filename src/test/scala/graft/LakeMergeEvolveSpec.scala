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
}
