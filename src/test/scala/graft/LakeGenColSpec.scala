package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** General (non-partition) generated columns — `#gencol=`: the same
  * GENERATED ALWAYS AS contract as the partition-derived `#genpart=`
  * (omitting batches materialize, supplying batches validate
  * row-for-row) with NO partition-layout participation. One
  * declaration surface: `generatedColumns`; the engine splits the
  * manifest lines by partition membership. */
class LakeGenColSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def manifestText(root: String): String = {
    val v = Lake.currentVersion(spark, root).get
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, s"_commit_$v")), "UTF-8")
  }

  test("declaration splits by partition membership; omitting batches materialize, supplying validate") {
    val root = tmpTable("graft-gencol")
    // p participates in the layout (genpart), len2 does not (gencol)
    Lake.commitOverwrite(
      Seq((1L, "abc", java.sql.Date.valueOf("2024-03-01")),
        (2L, "defgh", java.sql.Date.valueOf("2025-07-02")))
        .toDF("k", "t", "d"),
      root, retain = 8, partitionBy = Seq("p"),
      generatedColumns = Map("p" -> "year(d)", "len2" -> "length(t) * 2"))
    val txt = manifestText(root)
    assert(txt.contains("#genpart=p:year(d)"))
    assert(txt.contains("#gencol=len2:length(t) * 2"))
    assert(txt.split("\n").find(_.startsWith("#require="))
      .exists(l => l.contains("gencol") && l.contains("genpart")))
    assert(rows(Lake.readCommitted(spark, root).select("k", "p", "len2")) ===
      Set(Seq(1L, 2024, 6), Seq(2L, 2025, 10)))
    // an OMITTING append materializes both
    Lake.commitAppend(
      Seq((3L, "xy", java.sql.Date.valueOf("2024-11-11"))).toDF("k", "t", "d"),
      root, retain = 8)
    assert(rows(Lake.readCommitted(spark, root)
      .where(col("k") === 3L).select("p", "len2")) === Set(Seq(2024, 4)))
    // a SUPPLYING append validates row-for-row — a stale copy refuses
    val e = intercept[IllegalArgumentException] {
      Lake.commitAppend(
        Seq((4L, "zz", java.sql.Date.valueOf("2024-01-01"), 99))
          .toDF("k", "t", "d", "len2"),
        root, retain = 8)
    }
    assert(e.getMessage.contains("gen_len2"))
    // a CORRECT copy commits
    Lake.commitAppend(
      Seq((4L, "zz", java.sql.Date.valueOf("2024-01-01"), 4))
        .toDF("k", "t", "d", "len2"),
      root, retain = 8)
    assert(Lake.readCommitted(spark, root).count() === 4L)
    // re-declaration refuses (one generation per table)
    intercept[IllegalArgumentException] {
      Lake.commitAppend(Seq((9L, "q", java.sql.Date.valueOf("2024-01-01")))
        .toDF("k", "t", "d"), root, retain = 8,
        generatedColumns = Map("len2" -> "length(t) * 3"))
    }
  }

  test("gencol needs no partition layout at all; DDL guards extend to it") {
    val root = tmpTable("graft-gencol-flat")
    Lake.commitOverwrite(
      Seq((1L, 10), (2L, 20)).toDF("k", "n"), root, retain = 8,
      generatedColumns = Map("n10" -> "n * 10"))
    val txt = manifestText(root)
    assert(txt.contains("#gencol=n10:n * 10") && !txt.contains("#genpart="))
    assert(rows(Lake.readCommitted(spark, root).select("k", "n10")) ===
      Set(Seq(1L, 100), Seq(2L, 200)))
    // guards: cannot drop/rename the gencol's source, cannot widen it
    assert(intercept[IllegalArgumentException] {
      Lake.dropColumn(spark, root, "n")
    }.getMessage.contains("n10"))
    assert(intercept[IllegalArgumentException] {
      Lake.renameColumn(spark, root, "n", "m")
    }.getMessage.contains("n10"))
    assert(intercept[IllegalArgumentException] {
      Lake.alterColumnType(spark, root, "n10", org.apache.spark.sql.types.LongType)
    }.getMessage.matches("(?s).*generated column.*"))
    // equality skipping derives through the generated expression when
    // stats exist on the gencol (deriveGenPreds over #gencol)
    val sroot = tmpTable("graft-gencol-skip")
    (0L until 4L).foreach { b =>
      Lake.commitAppend(
        (b * 100L until (b + 1) * 100L).map(i => (i, i * 2))
          .toDF("k", "n"),
        sroot, retain = 0, statsCols = Seq("k", "n10"),
        generatedColumns = Map("n10" -> "n * 10"))
      ()
    }
    // the predicate names the SOURCE column; the gencol's stats prune
    val (_, skipped, _) = Lake.resolveWhere(spark, sroot, col("n") === 250L)
    assert(skipped.nonEmpty, "gencol stats should derive pruning")
    assert(rows(Lake.readCommittedWhere(spark, sroot, col("n") === 250L)
      .select("k")) === Set(Seq(125L)))
  }
}
