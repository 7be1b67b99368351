package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** Protocol feature gates (`#require=<feature,…>`): Delta's
  * table-features contract for the manifest protocol. The point — a
  * build that doesn't understand a semantics-bearing manifest line
  * (deletion vectors, column mapping, identity, generated partitions,
  * bucketing) must REFUSE the table loudly instead of silently
  * skipping the line and returning wrong rows (a pre-DV reader would
  * resurrect soft-deleted rows). Legacy manifests without the line
  * keep reading; each feature-writing commit stamps exactly the
  * features its snapshot carries. */
class LakeFeatureGateSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def manifestText(root: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, s"_commit_$v")), "UTF-8")

  /** Hand-edit a manifest in place (out-of-protocol surgery): the nio
    * write bypasses Hadoop's ChecksumFileSystem, so the stale `.crc`
    * sidecar must go with it. */
  private def rewriteManifest(root: String, v: Long, text: String): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, s"_commit_$v"), text.getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, s"._commit_$v.crc"))
  }

  private def requiresOf(root: String, v: Long): Set[String] =
    manifestText(root, v).split("\n").find(_.startsWith("#require="))
      .map(_.stripPrefix("#require=").split(",").map(_.trim)
        .filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  private def liveVersion(root: String): Long =
    Lake.currentVersion(spark, root).get

  test("legacy / feature-free manifests carry no #require line and read unchanged") {
    val root = tmpTable("graft-featgate-legacy")
    Lake.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root)
    assert(requiresOf(root, liveVersion(root)).isEmpty)
    assert(Lake.readCommitted(spark, root).count() === 2L)
  }

  test("unknown required feature refuses on read AND on commit-on-top, naming it") {
    val root = tmpTable("graft-featgate-unknown")
    Lake.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root,
      retain = 8)
    val v = liveVersion(root)
    // hand-edit: a future build wrote a construct this one can't
    // interpret and declared it required (padding keeps (modTime, len)
    // cache validation honest — the length must change)
    val edited = manifestText(root, v) +
      "\n#require=row-lineage-v9\n#rowlineage_v0=opaque-bytes"
    rewriteManifest(root, v, edited)
    val exRead = intercept[UnsupportedOperationException] {
      Lake.readCommitted(spark, root).count()
    }
    assert(exRead.getMessage.contains("row-lineage-v9"))
    assert(exRead.getMessage.contains("does not support"))
    val exCommit = intercept[UnsupportedOperationException] {
      Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root)
    }
    assert(exCommit.getMessage.contains("row-lineage-v9"))
    // maintenance and history refuse too — no path interprets the
    // snapshot without understanding it
    intercept[UnsupportedOperationException] {
      Lake.deleteWhere(spark, root, col("k") === 1L)
    }
    intercept[UnsupportedOperationException] {
      Lake.describeHistory(spark, root).count()
    }
    // a KNOWN feature plus an unknown one still refuses (all-or-nothing)
    rewriteManifest(root, v, manifestText(root, v)
      .replace("#require=row-lineage-v9", "#require=bucket,row-lineage-v9"))
    assert(intercept[UnsupportedOperationException] {
      Lake.readCommitted(spark, root).count()
    }.getMessage.contains("row-lineage-v9"))
  }

  test("recognized required features read fine (forward-written manifest)") {
    val root = tmpTable("graft-featgate-known")
    Lake.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), root)
    val v = liveVersion(root)
    rewriteManifest(root, v, manifestText(root, v) + "\n#require=dv,colmap")
    assert(Lake.readCommitted(spark, root).count() === 2L)
  }

  test("each feature-writing commit stamps exactly its features") {
    // bucket: declared at establish time
    val b = tmpTable("graft-featgate-bucket")
    Lake.commitOverwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "t"), b,
      bucketBy = Some((2, Seq("k"))))
    assert(requiresOf(b, liveVersion(b)) === Set("bucket"))

    // identity + genpart together
    val ig = tmpTable("graft-featgate-idgen")
    Lake.commitOverwrite(
      Seq((1L, java.sql.Date.valueOf("2024-03-01")),
          (2L, java.sql.Date.valueOf("2024-04-01"))).toDF("id", "d"), ig,
      partitionBy = Seq("y"), generatedColumns = Map("y" -> "year(d)"),
      identity = Some("id"))
    assert(requiresOf(ig, liveVersion(ig)) === Set("identity", "genpart"))

    // colmap: appears at the rename, absent before it
    val cm = tmpTable("graft-featgate-colmap")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), cm, retain = 8)
    assert(requiresOf(cm, liveVersion(cm)).isEmpty)
    Lake.renameColumn(spark, cm, "t", "txt")
    assert(requiresOf(cm, liveVersion(cm)) === Set("colmap"))

    // dv: appears with the soft delete, inherited by the next append,
    // dropped again when REORG PURGE materializes the vector away
    val dv = tmpTable("graft-featgate-dv")
    Lake.commitOverwrite((1L to 40L).map(i => (i, s"r$i")).toDF("k", "t"),
      dv, retain = 8)
    Lake.deleteWhere(spark, dv, col("k") <= 3L, dvMaxRows = 1000L)
    assert(requiresOf(dv, liveVersion(dv)) === Set("dv"))
    Lake.commitAppend(Seq((41L, "r41")).toDF("k", "t"), dv)
    assert(requiresOf(dv, liveVersion(dv)) === Set("dv"))
    assert(Lake.readCommitted(spark, dv).count() === 38L)
    Lake.reorgCommitted(spark, dv)
    assert(requiresOf(dv, liveVersion(dv)).isEmpty)
    assert(Lake.readCommitted(spark, dv).count() === 38L)
  }

  test("DESCRIBE DETAIL surfaces the declared features") {
    val root = tmpTable("graft-featgate-detail")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8,
      bucketBy = Some((2, Seq("k"))))
    assert(Lake.describeDetail(spark, root).collect().head
      .getAs[String]("table_features") === "bucket")
    assert(spark.sql(s"DESCRIBE DETAIL '$root'").collect().head
      .getAs[String]("table_features") === "bucket")
    val plain = tmpTable("graft-featgate-detailplain")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), plain)
    assert(Lake.describeDetail(spark, plain).collect().head
      .getAs[String]("table_features") === "")
  }
}
