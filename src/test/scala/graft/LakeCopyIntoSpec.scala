package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** COPY INTO — idempotent landing-zone ingestion. The point: a
  * recurring cron load (or its crash-retry) must never double-load a
  * file. The `#ingested=` manifest ledger records loaded file names
  * ATOMICALLY with the data commit, re-runs load nothing, and the
  * ledger stays O(landing dir) — entries for files removed from the
  * zone are dropped at the next COPY. */
class LakeCopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  private def landingDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  /** Drop one parquet file holding `df` into `dir` as `name`. */
  private def landFile(df: org.apache.spark.sql.DataFrame,
      dir: java.nio.file.Path, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-copy-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    java.nio.file.Files.copy(src, dir.resolve(name))
    ()
  }

  private def ledgerOf(root: String): Seq[String] = {
    val v = Lake.currentVersion(spark, root).get
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, s"_commit_$v")), "UTF-8")
      .split("\n").filter(_.startsWith("#ingested=")).toSeq
      .map(_.stripPrefix("#ingested="))
  }

  test("same dir twice → one version; a new file → one O(file) append") {
    val root = tmpTable("graft-copyinto")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    val land = landingDir("graft-copy-land")
    landFile(Seq((2L, "b")).toDF("k", "t"), land, "f1.parquet")
    landFile(Seq((3L, "c"), (4L, "d")).toDF("k", "t"), land, "f2.parquet")
    val (v1, n1) = Lake.copyInto(spark, root, land.toString)
    assert(n1 === 2L)
    assert(Lake.currentVersion(spark, root).get === v1)
    assert(rows(Lake.readCommitted(spark, root)) ===
      Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"), Seq(4L, "d")))
    // idempotent: the SAME statement loads nothing, commits nothing
    val (v2, n2) = Lake.copyInto(spark, root, land.toString)
    assert(n2 === 0L && v2 === v1)
    assert(Lake.currentVersion(spark, root).get === v1)
    // a new landing file loads alone (O(new files), not O(dir))
    landFile(Seq((5L, "e")).toDF("k", "t"), land, "f3.parquet")
    val (v3, n3) = Lake.copyInto(spark, root, land.toString)
    assert(n3 === 1L && v3 === v1 + 1)
    assert(Lake.readCommitted(spark, root).count() === 5L)
    // a plain append BETWEEN COPYs must not amnesia the ledger
    Lake.commitAppend(Seq((6L, "f")).toDF("k", "t"), root, retain = 8)
    val (v4, n4) = Lake.copyInto(spark, root, land.toString)
    assert(n4 === 0L && v4 === Lake.currentVersion(spark, root).get)
    assert(Lake.readCommitted(spark, root).count() === 6L)
  }

  test("ledger is O(landing dir): removed files drop out; a rewritten file is NOT reloaded") {
    val root = tmpTable("graft-copyinto-ledger")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    val land = landingDir("graft-copy-land2")
    landFile(Seq((2L, "b")).toDF("k", "t"), land, "f1.parquet")
    landFile(Seq((3L, "c")).toDF("k", "t"), land, "f2.parquet")
    Lake.copyInto(spark, root, land.toString)
    assert(ledgerOf(root).map(_.takeWhile(_ != ':')).sorted ===
      Seq("f1.parquet", "f2.parquet"))
    // rewrite f1 IN PLACE (longer content): name-keyed dedup skips it
    java.nio.file.Files.delete(land.resolve("f1.parquet"))
    landFile(Seq((20L, "bbbbbbbbbbbbbbbb"), (21L, "z")).toDF("k", "t"),
      land, "f1.parquet")
    val (_, nRewrite) = Lake.copyInto(spark, root, land.toString)
    assert(nRewrite === 0L)
    assert(Lake.readCommitted(spark, root).count() === 3L)
    // remove f2 from the zone and land f3: the next COPY drops f2's
    // entry (it can never re-ingest) — the ledger tracks the dir
    java.nio.file.Files.delete(land.resolve("f2.parquet"))
    landFile(Seq((4L, "d")).toDF("k", "t"), land, "f3.parquet")
    Lake.copyInto(spark, root, land.toString)
    assert(ledgerOf(root).map(_.takeWhile(_ != ':')).sorted ===
      Seq("f1.parquet", "f3.parquet"))
    assert(Lake.readCommitted(spark, root).count() === 4L)
  }

  test("SQL spellings: path and catalog forms return (version, files_loaded)") {
    val root = tmpTable("graft-copyinto-sql")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    val land = landingDir("graft-copy-land3")
    landFile(Seq((2L, "b")).toDF("k", "t"), land, "f1.parquet")
    val r1 = spark.sql(s"COPY INTO '$root' FROM '$land'").collect().head
    assert(r1.getLong(1) === 1L)
    assert(Lake.readCommitted(spark, root).count() === 2L)
    spark.sql("DROP TABLE IF EXISTS copy_sql")
    spark.sql(s"CREATE TABLE copy_sql USING `graft-lake` OPTIONS (root '$root')")
    // catalog form, idempotent re-run
    val r2 = spark.sql(s"COPY INTO copy_sql FROM '$land'").collect().head
    assert(r2.getLong(1) === 0L)
    landFile(Seq((3L, "c")).toDF("k", "t"), land, "f2.parquet")
    val r3 = spark.sql(s"COPY INTO copy_sql FROM '$land'").collect().head
    assert(r3.getLong(1) === 1L)
    assert(spark.sql("SELECT count(*) FROM copy_sql").collect()
      .head.getLong(0) === 3L)
    spark.sql("DROP TABLE copy_sql")
  }

  test("schema evolution and refusals: evolving landing files merge; races refuse loudly") {
    val root = tmpTable("graft-copyinto-evolve")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    val land = landingDir("graft-copy-land4")
    // an evolving landing file (extra nullable column) merges like
    // any append
    landFile(Seq((2L, "b", 9.5)).toDF("k", "t", "score"), land,
      "f1.parquet")
    Lake.copyInto(spark, root, land.toString)
    assert(rows(Lake.readCommitted(spark, root)) ===
      Set(Seq(1L, "a", null), Seq(2L, "b", 9.5)))
    // no table → loud refusal
    intercept[java.util.NoSuchElementException] {
      Lake.copyInto(spark, tmpTable("graft-copy-ghost"), land.toString)
    }
    // source dir must exist and must not be the root itself
    intercept[IllegalArgumentException] {
      Lake.copyInto(spark, root, root)
    }
    // an interleaved commit between ledger read and publish refuses
    // loudly (the re-run skips whatever the winner recorded)
    landFile(Seq((3L, "c", 1.0)).toDF("k", "t", "score"), land,
      "f2.parquet")
    Lake.beforePublish = () => {
      Lake.beforePublish = () => ()
      Lake.commitAppend(Seq((99L, "x", 0.0)).toDF("k", "t", "score"),
        root, retain = 8)
      ()
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        Lake.copyInto(spark, root, land.toString)
      }
    } finally Lake.beforePublish = () => ()
    // the re-run ingests exactly the unrecorded file
    val (_, n) = Lake.copyInto(spark, root, land.toString)
    assert(n === 1L)
    assert(Lake.readCommitted(spark, root).count() === 4L)
  }

  test("the ledger is feature-gated: #require carries 'ingest' so a pre-ingest build cannot amnesia it") {
    val root = tmpTable("graft-copyinto-gate")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), root, retain = 8)
    def requiresOf(v: Long): Set[String] =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, s"_commit_$v")), "UTF-8")
        .split("\n").find(_.startsWith("#require="))
        .map(_.stripPrefix("#require=").split(",").map(_.trim)
          .filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    // before any COPY: no ingest feature
    assert(!requiresOf(Lake.currentVersion(spark, root).get)("ingest"))
    val land = landingDir("graft-copy-landgate")
    landFile(Seq((2L, "b")).toDF("k", "t"), land, "f1.parquet")
    val (v1, _) = Lake.copyInto(spark, root, land.toString)
    // the COPY commit declares the ledger required — a build without
    // the feature would rebuild the manifest WITHOUT the #ingested=
    // lines and a re-run COPY would double-load every landing file
    assert(requiresOf(v1)("ingest"))
    // a plain append inherits the ledger AND keeps the gate with it
    Lake.commitAppend(Seq((3L, "c")).toDF("k", "t"), root, retain = 8)
    val v2 = Lake.currentVersion(spark, root).get
    assert(ledgerOf(root).nonEmpty)
    assert(requiresOf(v2)("ingest"))
    // idempotency survives the inheriting commit
    val (_, n) = Lake.copyInto(spark, root, land.toString)
    assert(n === 0L)
  }
}
