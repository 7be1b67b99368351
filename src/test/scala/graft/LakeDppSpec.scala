package graft

import graft.sources.Lake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition-schema reads: a partitioned lake snapshot exposes its
  * partition columns as TRUE Spark partition columns, so static
  * partition predicates prune at planning and Spark's own DYNAMIC
  * partition pruning (the star-join runtime prune) fires with no
  * engine-specific API — the q150 two-phase helper becomes plain SQL. */
class LakeDppSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  /** (numPartitions, numFiles) the executed plan's lake scan reports —
    * collected AFTER execution so dynamic pruning has re-filtered. */
  /** All lake scans of an executed plan, descending through AQE query
    * stages (their subtrees are members, not children — plain collect
    * misses them). */
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[FileSourceScanExec] = p.collect {
    case s: FileSourceScanExec
        if s.relation.location.isInstanceOf[graft.sources.LakeFileIndex] =>
      Seq(s)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
  }.flatten

  private def scanned(df: DataFrame): (Long, Long) = {
    df.collect()
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a lake FileSourceScanExec")
    (scans.map(_.metrics.get("numPartitions").map(_.value).getOrElse(0L)).sum,
      scans.map(_.metrics("numFiles").value).sum)
  }

  /** A 7-year partitioned fact: year y holds rows y*100+i, i<20. */
  private def factTable(): String = {
    val root = tmpTable("graft-dpp-fact")
    val rows = for (y <- 1992 to 1998; i <- 0 until 20)
      yield (y * 100L + i, y.toLong, s"p$y-$i")
    Lake.commitOverwrite(rows.toDF("id", "y", "payload"), root,
      retain = 4, partitionBy = Seq("y"))
    root
  }

  test("static partition predicates prune through plain SQL on the partition column") {
    val root = factTable()
    Lake.registerSql(spark, "dpp_fact", root)
    val (allParts, allFiles) = scanned(spark.sql("SELECT * FROM dpp_fact"))
    assert(allParts === 7L)
    val one = spark.sql("SELECT id, y, payload FROM dpp_fact WHERE y = 1996")
    assert(rows(one.select("id")) ===
      (0 until 20).map(i => Seq(1996 * 100L + i)).toSet)
    val (p1, f1) = scanned(
      spark.sql("SELECT id, y, payload FROM dpp_fact WHERE y = 1996"))
    assert(p1 === 1L, s"expected 1 of $allParts partitions, got $p1")
    assert(f1 < allFiles)
    // column order is the committed one despite the partition split
    assert(spark.sql("SELECT * FROM dpp_fact").columns.toSeq ===
      Seq("id", "y", "payload"))
    // a partition-column-only projection still answers exactly
    assert(spark.sql("SELECT DISTINCT y FROM dpp_fact").collect()
      .map(_.getLong(0)).sorted.toSeq === (1992L to 1998L))
  }

  test("dynamic partition pruning: the star join reads 2 of 7 partitions, plain SQL") {
    val root = factTable()
    Lake.registerSql(spark, "dpp_fact2", root)
    // the dim must be a REAL scan (a literal local table constant-
    // folds its filter away and leaves nothing selective to prune by)
    val dimRoot = tmpTable("graft-dpp-dim")
    Lake.commitOverwrite(
      Seq((1993L, "hot"), (1997L, "hot"), (1992L, "cold"), (1994L, "cold"),
        (1995L, "cold"), (1996L, "cold"), (1998L, "cold")).toDF("y", "temp"),
      dimRoot, retain = 4)
    Lake.registerSql(spark, "dpp_dim", dimRoot)
    val q =
      """SELECT f.id, f.payload, d.y
        |FROM dpp_fact2 f JOIN dpp_dim d ON f.y = d.y
        |WHERE d.temp = 'hot'""".stripMargin
    val df = spark.sql(q)
    // correctness first
    assert(df.count() === 40L)
    assert(rows(df.select("d.y")).map(_.head) === Set(1993L, 1997L))
    // the plan carries a dynamic pruning subquery on the fact scan …
    val planStr = spark.sql(q).queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic pruning in plan:\n$planStr")
    // … and at execution only the dim-selected partitions are read
    val (p, _) = scanned(spark.sql(q))
    assert(p === 2L, s"expected 2 of 7 partitions read, got $p")
  }

  test("partition mode degrades honestly: an un-tupled dir disables it, answers unchanged") {
    val root = factTable()
    // a fold-style commit writes a plain dir with NO #part_ line:
    // simulate by appending through the normal path then stripping the
    // line from the manifest (the maintenance-fallback shape)
    Lake.commitAppend(Seq((999901L, 1999L, "x")).toDF("id", "y", "payload"),
      root, retain = 4)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val v = Lake.currentVersion(spark, root).get
    val m = new org.apache.hadoop.fs.Path(root, s"_commit_$v")
    val body = scala.io.Source.fromInputStream(fs.open(m), "UTF-8").mkString
    val newDir = Lake.snapshotDirNames(spark, root, v)
      .diff(Lake.snapshotDirNames(spark, root, v - 1)).head
    val stripped = body.split("\n")
      .filterNot(_.startsWith(s"#part_$newDir=")).mkString("\n")
    val out = fs.create(m, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    val df = Lake.sqlTable(spark, root)
    // flat mode: one partition-less listing, but every row still served
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.head.relation.partitionSchema.isEmpty)
    assert(df.count() === 7L * 20 + 1)
    assert(rows(df.where(col("y") === 1999L).select("id")) ===
      Set(Seq(999901L)))
  }
}
