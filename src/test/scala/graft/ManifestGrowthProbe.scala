package graft

import org.apache.spark.sql.functions._

/** Reproduces the BENCH_NOTES round-11 manifest-growth measurement:
  * a 10^4-dir append-heavy table synthesized by hard-linking one real
  * committed dir (byte-identical to 10^4 tiny appends) + a
  * hand-written manifest, then timed read-planning surfaces.
  * `Test/runMain graft.ManifestGrowthProbe`. */
object ManifestGrowthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("manifest-growth").toString
    val n = 10000
    // one real committed dir, then replicate its layout n times via
    // file copies — byte-identical to n tiny appends, minus the wait
    graft.sources.Lake.commitAppend(Seq((0L, "seed")).toDF("k", "t"), root,
      retain = 0, statsCols = Seq("k"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val r = new org.apache.hadoop.fs.Path(root)
    val seedDir = fs.listStatus(r).filter(_.isDirectory).head.getPath
    val files = fs.listStatus(seedDir).filter(_.isFile).map(_.getPath)
    val dirs = (0 until n).map(i => f"z$i%08d")
    val t0 = System.nanoTime()
    dirs.foreach { d =>
      val dst = new org.apache.hadoop.fs.Path(r, d)
      fs.mkdirs(dst)
      files.foreach { f =>
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath, f.getName),
          java.nio.file.Paths.get(f.toUri.getPath))
      }
    }
    println(s"== replicate ${(System.nanoTime()-t0)/1e9}s")
    // manifest with n dirs + n stats lines (each dir's k range = [i,i])
    val schemaLine = "#schema=" + Seq((0L,"s")).toDF("k","t").schema.json
    val body = (dirs ++ Seq("#op=append", schemaLine, "#statscols=k", s"#rows=$n") ++
      dirs.zipWithIndex.map { case (d, i) =>
        s"""#stats_$d={"k":{"n":["$i","$i"]}}""" }).mkString("\n")
    val out = fs.create(new org.apache.hadoop.fs.Path(r, "_commit_1"), true)
    out.write(body.getBytes("UTF-8")); out.close()
    println(s"== manifest bytes: ${fs.getFileStatus(new org.apache.hadoop.fs.Path(r, "_commit_1")).getLen}")
    def time[T](tag: String)(f: => T): T = {
      val s = System.nanoTime(); val v = f
      println(f"== $tag: ${(System.nanoTime()-s)/1e6}%.1f ms"); v
    }
    time("currentVersion")(graft.sources.Lake.currentVersion(spark, root))
    val df = time("readCommitted construct")(graft.sources.Lake.readCommitted(spark, root))
    time("readCommitted count job")(df.count())
    time("countCommitted (metadata)")(graft.sources.Lake.countCommitted(spark, root))
    time("readCommittedWhere k=17 construct+collect")(
      graft.sources.Lake.readCommittedWhere(spark, root, col("k") === 17L).collect())
    val sq = time("sqlTable construct (plan index)")(graft.sources.Lake.sqlTable(spark, root))
    time("sqlTable point query collect")(sq.where(col("k") === 17L).collect())
    time("sqlTable full count")(sq.count())
    // second pass: warm fs metadata
    time("readCommittedWhere warm")(
      graft.sources.Lake.readCommittedWhere(spark, root, col("k") === 17L).collect())
    time("resolveWhere only (planning)")(
      graft.sources.Lake.resolveWhere(spark, root, col("k") === 17L))
  }
}
