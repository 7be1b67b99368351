package graft

import org.apache.spark.sql.functions._

/** Manifest-growth measurement, three phases.
  *
  * Phase 1 reproduces the BENCH_NOTES round-11 measurement: a 10^4-dir
  * append-heavy UNTIERED table synthesized by hard-linking one real
  * committed dir (byte-identical to 10^4 tiny appends) + a hand-written
  * manifest, then timed read-planning surfaces.
  *
  * Phase 2 (round 18): a 10^5-dir TIERED table (real dirs, synthesized
  * segments) — proves a real `commitAppend` on top writes O(batch)
  * manifest bytes (vs O(table) untiered) while read planning stays one
  * bounded manifest+segment pass.
  *
  * Phase 3: 10^6 dirs, manifest-only (no data dirs on disk) — the
  * commit-bytes curve at the scale where an untiered body would be
  * ~60 MB per commit.
  *
  * `Test/runMain graft.ManifestGrowthProbe`. */
object ManifestGrowthProbe {
  private def time[T](tag: String)(f: => T): T = {
    val s = System.nanoTime(); val v = f
    println(f"== $tag: ${(System.nanoTime()-s)/1e6}%.1f ms"); v
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    import spark.implicits._

    // ---- phase 1: 10^4 dirs, untiered (the round-11 baseline) -------
    val root = java.nio.file.Files.createTempDirectory("manifest-growth").toString
    val n = 10000
    graft.sources.Lake.commitAppend(Seq((0L, "seed")).toDF("k", "t"), root,
      retain = 0, statsCols = Seq("k"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val r = new org.apache.hadoop.fs.Path(root)
    val seedDir = fs.listStatus(r).filter(_.isDirectory).head.getPath
    val files = fs.listStatus(seedDir).filter(_.isFile).map(_.getPath)
    // ext4 caps hard links at ~65k per inode: rotate over per-root
    // SOURCE COPIES so any scale stays under the cap; java.nio
    // directly (Hadoop LocalFS mkdirs is ~4 ms/dir of pure overhead)
    def linkDirs(rt: org.apache.hadoop.fs.Path, dirs: Seq[String]): Unit = {
      val nCopies = math.max(1, dirs.size / 30000 + 1)
      val srcSets = (0 until nCopies).map { c =>
        files.map { f =>
          val cp = java.nio.file.Paths.get(rt.toUri.getPath, s"_src$c${f.getName}")
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(f.toUri.getPath), cp)
          (f.getName, cp)
        }
      }
      dirs.zipWithIndex.foreach { case (d, i) =>
        val dst = java.nio.file.Paths.get(rt.toUri.getPath, d)
        java.nio.file.Files.createDirectory(dst)
        srcSets(i % nCopies).foreach { case (name, src) =>
          java.nio.file.Files.createLink(dst.resolve(name), src)
        }
      }
      // the rotation sources are bookkeeping, not data — drop them
      // (their linked copies live on under the data dirs)
      srcSets.flatten.foreach(p => java.nio.file.Files.delete(p._2))
    }
    val dirs = (0 until n).map(i => f"z$i%08d")
    val t0 = System.nanoTime()
    linkDirs(r, dirs)
    println(s"== replicate ${(System.nanoTime()-t0)/1e9}s")
    val schemaLine = "#schema=" + Seq((0L,"s")).toDF("k","t").schema.json
    def statsLine(d: String, i: Int) = s"""#stats_$d={"k":{"n":["$i","$i"]}}"""
    val body = (dirs ++ Seq("#op=append", schemaLine, "#statscols=k", s"#rows=$n") ++
      dirs.zipWithIndex.map { case (d, i) => statsLine(d, i) }).mkString("\n")
    val out = fs.create(new org.apache.hadoop.fs.Path(r, "_commit_1"), true)
    out.write(body.getBytes("UTF-8")); out.close()
    println(s"== manifest bytes: ${fs.getFileStatus(new org.apache.hadoop.fs.Path(r, "_commit_1")).getLen}")
    time("currentVersion")(graft.sources.Lake.currentVersion(spark, root))
    val df = time("readCommitted construct")(graft.sources.Lake.readCommitted(spark, root))
    time("readCommitted count job")(df.count())
    time("countCommitted (metadata)")(graft.sources.Lake.countCommitted(spark, root))
    time("readCommittedWhere k=17 construct+collect")(
      graft.sources.Lake.readCommittedWhere(spark, root, col("k") === 17L).collect())
    val sq = time("sqlTable construct (plan index)")(graft.sources.Lake.sqlTable(spark, root))
    time("sqlTable point query collect")(sq.where(col("k") === 17L).collect())
    time("sqlTable full count")(sq.count())
    time("readCommittedWhere warm")(
      graft.sources.Lake.readCommittedWhere(spark, root, col("k") === 17L).collect())
    time("resolveWhere only (planning)")(
      graft.sources.Lake.resolveWhere(spark, root, col("k") === 17L))

    // ---- phase 2: 10^5 dirs, TIERED, real data dirs ------------------
    // Synthesized as 8 immutable segments + a tiered manifest — the
    // state 10^5 real appends converge to — then REAL commits on top
    // measure per-commit bytes and planning.
    def synthesizeTiered(nDirs: Int, realDirs: Boolean): String = {
      val rt = java.nio.file.Files.createTempDirectory(
        s"manifest-tiered-$nDirs").toString
      val rp = new org.apache.hadoop.fs.Path(rt)
      fs.mkdirs(rp)
      val ds = (0 until nDirs).map(i => f"z$i%08d")
      if (realDirs) {
        val t = System.nanoTime()
        linkDirs(rp, ds)
        println(f"== [$nDirs%,d] replicate ${(System.nanoTime()-t)/1e9}%.1fs")
      }
      val nSegs = 8
      val segNames = (0 until nSegs).map(s => f"_seg_probe$s%04d")
      segNames.zipWithIndex.foreach { case (name, s) =>
        val slice = ds.zipWithIndex.filter(_._2 % nSegs == s)
        val content = (slice.map(_._1) ++
          slice.map { case (d, i) => statsLine(d, i) }).mkString("\n")
        val so = fs.create(new org.apache.hadoop.fs.Path(rp, name), true)
        so.write(content.getBytes("UTF-8")); so.close()
      }
      val mbody = (Seq("#op=append", schemaLine, "#statscols=k",
        s"#rows=$nDirs", "#require=seg") ++
        segNames.map(nm => s"#seg=$nm:${nDirs / nSegs}")).mkString("\n")
      val mo = fs.create(new org.apache.hadoop.fs.Path(rp, "_commit_0"), true)
      mo.write(mbody.getBytes("UTF-8")); mo.close()
      println(s"== [$nDirs] tiered manifest bytes: " +
        fs.getFileStatus(new org.apache.hadoop.fs.Path(rp, "_commit_0")).getLen +
        s" (untiered equivalent: ~${body.length}+ bytes at 10^4, O(table))")
      rt
    }

    val rt5 = synthesizeTiered(100000, realDirs = true)
    // real appends on top: the headline number — commit bytes stay flat
    (1 to 5).foreach { i =>
      time(s"[1e5] commitAppend #$i")(
        graft.sources.Lake.commitAppend(Seq((1000000L + i, "x")).toDF("k", "t"),
          rt5, retain = 0, statsCols = Seq("k")))
      val v = graft.sources.Lake.currentVersion(spark, rt5).get
      println(s"== [1e5] commit_$v bytes: " + fs.getFileStatus(
        new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(rt5),
          s"_commit_$v")).getLen)
    }
    time("[1e5] currentVersion")(graft.sources.Lake.currentVersion(spark, rt5))
    time("[1e5] countCommitted (metadata)")(
      graft.sources.Lake.countCommitted(spark, rt5))
    time("[1e5] readCommittedWhere k=17 construct+collect")(
      graft.sources.Lake.readCommittedWhere(spark, rt5, col("k") === 17L).collect())
    time("[1e5] readCommittedWhere warm")(
      graft.sources.Lake.readCommittedWhere(spark, rt5, col("k") === 17L).collect())
    time("[1e5] resolveWhere only (planning)")(
      graft.sources.Lake.resolveWhere(spark, rt5, col("k") === 17L))

    // ---- phase 3: 10^6 dirs, manifest-only commit bytes --------------
    val rt6 = synthesizeTiered(1000000, realDirs = false)
    // phase-3 dirs are manifest-only (never on disk), so the DEFENSIVE
    // currentVersion rightly refuses them — read the raw marker max
    def rawMax(rt: String): Long =
      new java.io.File(rt).listFiles().iterator.map(_.getName)
        .filter(n => n.startsWith("_commit_") && !n.endsWith(".tmp"))
        .flatMap(n => n.stripPrefix("_commit_").toLongOption).max
    (1 to 3).foreach { i =>
      time(s"[1e6] commitAppend #$i")(
        graft.sources.Lake.commitAppend(Seq((9000000L + i, "x")).toDF("k", "t"),
          rt6, retain = 0, statsCols = Seq("k")))
      val v = rawMax(rt6)
      println(s"== [1e6] commit_$v bytes: " + fs.getFileStatus(
        new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(rt6),
          s"_commit_$v")).getLen)
    }
    // planning proxy at 1e6 (dirs are manifest-only): a full manifest
    // + segment expansion and metadata parse, twice (cold then cached)
    time("[1e6] planning: countCommittedAt cold")(
      graft.sources.Lake.countCommittedAt(spark, rt6, rawMax(rt6)))
    time("[1e6] planning: countCommittedAt warm")(
      graft.sources.Lake.countCommittedAt(spark, rt6, rawMax(rt6)))
  }
}
