package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the 10^6-dir commit path (round-20 measure
  * pass): synthesizes ManifestGrowthProbe's phase-3 manifest-only
  * tiered table, then runs commits with an in-process stack sampler
  * on the main thread — pinpoints the O(total dirs) components the
  * carry engine still pays per commit. Test scope, not in the suite. */
object CommitScaleProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("/tmp"), spark.sparkContext.hadoopConfiguration)
    val nDirs = 1000000
    val rt = java.nio.file.Files.createTempDirectory("commit-scale").toString
    val rp = new org.apache.hadoop.fs.Path(rt)
    val ds = (0 until nDirs).map(i => f"z$i%08d")
    val schemaLine = "#schema=" + Seq((0L, "s")).toDF("k", "t").schema.json
    def statsLine(d: String, i: Int) = s"""#stats_$d={"k":{"n":["$i","$i"]}}"""
    val nSegs = 8
    (0 until nSegs).foreach { s =>
      val slice = ds.zipWithIndex.filter(_._2 % nSegs == s)
      val content = (slice.map(_._1) ++
        slice.map { case (d, i) => statsLine(d, i) }).mkString("\n")
      val so = fs.create(new org.apache.hadoop.fs.Path(rp, f"_seg_probe$s%04d"), true)
      so.write(content.getBytes("UTF-8")); so.close()
    }
    val mbody = (Seq("#op=append", schemaLine, "#statscols=k",
      s"#rows=$nDirs", "#require=seg") ++
      (0 until nSegs).map(s => f"#seg=_seg_probe$s%04d:${nDirs / nSegs}")).mkString("\n")
    val mo = fs.create(new org.apache.hadoop.fs.Path(rp, "_commit_0"), true)
    mo.write(mbody.getBytes("UTF-8")); mo.close()

    val main = Thread.currentThread()
    val counts = scala.collection.mutable.Map.empty[String, Int]
    @volatile var on = false
    val t = new Thread(() => {
      while (true) {
        try {
          if (on) {
            val all = main.getStackTrace.iterator.map(_.toString).toSeq
            val interesting = all.filter(f => f.startsWith("graft."))
            val fr = (all.take(2) ++ interesting.take(3)).mkString(" <- ")
            if (fr.nonEmpty) counts.synchronized {
              counts(fr) = counts.getOrElse(fr, 0) + 1
            }
          }
        } catch { case _: Throwable => () }
        Thread.sleep(20)
      }
    })
    t.setDaemon(true); t.start()

    // warm-up commit (codegen/JIT), then sampled commits
    graft.sources.Lake.commitAppend(Seq((1L, "x")).toDF("k", "t"), rt,
      retain = 0, statsCols = Seq("k"))
    on = true
    (2 to 4).foreach { i =>
      val s = System.nanoTime()
      graft.sources.Lake.commitAppend(Seq((i.toLong, "x")).toDF("k", "t"), rt,
        retain = 0, statsCols = Seq("k"))
      println(f"SCALEPROF commit#$i ${(System.nanoTime() - s) / 1e9}%.2fs")
    }
    on = false
    counts.synchronized {
      counts.toSeq.sortBy(-_._2).take(20).foreach { case (f, n) =>
        println(s"SCALESAMPLE $n $f")
      }
    }
  }
}
