package graft

/** Scratch: run one catalog query (warm then sampled) with the
  * in-process main-thread stack sampler — round-20 measure tooling,
  * not part of the suite. Usage:
  *   sbt "Test/runMain graft.QuerySampler q138_lake_cdf_stream"
  */
object QuerySampler {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val fn = SparkEntry.queries(name)
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    val main = Thread.currentThread()
    val counts = scala.collection.mutable.Map.empty[String, Int]
    @volatile var on = false
    val t = new Thread(() => {
      while (true) {
        try {
          if (on) {
            val all = main.getStackTrace.iterator.map(_.toString).toSeq
            val interesting = all.filter(f => f.startsWith("graft.") ||
              f.contains("AdaptiveSparkPlanExec") || f.contains("Observation") ||
              f.contains("StreamExecution") || f.contains("MicroBatch") ||
              f.contains("RuleExecutor") || f.contains("DAGScheduler") ||
              f.contains("FileFormatWriter") || f.contains("awaitTermination"))
            val fr = (all.take(1) ++ interesting.take(4)).mkString(" <- ")
            if (fr.nonEmpty) counts.synchronized {
              counts(fr) = counts.getOrElse(fr, 0) + 1
            }
          }
        } catch { case _: Throwable => () }
        Thread.sleep(20)
      }
    })
    t.setDaemon(true); t.start()
    on = true
    val s = System.nanoTime()
    val df = fn(spark, sfDir)
    val t1 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val t2 = System.nanoTime()
    on = false
    println(f"QSAMPLE $name build=${(t1 - s) / 1e9}%.2fs probe=${(t2 - t1) / 1e9}%.2fs")
    counts.synchronized {
      counts.toSeq.sortBy(-_._2).take(14).foreach { case (f, n) =>
        println(s"QSAMPLE $n $f")
      }
    }
    spark.stop()
  }
}
