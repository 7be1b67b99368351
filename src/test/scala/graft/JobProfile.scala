package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query job profiler (guide §1: measure first). Runs the named
  * catalog queries once for warm-up, then once more counting Spark
  * jobs, stages, tasks and per-job wall-clock via a listener — the
  * local-mode equivalent of reading the UI's Jobs tab. Usage:
  *
  *   sbt "Test/runMain graft.JobProfile q147_lake_partitioned[,q...]"
  *
  * Prints, per query: build-phase jobs (scenario commits) vs
  * probe-phase jobs (the returned plan's noop execution), so the
  * fixed-job-overhead share of each bench second is visible before
  * and after an optimization. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile q1[,q2,...]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"not in catalog: ${unknown.mkString(", ")}")
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()); jobs += 1
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != 0L) jobNanos += System.nanoTime() - t0
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; jobNanos = 0L }
    // package-private in Spark; poll instead: quiesce when no job is in flight
    def waitListeners(s: org.apache.spark.sql.SparkSession): Unit = {
      var spins = 0
      while (!starts.isEmpty && spins < 200) { Thread.sleep(5); spins += 1 }
      Thread.sleep(50)
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up: codegen + JIT, same as Bench
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.addSparkListener(listener)
      System.gc()
      reset()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      waitListeners(spark)
      val (bJobs, bStages, bTasks, bNanos) = (jobs, stages, tasks, jobNanos)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      waitListeners(spark)
      val t2 = System.nanoTime()
      spark.sparkContext.removeSparkListener(listener)
      def s(n: Long) = f"${n / 1e9}%.2fs"
      println(f"PROFILE $name build=${s(t1 - t0)} probe=${s(t2 - t1)} | " +
        f"build jobs=$bJobs stages=$bStages tasks=$bTasks jobTime=${s(bNanos)} | " +
        f"probe jobs=${jobs - bJobs} stages=${stages - bStages} " +
        f"tasks=${tasks - bTasks} jobTime=${s(jobNanos - bNanos)}")
    }
    spark.stop()
  }
}
