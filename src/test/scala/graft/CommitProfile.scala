package graft

import org.apache.spark.sql.functions._

/** Scratch micro-profiler for the lake commit path (round-20 measure
  * pass): times N tiny commitAppend/mergeCommitted calls against a
  * fresh table and prints per-phase wall clock, so the driver-side
  * share (manifest fold, fs ops, Observation.get, planning) separates
  * from Spark job time. Test scope only — not part of the suite. */
object CommitProfile {
  def main(args: Array[String]): Unit = {
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.sources.{Lake, Tables}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = java.nio.file.Files.createTempDirectory("commit_profile").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
      .withColumn("ver", lit(0L)).limit(2000)
    // warm-up: one commit end to end (codegen, JIT, fs init)
    Lake.commitAppend(docs.where(col("doc_id") < 100), root, retain = 8,
      statsCols = Seq("doc_id"))

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()); jobs += 1
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId); if (t0 != 0L) jobNanos += System.nanoTime() - t0
      }
    })

    // in-process sampler: aggregate the main thread's top in-house /
    // interesting frames every 25 ms while `timed` bodies run
    val main = Thread.currentThread()
    val frameCounts = scala.collection.mutable.Map.empty[String, Int]
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        try {
          if (sampling) {
            val st = main.getStackTrace
            val frames = st.iterator.map(_.toString).toSeq
            val interesting = frames.filter(f =>
              f.startsWith("graft.") || f.startsWith("org.apache.spark."))
            val sig =
              if (interesting.nonEmpty) interesting.take(3).mkString(" <- ")
              else frames.slice(3, 12).mkString(" <- ")
            if (sig.nonEmpty) frameCounts.synchronized {
              frameCounts(sig) = frameCounts.getOrElse(sig, 0) + 1
            }
          }
        } catch { case _: Throwable => () }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    def timed(label: String)(body: => Unit): Unit = {
      jobs = 0; jobNanos = 0L
      val t0 = System.nanoTime()
      body
      val t1 = System.nanoTime()
      Thread.sleep(80)
      println(f"CPROF $label wall=${(t1 - t0) / 1e9}%.3fs jobs=$jobs jobTime=${jobNanos / 1e9}%.3fs")
    }

    timed("append x5") {
      (0 until 5).foreach { i =>
        Lake.commitAppend(docs.where(col("doc_id") % 5 === i), root, retain = 8)
      }
    }
    timed("merge x3") {
      (0 until 3).foreach { i =>
        Lake.mergeCommitted(spark, root,
          docs.where(col("doc_id") % 7 === i)
            .withColumn("ver", lit(i.toLong)).withColumn("is_del", lit(false)),
          Seq("doc_id"), "ver", "is_del", retain = 8)
      }
    }
    if (sys.env.contains("CPROF_LONG")) {
      sampling = true
      timed("merge x20") {
        (3 until 23).foreach { i =>
          Lake.mergeCommitted(spark, root,
            docs.where(col("doc_id") % 29 === (i % 29))
              .withColumn("ver", lit(i.toLong)).withColumn("is_del", lit(false)),
            Seq("doc_id"), "ver", "is_del", retain = 8)
        }
      }
      sampling = false
      frameCounts.synchronized {
        frameCounts.toSeq.sortBy(-_._2).take(25).foreach { case (f, n) =>
          println(s"CSAMPLE $n $f")
        }
      }
    }
    timed("read probe") {
      Lake.readCommitted(spark, root).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
