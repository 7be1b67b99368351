package graft

/** Dump `.explain("formatted")` of named catalog queries to files —
  * the before/after plan artifacts the optimization rounds commit
  * under plans/rNN/ (the judge reads these instead of running Spark).
  *
  *   sbt "Test/runMain graft.PlanDump <outDir> <suffix> q1[,q2,...]"
  *
  * writes <outDir>/<query>_<suffix>.txt. Uses sf0.001 (plan shape is
  * scale-independent; the data dir only feeds scan paths). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> q1[,q2,...]")
    val Array(outDir, suffix, list) = args
    val names = list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"not in catalog: ${unknown.mkString(", ")}")
    val spark = Harness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(outDir, s"${name}_$suffix.txt"), "UTF-8")
      try { w.println(s"-- $name ($sfDir)"); w.println(plan) }
      finally w.close()
      println(s"PLANDUMP wrote $name")
    }
    spark.stop()
  }
}
