package graft

import org.apache.spark.sql.SparkSession

/** One session builder for both driver surfaces (Verify, Bench) so the
  * correctness and bench sessions can never drift apart in engine
  * semantics — a legacy-reader flag applied to one but not the other
  * would make the benchmarked plans different from the verified ones. */
object Harness {
  def session(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // engine extensions: graft_* SQL functions + the rule routing
      // SQL INSERT on graft-lake tables through the manifest commit
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.timeParserPolicy", "CORRECTED")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
