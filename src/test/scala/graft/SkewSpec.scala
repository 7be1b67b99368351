package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join: exact equivalence to the plain join + the balanced
  * shuffle proof (the exchange keys include the salt, and the hot key's
  * rows land in several shuffle partitions instead of one). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90%-hot key 7 + a long tail: the shape where one reducer would
  // otherwise own the join.
  private lazy val facts = (1L to 900L).map(i => (i, 7L))
    .++((901L to 1000L).map(i => (i, i % 50)))
    .toDF("row_id", "k")
  private lazy val dim = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "payload")

  test("saltedJoin result is exactly the plain join") {
    val plain = facts.join(dim, Seq("k")).select("row_id", "k", "payload")
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), salts = 8,
        saltSource = col("row_id"))
      .select("row_id", "k", "payload")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin shuffles on (key, salt): hot key spread over multiple partitions") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path — the assertion is about the
      // exchange, which a broadcast would (correctly) eliminate
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = Skew.saltedJoin(facts, dim, Seq("k"), salts = 8,
        saltSource = col("row_id"))
      salted.count()
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"exchange must partition on the salt too:\n$plan")
      // the hot key's 900 rows must occupy several distinct salt values,
      // i.e. several reducer sub-keys (with 900 draws over 8 salts, all
      // salts are hit with overwhelming probability)
      val saltsHit = facts.where(col("k") === 7L)
        .select(pmod(xxhash64(col("row_id")), lit(8L)).cast("int").as("s"))
        .distinct().count()
      assert(saltsHit === 8L, s"hot key spread over $saltsHit of 8 salts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE skew join splits the hot partition at runtime (the no-rewrite alternative)") {
    // AQE's skew handling needs no query rewrite but only covers the
    // sort-merge-join READ side; Skew.saltedJoin also balances the
    // shuffle write and aggregations. Thresholds are lowered so the
    // test-scale hot key (50k rows x ~60 bytes) crosses the skew bar.
    val overrides = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB")
    val prev = overrides.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val bigFacts = spark.range(0, 60000).toDF("row_id")
        .withColumn("k", when(col("row_id") < 50000, 7L).otherwise(col("row_id") % 50))
        .withColumn("pad", lpad(col("row_id").cast("string"), 48, "x"))
      val joined = bigFacts.join(dim, Seq("k"))
      // collect() finalizes THIS dataset's adaptive plan (count() would
      // execute a different QueryExecution, leaving this one unfinalized)
      assert(joined.collect().length === 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed SMJ side:\n${plan.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
