package graft

import org.apache.spark.sql.functions._
import graft.functions.MajorityVote

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("MajorityVote: most frequent wins; ties break to smallest value; nulls ignored") {
    val vote = udaf(MajorityVote)
    val df = Seq(
      ("g1", "b"), ("g1", "a"), ("g1", "b"),
      ("g2", "y"), ("g2", "x"),              // tie → lexicographically smallest
      ("g3", null.asInstanceOf[String])      // all-null group → null
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(vote(col("v")).as("top"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("g1") === "b")
    assert(out("g2") === "x")
    assert(out("g3") === null)
  }

  test("MajorityVote matches the untyped two-step argmax on a larger input") {
    val df = (1 to 200).map(i => (i % 7, s"v${i % 3}")).toDF("g", "v")
    val vote = udaf(MajorityVote)
    val typed = df.groupBy("g").agg(vote(col("v")).as("top"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("cnt"), asc("v"))
    val untyped = df.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("g"), col("v").as("top"))
    assert(rows(typed) === rows(untyped))
  }
}
