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

  test("MisraGries: every item above N/(k+1) is a candidate, state stays bounded") {
    // skewed stream: item "h0" 500×, "h1" 300×, 400 singletons; N=1200
    // k=9 → guarantee covers freq > 120: h0 and h1 MUST survive
    val rows = (Seq.fill(500)("h0") ++ Seq.fill(300)("h1") ++
      (1 to 400).map(i => s"s$i"))
    val df = new scala.util.Random(42).shuffle(rows).map(Tuple1(_)).toDF("v")
      .repartition(7) // force multi-partition partial sketches + merge
    val mg = udaf(new graft.functions.MisraGries(9))
    val cands = df.agg(mg(col("v"))).head().getSeq[String](0)
    assert(cands.size <= 9, s"sketch exceeded k: $cands")
    assert(cands.contains("h0") && cands.contains("h1"),
      s"guaranteed heavy items missing from $cands")
  }

  test("heavyNgrams: exact counts above the threshold, identical to brute force") {
    // "alpha beta" dominates; unigram heavy hitters at > N/5
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.heavyNgrams(docs, "text", 1, 1, 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N=15 tokens; threshold cnt·5 > 15 → cnt > 3: alpha(4), beta(3) fails
    assert(out === Map("alpha" -> 4L))
    // bigram variant: N=12 bigrams, cnt·5 > 12 → cnt >= 3
    val bi = graft.operators.TextAnalysis.heavyNgrams(docs, "text", 2, 1, 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi === Map("alpha beta" -> 3L))
    // empty corpus: empty result, no throw
    assert(graft.operators.TextAnalysis.heavyNgrams(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", 1, 1, 100)
      .count() === 0)
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
