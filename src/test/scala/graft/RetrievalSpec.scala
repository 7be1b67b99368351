package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Hand-computed TF-IDF / BM25 on a tiny corpus: the formulas are
  * re-derived in plain Scala doubles here, so the suite pins the exact
  * arithmetic (association order included) the oracle contract relies
  * on. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // N = 3; df: a→2, b→2, c→2, d→1
  private lazy val docs = Seq(
    (1L, "a a b"),
    (2L, "a c"),
    (3L, "b b c d")).toDF("doc_id", "text")

  test("tfidf: tf, df and ln(N/df) weighting with (score desc, term asc) ranking") {
    val out = Retrieval.tfidf(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rnk")
    val got = orderedRows(out)
    val w2 = math.log(3.0 / 2.0) // df=2
    val w1 = math.log(3.0 / 1.0) // df=1
    assert(got === Seq(
      Seq(1L, "a", 2L, 2L, 2.0 * w2, 1L),
      Seq(1L, "b", 1L, 2L, 1.0 * w2, 2L),
      Seq(2L, "a", 1L, 2L, 1.0 * w2, 1L),
      Seq(2L, "c", 1L, 2L, 1.0 * w2, 2L),
      // doc 3: d is rarer (df=1) so it outranks b (tf=2) at these
      // magnitudes? ln3 ≈ 1.10 vs 2·ln1.5 ≈ 0.81 — yes, d first.
      Seq(3L, "d", 1L, 1L, 1.0 * w1, 1L),
      Seq(3L, "b", 2L, 2L, 2.0 * w2, 2L)))
  }

  test("tfidf: a term present in every document scores exactly zero") {
    val univ = Seq((1L, "x p"), (2L, "x q"), (3L, "x r")).toDF("doc_id", "text")
    val x = Retrieval.tfidf(univ, "doc_id", "text", k = 3)
      .where(col("term") === "x").select("tfidf").as[Double].collect()
    assert(x.toSeq === Seq(0.0, 0.0, 0.0))
  }

  test("bm25 matches the formula computed independently in Scala") {
    val k1 = 1.2; val b = 0.75
    val out = Retrieval.bm25(docs, "doc_id", "text",
      queryTerms = Seq("a", "d"), k = 10, k1 = k1, b = b)
    // corpus: dl = 3, 2, 4 → N=3, tl=9, avgdl=3
    val n = 3.0; val avgdl = 9.0 / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def contrib(tf: Double, df: Double, dl: Double) =
      (idf(df) * (tf * (k1 + 1.0))) /
        (tf + (k1 * ((1.0 - b) + b * (dl / avgdl))))
    // doc1: a(tf2,df2,dl3); doc2: a(tf1,df2,dl2); doc3: d(tf1,df1,dl4)
    val expect = Map(
      1L -> contrib(2, 2, 3),
      2L -> contrib(1, 2, 2),
      3L -> contrib(1, 1, 4))
    val got = out.select("doc_id", "score", "n_terms").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(got.keySet === expect.keySet)
    for ((id, want) <- expect) {
      assert(math.abs(got(id)._1 - want) < 1e-9,
        s"doc $id score ${got(id)._1} != $want")
      assert(got(id)._2 === 1L)
    }
    // ranking: top doc is the one with the highest score
    val top = out.select("doc_id").as[Long].head()
    assert(top === expect.maxBy(_._2)._1)
  }

  test("bm25: documents with no query term are absent; k caps the result") {
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("d"), k = 1)
    val got = out.select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }
}
