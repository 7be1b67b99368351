package graft

import graft.operators.Classify

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dict = Seq(
    "guerre" -> "ukraine", "kiev" -> "ukraine",
    "paris" -> "france", "seine" -> "france").toDF("word", "label")

  test("majority vote wins (Transform.py:27-29)") {
    val docs = Seq((1L, "guerre kiev paris")).toDF("doc_id", "text")
    val out = Classify.byKeywords(docs, "doc_id", "text", dict, "other")
    assert(rows(out) === Set(Seq(1L, "ukraine")))
  }

  test("tie breaks to lexicographically smallest label (pinned total order)") {
    val docs = Seq((1L, "guerre paris")).toDF("doc_id", "text")
    val out = Classify.byKeywords(docs, "doc_id", "text", dict, "other")
    assert(rows(out) === Set(Seq(1L, "france")))
  }

  test("no keyword hit falls back to the default label (Transform.py:14)") {
    val docs = Seq((1L, "nothing matches here"), (2L, "seine")).toDF("doc_id", "text")
    val out = Classify.byKeywords(docs, "doc_id", "text", dict, "other")
    assert(rows(out) === Set(Seq(1L, "other"), Seq(2L, "france")))
  }

  test("normalization applies before matching: punctuation and case don't block hits") {
    val docs = Seq((1L, "GUERRE, Kiev; l'ukraine")).toDF("doc_id", "text")
    val out = Classify.byKeywords(docs, "doc_id", "text", dict, "other")
    assert(rows(out) === Set(Seq(1L, "ukraine")))
  }

  test("every doc gets exactly one label (classification is total)") {
    val docs = (1L to 50L).map(i => (i, if (i % 3 == 0) "paris" else "x " * i.toInt))
      .toDF("doc_id", "text")
    val out = Classify.byKeywords(docs, "doc_id", "text", dict, "other")
    assert(out.count() === 50)
    assert(out.select("doc_id").distinct().count() === 50)
  }
}
