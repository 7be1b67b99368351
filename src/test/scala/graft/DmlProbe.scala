package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

object DmlProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.spark
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
        k = 5, roundTo = 4).select(col("query_id"), col("neighbor_id"))
      val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", dims = 64,
        planesPerBand = 8, k = 5, bands = 4, maxBucketFreq = 200)
        .where(col("query_id") < 8)
      val ivf = Similarity.ivfTopK(emb, queries,
        Similarity.codebookFromLabels(emb, "label", "embedding"),
        "vec_id", "embedding", k = 5, nprobe = 2)
      val pq = Similarity.pqTopK(emb, queries,
        Similarity.pqCodebooks(emb, "label", "embedding", m = 8, dims = 64),
        "vec_id", "embedding", k = 5, subLen = 8)
      def recall(ann: org.apache.spark.sql.DataFrame, m: String): Unit = {
        val hits = ann.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        val total = exact.count()
        println(s"== $d $m recall = ${hits.toDouble / total} ($hits/$total)")
      }
      val q69 = Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", k = 5)
      recall(lsh, "lsh"); recall(ivf, "ivf"); recall(pq, "pq"); recall(q69, "int8")
    }
  }
}
