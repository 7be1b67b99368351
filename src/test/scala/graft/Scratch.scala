package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.TextAnalysis

/** Ad-hoc debugging main (test scope; not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") === 25)
    val t = col("text")
    val toks = TextFns.tokens(TextFns.normalize(t))
    val nWords = size(toks)
    val meanWordLen = when(nWords === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") / nWords)
    val stopRatio = TextFns.stopwordRatio(toks, TextAnalysis.stopwords("en"))
    docs.select(
      col("doc_id"),
      nWords.as("n_words"),
      meanWordLen.as("mwl"),
      stopRatio.as("sr"),
      (least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4).as("c1"),
      when(meanWordLen.between(3.0, 10.0), 0.3).otherwise(0.0).as("c2"),
      (least(stopRatio * 3.0, lit(1.0)) * 0.3).as("c3"),
      (least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4 +
        when(meanWordLen.between(3.0, 10.0), 0.3).otherwise(0.0) +
        least(stopRatio * 3.0, lit(1.0)) * 0.3).as("raw"))
      .collect().foreach { r =>
        println(s"n=${r.get(1)} mwl=${r.get(2)} sr=${r.get(3)} " +
          s"c1=${java.lang.Double.toHexString(r.getDouble(4))} " +
          s"c2=${java.lang.Double.toHexString(r.getDouble(5))} " +
          s"c3=${java.lang.Double.toHexString(r.getDouble(6))} " +
          s"raw=${java.lang.Double.toHexString(r.getDouble(7))} raw10=${r.getDouble(7)}")
      }
    spark.stop()
  }
}
