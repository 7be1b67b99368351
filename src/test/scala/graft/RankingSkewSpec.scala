package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ranking family under a DOMINANT (group, score) cell — the skew
  * case the Ranking scaladoc previously punted to "Skew territory".
  * The guard is `tieBucketWidth`: a monotone-in-tie bucket extends the
  * cell key, so the hot cell splits across many window partitions
  * while the produced ranks stay bit-identical (a hash salt would
  * scramble tie order inside the cell; a monotone bucket cannot). */
class RankingSkewSpec extends SparkSpec {
  import spark.implicits._

  // 90%-one-score skew: 2000 rows, group "a", 1800 of them score 5
  private lazy val skewed = (1L to 2000L)
    .map(i => (i, if (i % 2 == 0) "a" else "b", if (i <= 1800) 5L else i % 7))
    .toDF("id", "g", "score")

  test("bucketed rank is bit-identical to the unbucketed and the naive single-window rank") {
    val naive = skewed.withColumn("rank",
      row_number().over(Window.partitionBy("g").orderBy(desc("score"), col("id")))
        .cast("long"))
    val plain = Ranking.rankByScore(skewed, Seq("g"), "score", "id", "rank")
    val bucketed = Ranking.rankByScore(skewed, Seq("g"), "score", "id", "rank",
      tieBucketWidth = Some(100L))
    assert(rows(bucketed.select("id", "rank")) === rows(naive.select("id", "rank")))
    assert(rows(bucketed.select("id", "rank")) === rows(plain.select("id", "rank")))
  }

  test("ascending bucketed rank matches too (bucket order composes with asc score order)") {
    val naive = skewed.withColumn("rank",
      row_number().over(Window.partitionBy("g").orderBy(asc("score"), col("id")))
        .cast("long"))
    val bucketed = Ranking.rankByScore(skewed, Seq("g"), "score", "id", "rank",
      ascending = true, tieBucketWidth = Some(64L))
    assert(rows(bucketed.select("id", "rank")) === rows(naive.select("id", "rank")))
  }

  test("the guard balances the hot cell: no window partition exceeds ~width rows") {
    // the window partition population IS the (g, score, id div width)
    // cell size — measure it directly from the data
    val width = 100L
    val unguarded = skewed.groupBy("g", "score").count()
      .agg(max("count")).as[Long].head()
    assert(unguarded >= 900L) // the hot cell: one reducer owns 45% of rows
    val guarded = skewed
      .groupBy(col("g"), col("score"), expr(s"id div $width"))
      .count().agg(max("count")).as[Long].head()
    assert(guarded <= width) // every sub-cell fits the target task size
  }

  test("string ties: a character-prefix tieBucket (monotone) keeps ranks bit-identical") {
    // vocabulary's shape: huge tie cells (cnt=1 long tail), string tie
    val vocabish = (1L to 500L)
      .map(i => (f"tok$i%04d", if (i <= 450) 1L else i % 9 + 2))
      .toDF("token", "cnt")
    val naive = vocabish.withColumn("token_id",
      row_number().over(Window.orderBy(desc("cnt"), col("token"))).cast("long"))
    val bucketed = Ranking.rankByScore(vocabish, Seq.empty, "cnt", "token", "token_id",
      tieBucket = Some(substring(col("token"), 1, 6)))
    assert(rows(bucketed.select("token", "token_id")) ===
      rows(naive.select("token", "token_id")))
    // and the prefix genuinely splits the dominant cell
    val maxCell = vocabish.groupBy(col("cnt"), substring(col("token"), 1, 6))
      .count().agg(max("count")).as[Long].head()
    assert(maxCell < 450L)
  }

  test("width 1 degenerates safely (every row its own cell) and bad widths are rejected") {
    val one = Ranking.rankByScore(skewed, Seq("g"), "score", "id", "rank",
      tieBucketWidth = Some(1L))
    val plain = Ranking.rankByScore(skewed, Seq("g"), "score", "id", "rank")
    assert(rows(one.select("id", "rank")) === rows(plain.select("id", "rank")))
    intercept[IllegalArgumentException] {
      Ranking.rankByScore(skewed, Seq("g"), "score", "id", "rank",
        tieBucketWidth = Some(0L))
    }
  }
}
