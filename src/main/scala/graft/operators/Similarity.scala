package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * No counterpart exists in the reference (pandas ETL); this is part of
  * the LLM-data-pipeline surface mandated by the north star
  * (repo:BASELINE.json line 6). Two tiers:
  *
  *  - [[bruteForceTopK]] — exact cosine top-k for a *small query set*
  *    against a large corpus: broadcast the queries, stream the corpus.
  *    Cost O(|corpus|·|queries|), embarrassingly parallel, zero shuffle
  *    on the corpus side until the final per-query top-k (which moves
  *    only k·|queries| rows). This is the right plan even at 100 TB as
  *    long as |queries| is bounded.
  *  - [[lshTopK]] — random-hyperplane LSH bucketing for query sets too
  *    large to broadcast-cross: both sides are hashed to sign-pattern
  *    buckets and only bucket-collisions are scored.
  */
object Similarity {

  /** Exact top-k by cosine for each row of `queries`.
    *
    * Self-exclusion is by id: `queries` is assumed to be drawn from the
    * same id space as `corpus` (the usual "query by example" case); a
    * row never matches the corpus row with its own id. If queries come
    * from an unrelated table, remap ids first (e.g. negate them) or a
    * coincidental id collision silently drops a valid neighbor.
    *
    * @param roundTo if >= 0, round the score to that many decimals and
    *   rank on the rounded value (with id tie-break) — makes the
    *   selection robust to sub-ulp float differences across engines.
    * @return (query_id, neighbor_id, cosine, rank) */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, roundTo: Int = -1): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val raw = VectorFns.cosine(col("qv"), col("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", if (roundTo >= 0) round(raw, roundTo) else raw)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived value in [-0.5, 0.5). Deterministic so results are
    * reproducible across runs and engines. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$plane-dim$dim".getBytes("UTF-8"))
      .take(7).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16).toDouble / Math.pow(16, 14)) - 0.5
  }

  /** Random-hyperplane LSH: bucket = sign pattern of `planes` dot
    * products. Vectors in the same bucket are scored exactly; the
    * planes are literals folded into codegen (no join for the planes).
    * @return (query_id, neighbor_id, cosine, rank) — approximate */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      dims: Int, planes: Int, k: Int): DataFrame = {
    val sig = (0 until planes).map { p =>
      // plane as one array literal + native dot — a flat 2·dims-node
      // expression per plane instead of a dims-term add chain, which
      // bloats generated code past JIT limits at high dims
      val plane = array((0 until dims).map(d => lit(planeComponent(p, d))): _*)
      val dot = VectorFns.dot(col(vecCol), plane)
      when(dot >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    val bucketed = df.select(
      col(idCol), col(vecCol), concat(sig: _*).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("qv"))
    val b = bucketed.select(col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = a.join(b, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: all (a, b) with
    * cosine ≥ threshold, a < b. Exact all-pairs scoring — the
    * O(N²) baseline, correct at any N but quadratic; at corpus scale
    * swap the candidate generation for [[lshTopK]]'s sign-bucket join
    * (same scorer, bucket-bounded pairs). The threshold is applied to
    * the ROUNDED score so a sub-1e-4 float difference between engines
    * cannot change the selected pair set. */
  def cosinePairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundTo: Int = 4): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", round(VectorFns.cosine(col("va"), col("vb")), roundTo))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Per-label centroids: element-wise mean via posexplode + regroup.
    * Shuffles (label, pos) pairs — dims × |labels| cells, independent of
    * corpus size after the partial aggregation. */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("v").cast("double")).as("mean"))
      .groupBy(col(labelCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pairs"))
      .select(col(labelCol), expr("transform(pairs, p -> p.mean)").as("centroid"))
}
