package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFns

/** Term-weighting and ranked retrieval over a document corpus — the
  * search/scoring half an LLM-data pipeline uses for quality-aware
  * corpus selection and query-driven subset extraction (the reference
  * stops at keyword voting, /root/reference/dags/Transform.py:14-33;
  * TF-IDF and BM25 are its natural corpus-scale generalization).
  *
  * Cross-engine float policy (the repo-wide contract): scores avoid
  * order-dependent double summation — TF-IDF is a per-(doc,term)
  * scalar (no sum at all) and BM25's per-document sum accumulates in
  * DECIMAL, so results are bit-stable under any partitioning and
  * hash-match the DuckDB oracle. `ln` is evaluated on identical IEEE
  * inputs in both engines (integer-derived ratios), and Java
  * `Math.log` was measured bit-identical to DuckDB/libm `ln` across
  * the input range — no rounding needed.
  */
object Retrieval {

  /** TF-IDF term weighting: the top-`k` terms per document by
    * `tf · ln(N/df)`.
    *
    * Plan shape (sized for 100 TB):
    *  1. explode → partial-aggregated `groupBy(id, term)` — the only
    *     corpus-sized shuffle moves one (id, term, count) row per
    *     distinct term per doc, never raw tokens;
    *  2. document frequency as `count over (partition by term)` — a
    *     window on the EXISTING aggregate output, not a join: no
    *     second scan, no vocabulary-sized build side to broadcast
    *     (at corpus scale the vocabulary is NOT broadcastable; hot
    *     terms skew the term partitioning and are AQE-split);
    *  3. corpus size N is a one-row aggregate cross-broadcast in;
    *  4. per-doc top-k via ranked window (tie-break: term asc).
    *
    * No float summation anywhere: `tf`, `df`, `N` are exact longs and
    * the score is one mul + one div + one ln on integer-derived
    * doubles — bit-stable regardless of partitioning. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol),
        explode(TextFns.tokens(TextFns.normalize(col(textCol)))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy("term")))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = withDf
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          graft.plans.GraftExtensions.ln(
            col("__n").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col(idCol)).orderBy(desc("tfidf"), asc("term"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rnk"))
  }

  /** BM25 ranked retrieval: top-`k` documents for a bounded query-term
    * set, scored with Okapi BM25 (the `+1` idf variant, so every
    * matching term contributes positively).
    *
    * Plan shape (sized for 100 TB):
    *  - the query-term filter runs BEFORE the first shuffle (explode →
    *    codegen'd `isin` WHERE, no interpreted HOF): only (doc, term)
    *    hits for the bounded term set ever leave the map stage;
    *  - per-term document frequencies are a second aggregate over that
    *    same tiny stream — its exchange is shared with the scoring
    *    branch via ReusedExchange — and broadcast back (≤ |Q| rows);
    *  - document length needs no explode: `size(tokens)` is a map-only
    *    projection of the corpus, joined to the hits on id; corpus
    *    scalars (N, total token count) are one broadcast row computed
    *    from exact longs, so `avgdl = tl/n` is a single deterministic
    *    double division;
    *  - the per-document sum over matched terms accumulates in
    *    DECIMAL(27,12): double addition is order-dependent in the last
    *    ulps, DECIMAL addition is not — the score is identical under
    *    any partitioning (and to the oracle);
    *  - final top-k is TakeOrderedAndProject (score desc, id asc), not
    *    a global sort.
    *
    * The expression tree mirrors the oracle SQL operation-for-operation
    * (same association order), keeping every double op bit-identical
    * across engines. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      dfSource: Option[DataFrame] = None): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = TextFns.tokens(TextFns.normalize(col(textCol)))
    // the explicit isNotNull matches the predicate the dls inner join
    // infers onto the scoring branch — without it the two consumers of
    // this stream see different pushed scan filters and the shared
    // (id, term) exchange cannot canonicalize to one subtree
    val hits = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol), explode(toks).as("term"))
      .where(col("term").isin(queryTerms.map(lit): _*))
    val qtf = hits.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // `tf >= 1` is a tautology (tf counts >= 1 row per group), but
    // Catalyst cannot prove it, so the predicate keeps `tf` REQUIRED
    // in this branch — without it column pruning rewrites this copy of
    // the (id, term) aggregate into a bare DISTINCT (`count(tf)` is no
    // help: the optimizer normalizes count-of-non-nullable back to
    // count(1) first). With both consumers structurally identical, the
    // (id, term) exchange is planned ONCE and this branch picks it up
    // as a ReusedExchange: one explode of the corpus, not two.
    // df can be SERVED from the incrementally-maintained index (the
    // q105 fold — a (term, df) table): exact same numbers as the
    // inline recompute over the full corpus (spec: q105/q130), so the
    // scores are bit-identical while the explode→distinct df pass
    // disappears from the query plan. Default stays inline: the
    // ReusedExchange pairing below only exists on that path.
    val dfs = dfSource match {
      case Some(src) => src
        .where(col("term").isin(queryTerms.map(lit): _*))
        .select(col("term"), col("df").cast("long").as("df"))
      case None => qtf.where(col("tf") >= 1)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
    }
    val dls = docs.select(col(idCol),
      coalesce(size(toks), lit(0)).cast("long").as("dl"))
    val stats = dls.agg(count(lit(1)).as("__n"), sum(col("dl")).as("__tl"))
    val avgdl = col("__tl").cast("double") / col("__n").cast("double")
    val idf = graft.plans.GraftExtensions.ln(
      (col("__n").cast("double") - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5) + 1.0)
    val tfD = col("tf").cast("double")
    val denom = tfD + (lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val contrib = (idf * (tfD * lit(k1 + 1.0))) / denom
    qtf
      .join(broadcast(dfs), "term")
      .join(dls, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("dl"), contrib.as("__c"))
      .groupBy(col(idCol), col("dl"))
      .agg(
        sum(col("__c").cast(DecimalType(27, 12))).cast("double").as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion of N ranked candidate lists (hybrid
    * retrieval: lexical BM25 + semantic ANN is the canonical pair):
    * `rrf(id) = Σ_list 1 / (c + rank_list(id))`, absent-from-list
    * terms contributing 0.
    *
    * Scale shape: the inputs are top-k lists — already tiny by
    * construction (each retriever bounded its own output) — so the
    * full-outer joins and the final TakeOrderedAndProject touch O(k·N)
    * rows regardless of corpus size; all the heavy lifting happened
    * inside the retrievers.
    *
    * Float parity: each term is one division by an integer-derived
    * double and the terms are added in FIXED list order (an expression
    * chain, not a sum aggregate), so the fused score is bit-identical
    * across engines and partitionings. Ties (e.g. two ids with the
    * same single-list rank) break by id.
    *
    * @param lists (tag, df) where df has `idCol` and `rankCol`
    *   (1-based); output carries `rank_<tag>` per list. */
  def rrfFuse(
      lists: Seq[(String, DataFrame)], idCol: String, rankCol: String,
      k: Int, c: Int = 60): DataFrame = {
    require(lists.size >= 2, "rrfFuse needs at least two lists")
    require(lists.map(_._1).distinct.size == lists.size, "duplicate list tags")
    val renamed = lists.map { case (tag, df) =>
      df.select(col(idCol), col(rankCol).as(s"rank_$tag"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = lists.map { case (tag, _) =>
      coalesce(
        lit(1.0) / (lit(c.toDouble) + col(s"rank_$tag").cast("double")),
        lit(0.0))
    }.reduce(_ + _)
    joined
      .withColumn("rrf", score)
      .orderBy(desc("rrf"), col(idCol))
      .limit(k)
  }
}
