package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys that must be KEPT.
  *
  * This repo uses two complementary skew tools — choosing between them
  * is a semantic question, not a tuning one:
  *
  *  - Frequency CAPS ([[Dedup.minhashLsh]] / [[Dedup.ngramJaccard]] /
  *    [[Dedup.crossOverlap]] count windows) DROP hot keys. Right when
  *    the hot key carries no signal: boilerplate shingles and
  *    degenerate hash buckets generate O(f²) candidate pairs that mean
  *    nothing, so dropping them is a quality filter, not a loss.
  *  - SALTING (this object) KEEPS the hot key. Right when the key is
  *    data — a dominant user_id, a celebrity entity, a default
  *    category: rows of one key are spread across `salts` sub-keys so
  *    no single reducer owns the key, and the other join side is
  *    replicated ×salts to preserve exact join semantics.
  *
  * AQE's runtime skew split (`spark.sql.adaptive.skewJoin.enabled`,
  * on in every session builder here) attacks the same problem AFTER
  * the shuffle by splitting oversized partitions of a sort-merge join.
  * Explicit salting still earns its keep at 100 TB because it (a)
  * also balances the SHUFFLE WRITE of the hot key (AQE only splits the
  * read side), (b) works for shuffled-hash joins and aggregations AQE
  * does not split, and (c) makes the balance deterministic instead of
  * stats-triggered.
  */
object Skew {

  /** Equi-join on `keys` with the skewed (fact) side salted.
    *
    * The result multiset is EXACTLY `facts ⋈ dim`: the salt only
    * subdivides each key's fact rows, and every (key, salt) pair finds
    * the dim row because the dim side is exploded to all `salts`
    * values. Pick `salts` ≈ hot-key rows / target-task rows — small
    * (8–32): the dim side is replicated ×salts, so oversalting taxes
    * the whole join to fix one key.
    *
    * `saltSource` must be a DETERMINISTIC per-row expression (an id or
    * payload column, hashed here — NOT `rand()`): a task retry or an
    * AQE replan recomputes the salt, and a nondeterministic salt would
    * route the recomputed row to a different sub-key than the shuffle
    * files already written — lost/duplicated rows on retry is exactly
    * the monotonically_increasing_id failure mode
    * ([[graft.newsmaper.Newsmaper.findCountry]]) in join form.
    *
    * @param facts the large, skewed side (streamed through unreplicated)
    * @param dim   the side small enough to replicate ×salts but too big
    *              (or too churn-prone) to broadcast outright
    * @return `facts.join(dim, keys)` with balanced reducers */
  def saltedJoin(
      facts: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    val sf = facts.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    sf.join(sd, keys :+ "__salt").drop("__salt")
  }
}
