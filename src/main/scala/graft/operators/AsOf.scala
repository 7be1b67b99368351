package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — a time-series operator the
  * reference lacks but SURVEY.md §2.4 flags as the natural extension
  * for the `events` table.
  *
  * Implemented with the union-merge trick rather than an inequality
  * join: tag both sides, union on (key, ts), and carry the right side's
  * payload forward with `last(..., ignoreNulls=true)` over a
  * (key, ts)-ordered window. One shuffle on the key, O(n log n) local
  * sort — versus the O(n·m) range join a naive `ts >= rts` theta-join
  * would plan. At 100 TB both sides shuffle once on the key and never
  * materialize a pair blowup.
  */
object AsOf {

  /** For each left row, attach `rightValCols` of the right row with the
    * greatest `rightTs <= leftTs` within the same key group.
    *
    * @return left columns + rightValCols (NULL when no prior right row)
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightValCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // left sorts after right at equal ts
      .withColumn("__rv", lit(null).cast(
        right.select(rightValCols.map(col): _*).schema
          .fields.map(f => s"`${f.name}` ${f.dataType.sql}")
          .mkString("struct<", ",", ">")))
    val r = right
      .select(
        col(rightKey).as("__k"),
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(rightValCols.map(col): _*).as("__rv"))
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(l.columns.map(col): _*)
    // __rv as the final sort key: right rows DUPLICATED on (key, ts)
    // would otherwise resolve by physical row order (nondeterministic
    // across runs/partitionings) — with it, ties deterministically
    // attach the LARGEST value struct (lexicographic by rightValCols
    // order). Left rows all carry NULL __rv, so their relative order
    // within a tie group is irrelevant (each sees the same last
    // non-null __rv at or before it).
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rAligned)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(col) ++ rightValCols.map(c => col(s"__match.`$c`").as(c)): _*)
  }

  /** Temporal (point-in-time) join: attach to each fact the SCD2
    * history version VALID AT the fact's time — `valid_from <= t <
    * valid_to`, open intervals unbounded. The warehouse question "what
    * did this dimension row look like when the fact happened", against
    * [[graft.operators.Cdc.history]] output.
    *
    * SCD2 intervals are disjoint per key, so the containing interval
    * is exactly the one with the greatest `valid_from <= t` — which is
    * [[join]]'s union-merge as-of attach (one key shuffle, no pair
    * blowup, vs the O(n·m) range theta-join a direct BETWEEN would
    * plan). A fact landing in a DELETE gap (its latest version closed
    * before t) gets NULLs, same as a fact before the key's first
    * version: the attached interval is checked for liveness, not
    * assumed.
    *
    * @param histValCols history payload columns to attach (must not
    *        collide with fact column names)
    * @return fact columns + histValCols + validFrom (all NULL when no
    *         version is valid at the fact's time) */
  def temporalJoin(
      facts: DataFrame, history: DataFrame,
      factKey: String, histKey: String, factTime: String,
      histValCols: Seq[String],
      validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame = {
    require(histValCols.nonEmpty, "histValCols must be non-empty")
    require(!histValCols.contains(validFrom) && !histValCols.contains(validTo),
      s"histValCols must not repeat the interval columns ($validFrom/$validTo) — " +
        "they are attached automatically")
    require(!facts.columns.contains(validFrom) && !facts.columns.contains(validTo),
      s"fact columns collide with the attached interval columns ($validFrom/$validTo)")
    Seq(validFrom, validTo).foreach(c => require(history.columns.contains(c),
      s"history side is missing interval column '$c' — pass Cdc.history output"))
    val attached = join(facts, history, factKey, histKey, factTime, validFrom,
      histValCols ++ Seq(validFrom, validTo))
    val live = col(validFrom).isNotNull &&
      (col(validTo).isNull || col(factTime) < col(validTo))
    (histValCols :+ validFrom)
      .foldLeft(attached)((df, c) => df.withColumn(c, when(live, col(c))))
      .drop(validTo)
  }
}
