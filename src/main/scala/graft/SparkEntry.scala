package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Events, Lakehouse, NewsmaperE2E, Q, Relational, Text, Vectors}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog lives in [[graft.queries]]: each entry is a named
  * DataFrame program with (where SQL-expressible) a DuckDB oracle twin.
  * Operators themselves live in [[graft.operators]] /
  * [[graft.functions]]; the reference-faithful pipeline in
  * [[graft.newsmaper]].
  */
object SparkEntry {

  val catalog: Seq[Q] = {
    val all = Relational.all ++ Events.all ++ Text.all ++ Vectors.all ++
      NewsmaperE2E.all ++ Lakehouse.all
    // .toMap below keeps the LAST entry per name — a name collision
    // across the four catalog files would silently drop a query from
    // both verification and bench; fail loudly instead
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names in catalog: ${dups.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Keyword majority-vote classification — the reference's semantic
    * heart (/root/reference/dags/Transform.py:14-33). */
  def entry(spark: SparkSession): DataFrame =
    queries("q30_classify")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate sketches, mapPartitions codecs) → rows-only check. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
