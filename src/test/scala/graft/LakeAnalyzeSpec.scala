package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** ANALYZE TABLE for lake tables: one aggregate job records row count
  * + per-column NDV/min/max/nulls as durable `graft.stats.*` manifest
  * properties AND as session-catalog CatalogStatistics — the numbers
  * Spark's CBO consumes. The payoff assertion: a 3-table lake join
  * REORDERS once stats exist (stats-blind CBO keeps the written
  * order). */
class LakeAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("t").toString

  test("ANALYZE records manifest properties and catalog stats; NOSCAN skips the row count") {
    val root = tmpTable("graft-analyze-props")
    Lake.commitOverwrite(
      (1L to 100L).map(k => (k, s"t$k", k % 7)).toDF("k", "t", "g"), root,
      retain = 8)
    spark.sql("DROP TABLE IF EXISTS an_props")
    spark.sql(s"CREATE TABLE an_props USING `graft-lake` OPTIONS (root '$root')")
    spark.sql("ANALYZE TABLE an_props COMPUTE STATISTICS")
    val props = Lake.tableProperties(spark, root)
    assert(props("graft.stats.rowCount") === "100")
    assert(props("graft.stats.sizeBytes").toLong > 0L)
    // staleness is visible: the stats name the snapshot they describe
    assert(props("graft.stats.version") === "0")
    spark.sql("ANALYZE TABLE an_props COMPUTE STATISTICS FOR COLUMNS k, g")
    val props2 = Lake.tableProperties(spark, root)
    assert(props2("graft.stats.col.k").contains("ndv:"))
    assert(props2("graft.stats.col.k").contains("min:1"))
    assert(props2("graft.stats.col.k").contains("max:100"))
    assert(props2("graft.stats.col.g").contains("nulls:0"))
    // catalog stats landed (rowCount + column stats)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("an_props"))
    assert(meta.stats.exists(_.rowCount.contains(BigInt(100))))
    assert(meta.stats.exists(_.colStats.get("k")
      .exists(_.distinctCount.exists(_.toLong >= 90L))))
    // FOR ALL COLUMNS covers every atomic column
    spark.sql("ANALYZE TABLE an_props COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(Lake.tableProperties(spark, root).contains("graft.stats.col.t"))
    // NOSCAN: size only, no count job (rowCount key untouched/absent
    // on a fresh table)
    val r2 = tmpTable("graft-analyze-noscan")
    Lake.commitOverwrite(Seq((1L, "a")).toDF("k", "t"), r2, retain = 8)
    spark.sql("DROP TABLE IF EXISTS an_noscan")
    spark.sql(s"CREATE TABLE an_noscan USING `graft-lake` OPTIONS (root '$r2')")
    spark.sql("ANALYZE TABLE an_noscan COMPUTE STATISTICS NOSCAN")
    val p3 = Lake.tableProperties(spark, r2)
    assert(p3.contains("graft.stats.sizeBytes") &&
      !p3.contains("graft.stats.rowCount"))
    spark.sql("DROP TABLE an_props"); spark.sql("DROP TABLE an_noscan")
  }

  test("a 3-table lake join REORDERS under CBO once stats exist") {
    // fact (big) ⋈ mid ⋈ tiny, written in the worst order: fact ⋈ mid
    // first. With rowCount + key NDV stats, CBO's join reorder puts
    // the tiny dimension first on the fact.
    val bigR = tmpTable("graft-analyze-big")
    val midR = tmpTable("graft-analyze-mid")
    val tinyR = tmpTable("graft-analyze-tiny")
    Lake.commitOverwrite(
      spark.range(0, 20000).select(col("id").as("k"),
        (col("id") % 1000).as("m"), (col("id") % 10).as("s")),
      bigR, retain = 8)
    Lake.commitOverwrite(
      spark.range(0, 1000).select(col("id").as("m"),
        concat(lit("m"), col("id")).as("mt")),
      midR, retain = 8)
    // tiny covers only 3 of the fact's 10 s-values: the tiny join
    // FILTERS (6k of 20k rows survive) while the mid join preserves —
    // exactly the asymmetry a cost model needs stats to see
    Lake.commitOverwrite(
      spark.range(0, 3).select(col("id").as("s"),
        concat(lit("s"), col("id")).as("st")),
      tinyR, retain = 8)
    Seq("an_big" -> bigR, "an_mid" -> midR, "an_tiny" -> tinyR).foreach {
      case (n, r) =>
        spark.sql(s"DROP TABLE IF EXISTS $n")
        spark.sql(s"CREATE TABLE $n USING `graft-lake` OPTIONS (root '$r')")
    }
    val q = """SELECT count(*) AS n
              |FROM an_big b
              |JOIN an_mid m ON b.m = m.m
              |JOIN an_tiny t ON b.s = t.s""".stripMargin
    def joinOrder(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
        Seq[String] = plan.collectLeaves().map(_.toString)
      .map(s => Seq("an_big", "an_mid", "an_tiny", "graft-analyze-big",
        "graft-analyze-mid", "graft-analyze-tiny")
        .find(s.contains).getOrElse("?"))
    val confs = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = confs.map(c => c -> spark.conf.getOption(c))
    try {
      confs.foreach(spark.conf.set(_, "true"))
      // broadcast off so the ORDER is what the cost model decides,
      // not hidden by broadcast-hash placement
      val blind = joinOrder(spark.sql(q).queryExecution.optimizedPlan)
      Seq("an_big", "an_mid", "an_tiny").foreach(t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
      val informed = joinOrder(spark.sql(q).queryExecution.optimizedPlan)
      // stats-blind keeps the written order (big, mid, tiny);
      // stats-informed reorders the tiny dim ahead of mid
      assert(blind.indexWhere(_.contains("tiny")) === 2,
        s"expected written order without stats, got $blind")
      assert(informed.indexWhere(_.contains("tiny")) <
        informed.indexWhere(_.contains("mid")),
        s"expected the tiny dim to join before mid once stats exist, " +
          s"got $informed (blind was $blind)")
      // and the result is unchanged by the reorder
      assert(spark.sql(q).collect().head.getLong(0) === 6000L)
    } finally {
      saved.foreach { case (c, v) =>
        v match { case Some(x) => spark.conf.set(c, x)
                  case None => spark.conf.unset(c) } }
      Seq("an_big", "an_mid", "an_tiny").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
