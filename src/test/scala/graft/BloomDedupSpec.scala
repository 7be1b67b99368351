package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Bloom-prefiltered exact dedup-vs-base ([[Dedup.keyBloom]] /
  * [[Dedup.newRowsBloomed]]): the sketch must be invisible in the
  * answer (identical to the plain anti-join on every input), and the
  * plan must keep both big tables out of key shuffles.
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = (0L until 500L).map(i => (i, s"key-${i % 300}"))
    .toDF("id", "k")
  private lazy val batch = (1000L until 1400L).map(i => (i, s"key-${i % 450}"))
    .toDF("id", "k")

  test("newRowsBloomed equals the plain anti-join (sketch invisible)") {
    val bloom = Dedup.keyBloom(base, "k", expectedItems = 1L << 12)
    val viaBloom = Dedup.newRowsBloomed(batch, base, "k", bloom)
    val viaAnti = Dedup.newRows(batch, base, Seq("k"))
    assert(rows(viaBloom) === rows(viaAnti))
    assert(viaBloom.count() > 0) // non-degenerate: some rows survive
    assert(viaBloom.count() < batch.count()) // ...and some are dropped
  }

  test("sketch invisibility holds at fpp so high every row is a candidate") {
    // 16 bits for 500 keys: the prefilter passes nearly everything, so
    // correctness must come entirely from the exact confirm stages.
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Shim
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Shim.expression(col("k")))),
      Literal(500L), Literal(16L), 0, 0).toAggregateExpression()
    val tinyBloom = base.select(Shim.column(agg).as("bf")).head.getAs[Array[Byte]]("bf")
    val viaBloom = Dedup.newRowsBloomed(batch, base, "k", tinyBloom)
    assert(rows(viaBloom) === rows(Dedup.newRows(batch, base, Seq("k"))))
  }

  test("NULL-key batch rows always survive, as in the plain anti-join") {
    val withNulls = batch.union(
      Seq((9001L, null.asInstanceOf[String]), (9002L, null.asInstanceOf[String]))
        .toDF("id", "k"))
    val bloom = Dedup.keyBloom(base, "k", expectedItems = 1L << 12)
    val out = Dedup.newRowsBloomed(withNulls, base, "k", bloom)
    assert(rows(out.where(col("id") >= 9000L).select("id")) ===
      Set(Seq(9001L), Seq(9002L)))
    assert(rows(out) === rows(Dedup.newRows(withNulls, base, Seq("k"))))
  }

  test("empty base yields a null bloom and the whole batch survives") {
    val bloom = Dedup.keyBloom(base.where(lit(false)), "k")
    assert(bloom === null)
    val out = Dedup.newRowsBloomed(batch, base.where(lit(false)), "k", bloom)
    assert(rows(out) === rows(batch))
  }

  test("plan: no key shuffle of either table — broadcast joins only") {
    // Parquet-backed inputs: over a LocalRelation, Catalyst's
    // ConvertToLocalRelation evaluates the bloom probe eagerly on the
    // driver and folds it into the LocalTableScan, so the expression
    // (and the scan shape we're gating) would be invisible.
    val dir = java.nio.file.Files.createTempDirectory("bloomplan").toString
    base.write.parquet(s"$dir/base")
    batch.write.parquet(s"$dir/batch")
    val baseP = spark.read.parquet(s"$dir/base")
    val batchP = spark.read.parquet(s"$dir/batch")
    val bloom = Dedup.keyBloom(baseP, "k", expectedItems = 1L << 12)
    val out = Dedup.newRowsBloomed(batchP, baseP, "k", bloom)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("might_contain"), plan.take(4000))
  }

  test("bloom prefilter admits every true-overlap key (no false negatives)") {
    val bloom = Dedup.keyBloom(base, "k", expectedItems = 1L << 12)
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    import org.apache.spark.sql.graft.Shim
    val might = Shim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Shim.expression(col("k"))))))
    val overlap = batch.join(base.select("k").distinct(), Seq("k"), "left_semi")
    assert(overlap.where(!might).count() === 0)
  }
}
