package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),   // identical
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),   // orthogonal
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),   // general
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))    // zero norm
  ).toDF("a", "b")

  test("dot product, norms, cosine, l2sq match hand-computed values") {
    val out = df.select(
      VectorFns.dot(col("a"), col("b")).as("dot"),
      VectorFns.cosine(col("a"), col("b")).as("cos"),
      VectorFns.l2Sq(col("a"), col("b")).as("l2")).collect()
    assert(out(0).getDouble(0) === 1.0)
    assert(out(0).getDouble(1) === 1.0)
    assert(out(0).getDouble(2) === 0.0)
    assert(out(1).getDouble(1) === 0.0)
    assert(out(2).getDouble(0) === 32.0)
    assert(math.abs(out(2).getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(out(2).getDouble(2) === 27.0)
  }

  test("cosine is NULL-safe on zero-norm vectors") {
    val out = df.select(VectorFns.cosine(col("a"), col("b")).as("cos")).collect()
    assert(out(3).isNullAt(0))
  }
}
