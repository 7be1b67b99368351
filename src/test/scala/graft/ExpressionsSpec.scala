package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.plans.GraftExtensions
import graft.sources.Tables

/** Native codegen expressions (graft.plans): IEEE-identical to the
  * interpreted HOF forms, correct NULL semantics, SQL registration. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)), // zero norm
    (3L, Array(-1.5f, 2.25f, 0.5f), Array(0.125f, -3.75f, 8.0f))
  ).toDF("id", "a", "b")

  test("native dot/cosine match the HOF forms bit-for-bit (same accumulation order)") {
    val out = vecs.select(
      VectorFns.dot(col("a"), col("b")).as("nd"),
      VectorFns.dotHof(col("a"), col("b")).as("hd"),
      VectorFns.cosine(col("a"), col("b")).as("nc"),
      VectorFns.cosineHof(col("a"), col("b")).as("hc")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
      assert(r.isNullAt(2) === r.isNullAt(3))
      if (!r.isNullAt(2)) assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("native cosine matches HOF cosine on the real embeddings table") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val mismatches = a.join(b, col("ia") < col("ib"))
      .select(
        VectorFns.cosine(col("va"), col("vb")).as("n"),
        VectorFns.cosineHof(col("va"), col("vb")).as("h"))
      .where(col("n") =!= col("h"))
      .count()
    assert(mismatches === 0L)
  }

  test("cosine is NULL on zero norms and on length mismatch") {
    val r1 = vecs.where(col("id") === 2)
      .select(VectorFns.cosine(col("a"), col("b"))).collect()
    assert(r1.head.isNullAt(0))
    val r2 = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")), VectorFns.cosine(col("a"), col("b")))
      .collect()
    assert(r2.head.isNullAt(0) && r2.head.isNullAt(1))
  }

  test("NULL array elements make dot/cosine NULL, same as the HOF twins") {
    // UnsafeArrayData would read a null slot as 0.0; the native
    // expressions must surface the corrupt embedding like dotHof does
    val df = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
    val r = df.select(
      VectorFns.dot(col("a"), col("b")),
      VectorFns.cosine(col("a"), col("b")),
      VectorFns.dotHof(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("wrong-arity SQL call raises an AnalysisException naming the function") {
    GraftExtensions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_dot(array(1.0F))").collect()
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("mixed float/double array inputs are accepted") {
    val out = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0)))
      .toDF("f", "d")
      .select(VectorFns.dot(col("f"), col("d"))).collect()
    assert(out.head.getDouble(0) === 11.0)
  }

  test("rolling hash: known values, empty string, null propagation") {
    val out = Seq(("a"), (""), ("ab"))
      .toDF("t")
      .select(GraftExtensions.rollingHash(col("t")).as("h")).collect()
    assert(out(0).getLong(0) === 97L)             // 'a'
    assert(out(1).getLong(0) === 0L)              // empty → init
    assert(out(2).getLong(0) === (97L * 31 + 98)) // (h('a')·31 + 'b')
    val n = Seq(Tuple1[String](null)).toDF("t")
      .select(GraftExtensions.rollingHash(col("t"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("SQL registration: graft_* callable from spark.sql after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       graft_rolling_hash('a') AS h""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getLong(2) === 97L)
  }

  test("graft_ln is platform libm (Math.log), with libm edge semantics") {
    import graft.plans.GraftExtensions
    val r = spark.range(1).select(
      GraftExtensions.ln(lit(3.0)).as("l3"),
      GraftExtensions.ln(lit(0.0)).as("l0"),
      GraftExtensions.ln(lit(-1.0)).as("ln1"),
      GraftExtensions.ln(lit(null).cast("double")).as("lnull")).collect().head
    // the whole point of the expression: Math.log, not StrictMath.log
    // (Spark's builtin `log` gives 1.0986122886681096 here — fdlibm)
    assert(r.getDouble(0) === java.lang.Math.log(3.0))
    assert(r.getDouble(1).isNegInfinity)
    assert(r.getDouble(2).isNaN)
    assert(r.isNullAt(3))
  }

  test("codegen and interpreted paths agree (force both via filter on computed col)") {
    // collect() on a local relation exercises interpreted eval; the
    // embeddings-table test above runs through WholeStageCodegen. Here
    // pin a scalar spot-check of both dot values.
    val viaDf = vecs.where(col("id") === 1)
      .select(VectorFns.dot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(viaDf === (1.0f.toDouble * 4.0f + 2.0f * 5.0f + 3.0f * 6.0f))
  }
}
