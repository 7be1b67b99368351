package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over ARRAY<FLOAT>/ARRAY<DOUBLE>.
  *
  * [[dot]]/[[cosine]] delegate to the native codegen expressions in
  * [[graft.plans]] (tight primitive loop inside WholeStageCodegen);
  * the `zip_with`/`aggregate` higher-order forms are kept as
  * [[dotHof]]/[[cosineHof]] — same left-to-right double accumulation,
  * IEEE-identical results (pinned by ExpressionsSpec), but interpreted
  * per element. All arithmetic is promoted to double before
  * accumulation so Spark and the DuckDB oracle see identical IEEE
  * sequences.
  *
  * Why `round(cosine, 4)` is oracle-safe here while
  * [[graft.operators.TextAnalysis.quality]] forbids float rounding:
  * the danger case is rounding two DIFFERENT doubles (each engine
  * computing its own product) that straddle a boundary. Both sides of
  * the vector catalog accumulate the SAME doubles in the SAME order,
  * so the input to round() is bitwise identical, and both engines
  * round identical doubles identically (half-away-from-zero). The
  * quality metrics cannot guarantee the identical-input premise (their
  * ratios come from independently derived integer pairs), hence the
  * integer half-up rational rounding there.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ — native codegen loop. */
  def dot(a: Column, b: Column): Column = graft.plans.GraftExtensions.dot(a, b)

  /** cosine(a, b) = a·b / (‖a‖‖b‖); NULL on zero norms — fused native
    * loop (one pass for dot + both norms). */
  def cosine(a: Column, b: Column): Column = graft.plans.GraftExtensions.cosine(a, b)

  /** Σ aᵢ·bᵢ with left-to-right double accumulation (HOF form). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine via HOF composition; NULL-safe on zero norms. */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val n = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(n === 0.0, lit(null)).otherwise(d / n)
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
