package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over ARRAY<FLOAT>/ARRAY<DOUBLE>.
  *
  * Built from `zip_with`/`aggregate` higher-order functions so the dot
  * product is evaluated inside Catalyst (no UDF serialization). All
  * arithmetic is promoted to double before accumulation so Spark and
  * the DuckDB oracle see identical IEEE sequences.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ with left-to-right double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) = a·b / (‖a‖‖b‖); NULL-safe on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
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
