package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, composed from
  * Spark's higher-order array functions (zip_with/aggregate/transform) —
  * codegen'd, no UDFs, no driver-side math.
  *
  * All arithmetic is promoted to double BEFORE accumulating: float
  * accumulation would diverge from the DuckDB oracle (which computes list
  * lambdas in double) and loses precision at high dimensions anyway.
  * Accumulation is a sequential left fold in both engines, so results are
  * bit-comparable after rounding.
  */
object VectorFunctions {

  /** array<float> → array<double>. */
  def toDoubleVec(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity with zero-vector guard (0.0, not NaN/div-zero —
    * keeps ANSI mode happy and sorts deterministically). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }
}
