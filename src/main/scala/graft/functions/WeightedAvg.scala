package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (`Aggregator[IN, BUF, OUT]`): weighted average.
  *
  * The reference has no UDAFs (SURVEY.md §2.6 "absent"); this is the
  * planned extension demonstrating the typed aggregation surface. The
  * buffer is a pair of partial sums, so partial aggregation and
  * map-side combine work exactly like a built-in agg — merge is
  * associative+commutative, the property that makes it shuffle-safe at
  * any scale. Exposed to DataFrames via `functions.udaf(WeightedAvg)`.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {

  /** IN = (value, weight); BUF = (Σ value·weight, Σ weight). */
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
