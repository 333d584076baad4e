package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed weighted-mean UDAF (SURVEY §2.11: the reference's Agg/Totals
  * dataclass accumulators, e.g. iterative_ratings.py:179-210 weighted
  * averages, as a Spark `Aggregator`). Registered via `functions.udaf`
  * so it participates in hash aggregation with partial (map-side)
  * combine — the buffer is two doubles, so at scale it behaves exactly
  * like a built-in sum pair. Zero total weight yields 0.0 (the
  * reference's zero-safe divide convention, _io_helpers.py:70-91).
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  // input (value, weight); buffer (Σ w·x, Σ w)
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
