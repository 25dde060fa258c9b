package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A7 as a typed UDAF: expectile (asymmetric L2) loss
  * `mean(|τ − 1[u<0]| · u²)` (reference asymmetric_l2_loss, fawac.py:99-100)
  * exposed as an `Aggregator[Double, _, Double]` for `Dataset.select(...)` /
  * `agg(expectileLoss.toColumn)` call sites.
  *
  * The expression form (AggOps.expectileLoss) is preferred in queries —
  * it stays codegen'd and oracle-expressible; this Aggregator exists for
  * the typed-API surface (§2.9) and is mergeable (sum/count buffer), so
  * Spark plans it as partial + final aggregation like any built-in. */
class ExpectileAggregator(tau: Double) extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), u: Double): (Double, Long) = {
    val w = math.abs(tau - (if (u < 0.0) 1.0 else 0.0))
    (b._1 + w * u * u, b._2 + 1)
  }
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) 0.0 else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
