package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF example (SURVEY Table B, UDF/UDAF surface):
  * exact weighted average with a decimal-cents accumulator so partial
  * aggregation is associative and the result is engine-deterministic
  * (same playbook as the DECIMAL-routed built-in sums).
  *
  * Register with `functions.udaf(WeightedAvg)` and call like any
  * aggregate; Catalyst plans partial + final steps like a built-in.
  * Inputs are (value, weight) doubles, internally scaled to 1e-2.
  */
object WeightedAvg extends Aggregator[(Double, Double), (Long, Long), Double] {
  private def cents(d: Double): Long = math.round(d * 100)

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
    (b._1 + cents(a._1) * cents(a._2), b._2 + cents(a._2))

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN
    else (r._1.toDouble / 100.0) / r._2.toDouble

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
