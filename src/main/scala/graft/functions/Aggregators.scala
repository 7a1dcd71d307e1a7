package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregation surface (`Aggregator[IN, BUF, OUT]`) — the
  * Spark rendering of the reference's user-defined reduce
  * (reference `src/mapreduce.h:11-14`: the whole point of its API is a
  * caller-supplied `Reducer` folding a key's value stream; SURVEY.md
  * §2.5 UDF/UDAF row).
  *
  * An `Aggregator` is the scale-correct shape for custom aggregation:
  * Catalyst plans it as partial (map-side) aggregation + merge, so the
  * shuffle moves one buffer per group per partition — never the group's
  * rows — exactly like built-in aggregates. Contrast with collecting a
  * group and folding on one node, which the reference does in RAM
  * (`mapreduce.c:78-86`) and which dies at 100 TB.
  */
object Aggregators {

  /** Intermediate buffer: weighted sum + total weight. */
  case class WAvgBuf(wsum: Double, w: Double)

  /** Weighted average of `value` by `weight` — e.g. an order-size-
    * weighted price. NaN on empty/zero-weight groups.
    */
  object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
    override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf =
      WAvgBuf(b.wsum + in._1 * in._2, b.w + in._2)
    override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.wsum + b.wsum, a.w + b.w)
    override def finish(b: WAvgBuf): Double =
      if (b.w == 0.0) Double.NaN else b.wsum / b.w
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  private implicit val inEnc: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  /** Column form: `wavg(value, weight)`. */
  val wavg = udaf(WeightedAvg)
}
