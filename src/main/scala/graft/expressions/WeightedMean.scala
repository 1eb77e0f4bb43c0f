package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The typed `Aggregator[IN, BUF, OUT]` extension surface (SURVEY §2.10
  * row "custom aggregation"), complementing the untyped
  * `TypedImperativeAggregate` ([[TopKByScore]]): a weighted mean whose
  * buffer carries EXACT decimal sums, so the aggregate is
  * order-independent and hash-comparable against an external engine —
  * the repo's decimal-routing determinism rule expressed through the
  * Dataset-typed API.
  *
  * IN = (value cents-scale decimal as BigDecimal, weight); OUT = the
  * double ratio of the exact sums (identical final IEEE division in
  * both engines).
  */
object WeightedMean {

  case class WBuf(sumVw: java.math.BigDecimal, sumW: Long)

  /** Build the aggregator for any typed input via extractors. */
  def of[I](value: I => java.math.BigDecimal, weight: I => Long): Aggregator[I, WBuf, Double] =
    new Aggregator[I, WBuf, Double] {
      override def zero: WBuf = WBuf(java.math.BigDecimal.ZERO, 0L)

      override def reduce(b: WBuf, in: I): WBuf = {
        val v = value(in)
        if (v == null) b
        else {
          val w = weight(in)
          WBuf(b.sumVw.add(v.multiply(java.math.BigDecimal.valueOf(w))), b.sumW + w)
        }
      }

      override def merge(a: WBuf, b: WBuf): WBuf =
        WBuf(a.sumVw.add(b.sumVw), a.sumW + b.sumW)

      override def finish(b: WBuf): Double =
        if (b.sumW == 0L) 0.0 else b.sumVw.doubleValue() / b.sumW.toDouble

      override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
