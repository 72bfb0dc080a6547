package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators (`Aggregator[IN, BUF, OUT]`) — the Dataset-native
  * aggregate tier, complementing the Catalyst-native forms (codegen'd
  * SequentialDot, imperative KmvSketch): compile-time-checked input
  * types, used with `groupByKey(...).agg(x.toColumn)`.
  */
object TypedAggs {

  /** Mean absolute length churn per group of wiki events — the dashboard
    * "how much text is changing" signal with exact integer accumulation
    * (sum of |diff| and count stay in Long; one final division). */
  object LengthChurn
      extends Aggregator[graft.model.WikiEvent.Row, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long),
        e: graft.model.WikiEvent.Row): (Long, Long) =
      (b._1 + math.abs(e.length_diff_bytes), b._2 + 1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / r._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
