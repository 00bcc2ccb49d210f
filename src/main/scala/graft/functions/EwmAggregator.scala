package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ewm(alpha, adjust=false).mean() as a custom typed Aggregator
  * (SURVEY §4 custom work #2; reference kernel pandas/_libs/window.pyx
  * :1732 ewma) — the recurrence y ← (1−α)·y + α·x is inherently
  * sequential, so the aggregator buffers (pos, value) pairs and runs the
  * recurrence over the position-sorted sequence at finish.
  *
  * Scale behavior: partial buffers merge associatively (concatenation),
  * so Spark's partial aggregation distributes the collection; memory is
  * O(group size) like collect_list — use per-key groups (the pandas
  * call shape), never a global ungrouped EWM. Registered via
  * `functions.udaf` this also works from SQL.
  */
class EwmAggregator(alpha: Double)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Double] {

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    b :+ a

  override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b1 ++ b2

  override def finish(buf: Seq[(Long, Double)]): Double = {
    if (buf.isEmpty) return Double.NaN
    val sorted = buf.sortBy(_._1)
    var y = sorted.head._2
    var i = 1
    while (i < sorted.length) {
      y = (1 - alpha) * y + alpha * sorted(i)._2
      i += 1
    }
    y
  }

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
