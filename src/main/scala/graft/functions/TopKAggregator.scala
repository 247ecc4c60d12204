package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY.md §2.12's Aggregator[IN,BUF,OUT]
  * slot): keeps the k highest-scoring (score, id) pairs per group in a
  * size-bounded buffer, merged associatively.
  *
  * This is the per-group top-k primitive that avoids materializing and
  * sorting every candidate row: each partition reduces to ≤k pairs before
  * the shuffle (partial aggregation), so the exchange carries k rows per
  * group per partition instead of the full candidate set — the same reason
  * TakeOrderedAndProject beats global sort, applied per group. Used as the
  * scalable alternative to window+row_number for k ≪ group size.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
