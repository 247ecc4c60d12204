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

  // SQL `ORDER BY value DESC, id` semantics exactly (the q163 oracle):
  // NaN ranks LARGEST (Double.compare), and -0.0 normalizes to 0.0 so
  // zero-valued rows tie and fall through to the id tie-break — the
  // earlier sortBy(-s) negated NaN/-0.0 and ordered both opposite to SQL
  private def norm(s: Double): Double = if (s == 0.0) 0.0 else s
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(norm(b._1), norm(a._1)) // DESC
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
