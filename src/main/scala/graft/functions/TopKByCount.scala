package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded top-k heavy hitters as a typed Aggregator: the buffer
  * holds at most k (item, count) pairs ordered by (count desc, item), so
  * partial aggregation ships O(k) state per group per partition instead
  * of the full item distribution — the memory shape you need when a
  * group's item domain is huge but only the head matters.
  *
  * Exact because inputs are pre-aggregated (item, count) rows (the
  * group-by upstream does the counting); this aggregator only performs
  * the bounded merge, which is associative and commutative.
  *
  * Input: (groupKey, item, count). Output: top-k (item, count), sorted.
  */
class TopKByCount(k: Int)
    extends Aggregator[(String, String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def trim(b: Seq[(String, Long)]): Seq[(String, Long)] =
    b.sortBy { case (item, n) => (-n, item) }.take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(b: Seq[(String, Long)], a: (String, String, Long)): Seq[(String, Long)] =
    trim(b :+ ((a._2, a._3)))

  override def merge(b1: Seq[(String, Long)], b2: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(b1 ++ b2)

  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = r

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
