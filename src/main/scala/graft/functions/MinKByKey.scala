package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact bounded min-k selection as a typed Aggregator — the min-by-key
  * sibling of [[TopKByCount]]: the buffer holds at most k
  * (sortKey, payload) pairs in ascending (sortKey, payload) order, so
  * partial aggregation ships O(k) state per group per partition. This
  * is the shape that replaces a `row_number() OVER (PARTITION BY g
  * ORDER BY ...) <= k` cap when one group can be huge: the window form
  * funnels a hub group's FULL row set through one task's sort, while
  * this aggregate's map-side partial combine bounds every task's
  * per-group state at k pairs (q183 caps a 100 TB interaction graph's
  * celebrity-node adjacency this way).
  *
  * Input: (groupKey, sortKey, payload) rows — groupKey is carried by
  * the enclosing `groupByKey` and ignored here. Output: the k pairs
  * with the smallest (sortKey, payload), ascending.
  */
class MinKByKey(k: Int)
    extends Aggregator[(Long, String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def trim(b: Seq[(String, Long)]): Seq[(String, Long)] = b.sorted.take(k)

  override def zero: Seq[(String, Long)] = Seq.empty

  override def reduce(b: Seq[(String, Long)], a: (Long, String, Long)): Seq[(String, Long)] =
    trim(b :+ ((a._2, a._3)))

  override def merge(b1: Seq[(String, Long)], b2: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(b1 ++ b2)

  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = r

  override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
