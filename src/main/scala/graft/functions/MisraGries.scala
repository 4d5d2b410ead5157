package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter sketch as a typed Aggregator: at most k
  * counters per group, O(k) partial state shipped per partition — the
  * one-pass candidate generator for exact two-pass heavy hitters at
  * scale (pass 1: this sketch; pass 2: exact recount of the candidate
  * set only).
  *
  * Guarantee (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): every item with true frequency > n/(k+1)
  * survives in the summary, where n is the group's total count. The
  * merge sums counters and, if more than k remain, subtracts the
  * (k+1)-th largest count from all and drops the non-positive — the
  * standard mergeable form that preserves the error bound, so partial
  * aggregation across partitions is safe.
  *
  * Counts in the summary are LOWER bounds (undercounted by at most
  * n/(k+1)); callers needing exact counts re-score candidates with a
  * second pass (see TextOps q103).
  *
  * Input: (groupKey, item). Output: surviving candidate items.
  */
class MisraGries(k: Int)
    extends Aggregator[(String, String), Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: (String, String)): Map[String, Long] = {
    val item = a._2
    b.get(item) match {
      case Some(c)            => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      // decrement-all step: every counter pays 1; zeros evicted
      case None               => b.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }
  }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (i, c)) => acc.updated(i, acc.getOrElse(i, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, drop the non-positive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
