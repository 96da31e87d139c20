package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator.
  *
  * The window spelling (`row_number().over(partitionBy(key).orderBy(
  * score)) <= k`) sorts every group's FULL row set after shuffling all
  * of it. This Aggregator keeps a size-k buffer instead, and because
  * Aggregators run as hash aggregates with map-side partial merge, the
  * shuffle carries at most k rows per (key, map-partition) — at 100 TB
  * the difference between shuffling the table and shuffling k·P rows.
  * Semantics: highest score wins, ties broken by lowest id (matching
  * `ORDER BY score DESC, id` + row_number ≤ k).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) trim(buf :+ in)
    else {
      // buf is sorted; compare against the current cutoff before paying
      // a sort — the common case at scale is "not in the top k"
      val (cs, ci) = buf.last
      val better = in._1 > cs || (in._1 == cs && in._2 < ci)
      if (better) trim(buf :+ in) else buf
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
