package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One ranked entry of a per-group top-k result. */
case class TopEntry(value: Double, id: Long)

/** Bounded top-k-per-group aggregation — the scale path for "top N rows
  * per key" (reference shape: per-category leaderboards,
  * `dl/src/analytics/queries.py` top-N per group).
  *
  * The window formulation (`row_number().over(partitionBy(key)
  * .orderBy(desc(value)))` then `rn <= k`) shuffles and SORTS every row
  * of every group; at 100 TB a hot group sorts billions of rows to keep
  * three. This Aggregator keeps a k-bounded sorted buffer per group:
  * map-side partial aggregation reduces each partition to ≤k rows per
  * group BEFORE the shuffle, so the exchange carries O(groups·k) rows
  * and nothing is ever globally sorted. Ordering: value DESC, id ASC —
  * the explicit tie-break keeps results deterministic (and
  * oracle-comparable) under any partitioning.
  *
  * Buffer is a sorted immutable Seq (≤k elements, so insertion is O(k)
  * — fine for the small k this is meant for); merge is a bounded
  * sorted-merge, associative and commutative. Runs as
  * ObjectHashAggregate (typed buffer), outside whole-stage codegen —
  * the deliberate trade for the k-bounded shuffle; see PlanSpec.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[TopEntry]] {
  require(k > 0, s"k must be positive, got $k")

  // value DESC, id ASC
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size == k && !lt(v, buf.last)) buf
    else {
      val (pre, post) = buf.span(lt(_, v))
      ((pre :+ v) ++ post).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // bounded sorted-merge of two ≤k sorted runs
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && lt(a(i), b(j)))
      out += (if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) })
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[TopEntry] =
    buf.map { case (v, id) => TopEntry(v, id) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[TopEntry]] =
    ExpressionEncoder[Seq[TopEntry]]()
}

object TopKAggregator {
  /** Column form: `df.groupBy(key).agg(topK(3, $"price", $"id"))` →
    * array<struct<value,id>> in rank order (value DESC, id ASC).
    */
  def topK(k: Int, value: Column, id: Column): Column =
    udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
      .apply(value, id)
}
