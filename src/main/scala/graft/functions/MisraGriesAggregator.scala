package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries bounded-counter frequency sketch — the candidate stage
  * of the scale path for "top-N most frequent keys" when the key space
  * is too large to aggregate exactly (open-vocabulary tokens, URLs,
  * user ids at 100 TB).
  *
  * The exact formulation (`groupBy(key).count` + TakeOrdered, the
  * `q_a4_topk` shape) is right when the distinct-key count is bounded:
  * its hash map holds every key, and the exchange carries every group.
  * At billions of distinct keys that map spills and the shuffle carries
  * the full key space to find ten rows. This Aggregator caps state at
  * `k` counters per partial: map-side partial aggregation reduces each
  * partition to ≤k (key, lower-bound-count) pairs BEFORE the shuffle,
  * so the exchange carries O(partitions·k) rows no matter the
  * cardinality.
  *
  * Guarantee (classic MG): any key whose true frequency exceeds
  * `total/(k+1)` is present in the merged sketch, and each stored
  * count undercounts by at most `total/(k+1)`. The merge (pairwise
  * count sum, then subtract the (k+1)-th largest and keep positives)
  * is the standard mergeable-summaries form preserving that bound, and
  * is associative and commutative — safe under any partitioning. The
  * sketch's candidate SET can vary with data layout once decrements
  * occur (the bound is what's invariant), so callers needing exact,
  * layout-independent answers must re-count candidates exactly —
  * [[graft.analytics.HeavyHitters]] does exactly that, making the
  * composed operator deterministic whenever the true top-N clear the
  * `total/(k+1)` threshold (trivially including distinct ≤ k).
  *
  * Cost: a counter hit is O(1); a miss with a full sketch pays the
  * O(k) decrement-all, but each such pass cancels k prior increments,
  * so it runs at most total/k times — amortized O(1) per row. Runs as
  * ObjectHashAggregate (typed buffer) outside whole-stage codegen, the
  * same deliberate trade as [[TopKAggregator]].
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"counter budget must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c)              => buf.updated(key, c + 1)
      case None if buf.size < k => buf.updated(key, 1L)
      case None =>
        buf.flatMap { case (ky, c) =>
          if (c > 1) Some(ky -> (c - 1)) else None
        }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (ky, c)) =>
      m.updated(ky, m.getOrElse(ky, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val d = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (ky, c) => if (c > d) Some(ky -> (c - d)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGriesAggregator {
  /** Column form: `df.agg(mgSketch(64, $"key"))` → map<key, lower-bound
    * count> with at most k entries.
    */
  def mgSketch(k: Int, key: Column): Column =
    udaf(new MisraGriesAggregator(k), ExpressionEncoder[String]()).apply(key)
}
