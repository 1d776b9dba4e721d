package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-minimum-values (KMV) sketch buffer — the distinct-count
  * sketch whose result is a PURE FUNCTION of the input's distinct hash
  * set (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002). The buffer keeps the k smallest DISTINCT
  * uniform hashes; the estimator (k−1)/u₍ₖ₎ lives in the caller.
  *
  * Why this sketch and not HyperLogLog here: Spark's
  * `approx_count_distinct` (HLL++) is a fine engine-local estimator,
  * but its result depends on the engine's private hash and bucket
  * layout — it can never hash-match another system. KMV over an
  * md5-derived uniform is ENGINE-PORTABLE: any system that can md5 a
  * string reproduces the exact same k minima and therefore the exact
  * same estimate (the [[graft.operators.Sampling]] determinism
  * discipline applied to cardinality estimation).
  *
  * Scale shape: state is O(k) doubles per group; map-side partial
  * aggregation reduces every partition to ≤k values per group BEFORE
  * the shuffle, so the exchange carries O(groups·k) rows while
  * `COUNT(DISTINCT x)` shuffles every distinct value. Buffer ops are
  * O(k) insert on a sorted Vector and a bounded sorted-merge —
  * associative, commutative, duplicate-absorbing, hence
  * layout-invariant by construction (spec'd via repartition).
  */
class KmvAggregator(k: Int)
    extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Double] = Vector.empty

  override def reduce(buf: Seq[Double], u: Double): Seq[Double] =
    if (buf.size == k && u >= buf.last) buf
    else {
      val (pre, post) = buf.span(_ < u)
      if (post.headOption.contains(u)) buf // distinct hashes only
      else ((pre :+ u) ++ post).take(k)
    }

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    val out = Vector.newBuilder[Double]
    var (i, j, n) = (0, 0, 0)
    var last = Double.NaN
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && a(i) <= b(j))
      val v = if (takeA) { i += 1; a(i - 1) } else { j += 1; b(j - 1) }
      if (!(v == last)) { out += v; last = v; n += 1 } // skip cross-side dups
    }
    out.result()
  }

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object KmvAggregator {
  /** Column form: ascending array of the group's ≤k smallest distinct
    * uniform hashes.
    */
  def kmv(k: Int, uniform: Column): Column =
    udaf(new KmvAggregator(k), ExpressionEncoder[Double]()).apply(uniform)
}
