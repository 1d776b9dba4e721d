package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable

/** Single-pass Shannon-entropy aggregator — the one custom UDAF the
  * SURVEY identifies as justified (§2.10): computes −Σ p·log2(p) over a
  * column's value distribution in one pass instead of the two-stage
  * groupBy-then-fold.
  *
  * Buffer = value→count map; merge is map union — associative and
  * commutative, so partial aggregation works across partitions. Memory
  * is O(distinct values) per partition; for very-high-cardinality
  * columns at 100 TB prefer the two-stage
  * `Demographics.shannonEntropy` (shuffle = one row per distinct value)
  * — this aggregator is the low-cardinality fast path (one pass, no
  * second job).
  */
object EntropyAggregator extends Aggregator[String, mutable.Map[String, Long], Double] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], v: String): mutable.Map[String, Long] = {
    if (v != null) buf.update(v, buf.getOrElse(v, 0L) + 1L)
    buf
  }

  override def merge(a: mutable.Map[String, Long],
                     b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Double = {
    val total = buf.values.sum.toDouble
    if (total == 0) 0.0
    else {
      // log2(T) − Σ c·log2(c)/T : heavy math on exact integer counts
      val wlog = buf.values.foldLeft(0.0)((acc, c) => acc + c * math.log(c.toDouble))
      (math.log(total) - wlog / total) / math.log(2.0)
    }
  }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `df.agg(EntropyAggregator.entropyOf(col))`. */
  def entropyOf(c: Column): Column = udaf(this).apply(c)
}
