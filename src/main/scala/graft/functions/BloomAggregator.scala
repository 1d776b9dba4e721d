package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.BloomFilter

/** Distributed per-group Bloom filter build — the aggregation behind
  * [[graft.lake.VersionedTable]]'s per-FILE Bloom file index (group =
  * `_metadata.file_path`), and usable for any bounded-group-count
  * membership sketch. `DataFrameStatFunctions.bloomFilter` builds ONE
  * whole-dataset filter on the driver; this builds one per group, in
  * executors, mergeable across partials — the shape a per-file index
  * needs.
  *
  * String keys only, the [[graft.operators.Joins.antiJoinBloom]]
  * discipline: the sketch hashes the native type, so build and probe
  * must agree on it exactly — forcing one type removes the silent-miss
  * class entirely. Nulls are skipped (a Bloom filter cannot represent
  * null, and every probe predicate is null-rejecting equality).
  *
  * Sizing: `BloomFilter.create(expectedItems, fpp)` allocates ~1.2
  * bytes·expectedItems·ln(1/fpp)/ln²2; 100k items at 1% ≈ 120 KB.
  * That is the per-group STATE — runs as ObjectHashAggregate with one
  * live buffer per (partition, group), serialized across the merge
  * shuffle, so size expectedItems to the real per-group row count
  * rather than defaulting high. Oversized filters only waste space;
  * undersized ones degrade fpp, never correctness (mightContain still
  * never returns a false negative).
  */
class BloomAggregator(expectedItems: Long, fpp: Double)
    extends Aggregator[String, BloomFilter, Array[Byte]] {
  require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(buf: BloomFilter, key: String): BloomFilter = {
    if (key != null) buf.putString(key)
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)

  override def finish(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAggregator {
  /** Column form: `df.groupBy(g).agg(bloomAgg(100000, 0.01, $"key"))`
    * → serialized filter probe-able via [[mightContain]].
    */
  def bloomAgg(expectedItems: Long, fpp: Double, key: Column): Column =
    udaf(new BloomAggregator(expectedItems, fpp),
      implicitly[Encoder[String]](Encoders.STRING)).apply(key)

  /** Probe a serialized filter. A null filter yields TRUE — "cannot
    * prove absent", the sound direction for pruning. Deserialization is
    * per-invocation: probe over bounded relations (a file manifest),
    * not per data row.
    */
  def mightContain(bloomBytes: Array[Byte], value: String): Boolean =
    bloomBytes == null ||
      BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))
        .mightContainString(value)

  private lazy val mightUdf =
    org.apache.spark.sql.functions.udf(
      (bytes: Array[Byte], v: String) => mightContain(bytes, v))

  /** Column form of [[mightContain]] for probing a manifest relation. */
  def mightContainUdf(bloom: Column, value: Column): Column =
    mightUdf(bloom, value)
}
