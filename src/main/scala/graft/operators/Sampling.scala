package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training-data
  * pipelines. Split assignment must be reproducible across runs,
  * clusters, and data layouts — so it derives from a content hash of a
  * key, never from RNG state or partition position (`rand()` changes
  * under repartitioning; a hash never does). The same property gives
  * leakage-safe splits: every row with the same key lands on the same
  * side forever, even across dataset versions.
  */
object Sampling {

  /** Stable bucket in [0, 100) from the md5 of the key. md5 (not
    * xxhash64) so the assignment is portable across engines — any
    * system that can md5 a string reproduces the split exactly (the
    * DuckDB oracle does).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Deterministic train/test split: rows whose key bucket falls below
    * `testPct` go to "test". Pure projection — no shuffle, no RNG.
    */
  def withSplit(df: DataFrame, keyCol: String, testPct: Int): DataFrame = {
    require(testPct >= 0 && testPct <= 100, s"testPct must be 0..100, got $testPct")
    df.withColumn("split",
      when(hashBucket(col(keyCol)) < testPct, "test").otherwise("train"))
  }

  /** Stratified sample: per-stratum keep fractions (class balancing /
    * downsampling the majority stratum). Seeded Bernoulli sampling per
    * row — approximate counts, exact strata.
    */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
