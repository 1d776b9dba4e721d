package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableMath.gridSnap

/** Deterministic cardinality sketching — the approximate counterpart
  * to the exact distinct counts of `AnalyticsQueries` (reference shape:
  * `dl/src/analytics/queries.py` COUNT(DISTINCT …) dashboards), for
  * the regime where the exact form's shuffle is the bottleneck.
  */
object Sketches {

  /** Engine-portable uniform in (0, 1] from the md5 of a value's
    * string form — 52 hash bits, the [[graft.operators.Sampling]]
    * determinism discipline. ONE home for the derivation shared by
    * the batch sketch and both streaming KMV monitors: the DuckDB
    * oracles replay this expression literally, so a change here must
    * change every KMV oracle in lockstep — keeping three Scala copies
    * in sync was the riskier shape.
    */
  def md5Uniform(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (conv(substring(md5(value.cast("string")), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(4503599627370497.0)

  /** KMV verdict over an ASCENDING k-min array: the exact distinct
    * count below the `k` bound (the sketch saw every hash), the
    * (k−1)/u₍ₖ₎ estimate (6 dp) at it.
    */
  def kmvEstimate(kmvArray: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    when(size(kmvArray) < k, size(kmvArray).cast("double"))
      .otherwise(gridSnap(lit(k - 1.0) / element_at(kmvArray, k), 6))

  /** Approximate per-group distinct count via a k-minimum-values
    * sketch over the portable md5 uniform (same derivation as
    * [[graft.operators.Sampling]]'s splits): u = (h₅₂ + 1) / (2⁵² + 1)
    * in (0, 1], estimate (k−1)/u₍ₖ₎ from the k-th smallest distinct
    * hash. Groups with fewer than k distinct values return their
    * EXACT count (the sketch saw every distinct hash), so small
    * groups lose nothing.
    *
    * Versus `COUNT(DISTINCT x)`: the exact form shuffles every
    * distinct value to its group's reducer — at 100 TB a hot group
    * moves billions of rows to count them. The KMV exchange is
    * O(groups·k) REGARDLESS of cardinality (k-bounded partials, see
    * [[graft.functions.KmvAggregator]]), with relative error
    * ~1/√k (k = 256 → ~6%). Versus `approx_count_distinct` (HLL++):
    * same bounded-state scaling, but the KMV estimate is
    * engine-portable and layout-invariant — it hash-matches a DuckDB
    * replay bit-for-bit, so the oracle can check it exactly.
    *
    * Null values are excluded (matching COUNT(DISTINCT) semantics);
    * hash collisions merge identically in every engine by
    * construction. Returns (keyCol, est_distinct) — double, exact
    * integral value when the group is below the sketch bound, 6 dp
    * estimate above it.
    */
  def approxDistinctKmv(df: DataFrame, keyCol: String, valueCol: String,
                        k: Int = 256): DataFrame = {
    require(k >= 2, s"sketch size must be at least 2, got $k")
    df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(graft.functions.KmvAggregator.kmv(k, md5Uniform(col(valueCol)))
        .as("_kmv"))
      .withColumn("est_distinct", kmvEstimate(col("_kmv"), k))
      .select(col(keyCol), col("est_distinct"))
  }
}
