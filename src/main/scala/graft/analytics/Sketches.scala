package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketching — the approximate counterpart
  * to the exact distinct counts of `AnalyticsQueries` (reference shape:
  * `dl/src/analytics/queries.py` COUNT(DISTINCT …) dashboards), for
  * the regime where the exact form's shuffle is the bottleneck.
  */
object Sketches {

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
    val u = (conv(substring(md5(col(valueCol).cast("string")), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(4503599627370497.0)
    df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(graft.functions.KmvAggregator.kmv(k, u).as("_kmv"))
      .withColumn("est_distinct",
        when(size(col("_kmv")) < k, size(col("_kmv")).cast("double"))
          .otherwise(round(lit(k - 1.0) / element_at(col("_kmv"), k), 6)))
      .select(col(keyCol), col("est_distinct"))
  }
}
