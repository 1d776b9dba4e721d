package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group-wise outlier detection — the batch form of the reference's
  * threshold alerting (`pipeline_monitor.py:66-73` compares metrics to
  * FIXED thresholds; this derives the threshold from each group's own
  * distribution).
  *
  * Numeric discipline for engine-portable exactness: group mean and
  * variance come from DECIMAL-exact Σx and Σx² (order-independent —
  * a running-variance implementation like `stddev_samp` is
  * partition-order-sensitive in the low bits and differs between
  * engines), converted to double only at the end; the outlier test is
  * (x − mean)² > σ²·k² — square both sides, no sqrt, no division by a
  * possibly-zero deviation.
  */
object Anomaly {

  /** Flag rows more than `sigma` sample standard deviations from their
    * group mean. Groups with fewer than 2 rows have undefined variance
    * and produce no flags. One aggregation + one broadcast-joinable
    * stats relation (|groups| rows) + a map-side flag expression.
    * Adds `is_outlier`.
    */
  def zFlag(df: DataFrame, keyCol: String, valueCol: String,
            sigma: Double = 3.0): DataFrame = {
    require(sigma > 0, s"sigma must be positive, got $sigma")
    val dec = DecimalType(38, 8)
    val stats = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("_gn"),
      sum(col(valueCol).cast(dec)).cast("double").as("_gsum"),
      sum((col(valueCol).cast(dec) * col(valueCol).cast(dec))
        .cast(DecimalType(38, 8))).cast("double").as("_gsumsq"))
    df.join(stats, keyCol)
      .withColumn("_gmean", col("_gsum") / col("_gn"))
      .withColumn("_gvar",
        (col("_gsumsq") - col("_gsum") * col("_gsum") / col("_gn"))
          / (col("_gn") - 1))
      .withColumn("is_outlier",
        col("_gn") >= 2 &&
          (col(valueCol) - col("_gmean")) * (col(valueCol) - col("_gmean"))
            > col("_gvar") * lit(sigma * sigma))
      .drop("_gn", "_gsum", "_gsumsq", "_gmean", "_gvar")
  }
}
