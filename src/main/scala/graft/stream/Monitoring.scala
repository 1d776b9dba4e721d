package graft.stream

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The monitoring module's query surface (`dl/src/monitoring/
  * pipeline_monitor.py`): trailing-window health and quality-trend
  * aggregates. The reference runs these as scheduled SQL against the
  * warehouse; here they are plan functions usable in batch (scheduled
  * job) or under a streaming trigger — same expressions either way.
  */
object Monitoring {

  /** Processing-time stats over the trailing window (A15,
    * `pipeline_monitor.py:158-204`): row counts, failure counts and
    * rate, mean processing latency in seconds (epoch diff of two
    * timestamp columns).
    */
  def processingStats(df: DataFrame, createdCol: String, processedCol: String,
                      statusCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_events"),
      sum(when(col(statusCol) === "failed", 1L).otherwise(0L)).as("n_failed"),
      round(avg(when(col(statusCol) === "failed", 1.0).otherwise(0.0)), 6)
        .as("failure_rate"),
      round(avg(unix_timestamp(col(processedCol)) - unix_timestamp(col(createdCol))), 6)
        .as("avg_latency_s"))

  /** Zero-extra-pass pipeline metrics via Spark's native `observe`
    * (the Prometheus-counter role of `pipeline_monitor.py:253-310`,
    * Spark-first): the metrics accumulate ON the job's own action — no
    * second scan, no scheduled query. Attach to any frame in a
    * pipeline; after the action, `observation.get` holds rows-seen,
    * anomaly count, and value mass. Works on streaming queries too
    * (metrics surface per micro-batch in the progress events).
    */
  def observed(df: DataFrame, valueCol: String,
               anomalyThreshold: Double): (DataFrame, Observation) = {
    val obs = Observation("graft_pipeline")
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(valueCol) > anomalyThreshold, 1L).otherwise(0L)).as("n_anomalies"),
      sum(col(valueCol).cast(DecimalType(18, 2))).cast("double").as("value_mass"))
    (observed, obs)
  }

  /** Quality-trend aggregates per period (A16,
    * `pipeline_monitor.py:214-251`): avg/min/max of a quality metric and
    * the count below threshold, grouped on a time bucket.
    */
  def qualityTrend(df: DataFrame, tsCol: String, metricCol: String,
                   lowThreshold: Double): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        round(avg(col(metricCol).cast(DecimalType(18, 2)).cast("double")), 6)
          .as("avg_metric"),
        min(col(metricCol)).as("min_metric"),
        max(col(metricCol)).as("max_metric"),
        sum(when(col(metricCol) < lowThreshold, 1L).otherwise(0L))
          .as("n_low_quality"))
      .orderBy("day")
}
