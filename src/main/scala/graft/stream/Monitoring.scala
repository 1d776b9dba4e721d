package graft.stream

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.StableMath.gridSnap

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
      gridSnap(avg(when(col(statusCol) === "failed", 1.0).otherwise(0.0)), 6)
        .as("failure_rate"),
      gridSnap(avg(unix_timestamp(col(processedCol)) - unix_timestamp(col(createdCol))), 6)
        .as("avg_latency_s"))

  private def pipelineMetrics(valueCol: String, anomalyThreshold: Double) = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(col(valueCol) > anomalyThreshold, 1L).otherwise(0L)).as("n_anomalies"),
    sum(col(valueCol).cast(DecimalType(18, 2))).cast("double").as("value_mass"))

  /** Zero-extra-pass pipeline metrics via Spark's native `observe`
    * (the Prometheus-counter role of `pipeline_monitor.py:253-310`,
    * Spark-first): the metrics accumulate ON the job's own action — no
    * second scan, no scheduled query. BATCH form: after the action,
    * `observation.get` holds rows-seen, anomaly count, and value mass.
    * (The `Observation` object is batch-only by Spark's contract —
    * streaming frames use [[observedStream]].)
    */
  def observed(df: DataFrame, valueCol: String,
               anomalyThreshold: Double): (DataFrame, Observation) = {
    val obs = Observation("graft_pipeline")
    val m = pipelineMetrics(valueCol, anomalyThreshold)
    (df.observe(obs, m.head, m.tail: _*), obs)
  }

  /** Streaming form of [[observed]]: the name-based `observe` attaches
    * the same metrics to a streaming frame; they surface per
    * micro-batch in `StreamingQueryProgress.observedMetrics(name)`.
    */
  def observedStream(df: DataFrame, valueCol: String,
                     anomalyThreshold: Double,
                     name: String = "graft_pipeline"): DataFrame = {
    val m = pipelineMetrics(valueCol, anomalyThreshold)
    df.observe(name, m.head, m.tail: _*)
  }

  /** Quality-trend aggregates per period (A16,
    * `pipeline_monitor.py:214-251`): avg/min/max of a quality metric and
    * the count below threshold, grouped on a time bucket.
    */
  def qualityTrend(df: DataFrame, tsCol: String, metricCol: String,
                   lowThreshold: Double): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(
        gridSnap(avg(col(metricCol).cast(DecimalType(18, 2)).cast("double")), 6)
          .as("avg_metric"),
        min(col(metricCol)).as("min_metric"),
        max(col(metricCol)).as("max_metric"),
        sum(when(col(metricCol) < lowThreshold, 1L).otherwise(0L))
          .as("n_low_quality"))
      .orderBy("day")
}
