package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics — ordered funnels and retention cohorts,
  * the two canonical product-analytics queries over an event stream at
  * rest. The reference's monitoring layer counts event types in time
  * windows (`pipeline_monitor.py:158-204`) but has no notion of
  * per-user ordering; these operators add it with per-step hash
  * aggregations only (no windows over unbounded frames, no driver
  * state).
  */
object Behavior {

  /** Ordered funnel: step 1 counts users with any `steps(0)` event;
    * step i counts users whose earliest qualifying step-(i−1) time is
    * strictly before some step-i event (the standard "earliest
    * qualifying completion" funnel — order matters, same-timestamp
    * events do not double-count as progress).
    *
    * Scale shape: k−1 hash joins keyed on the user id, each against a
    * one-row-per-user frame that only shrinks; per-step counts are
    * 1-row aggregates unioned into the summary. No global windows.
    * Returns (step_index, step, n_users).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    val summaries = scala.collection.mutable.ArrayBuffer(
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(1).as("step_index"), lit(steps.head).as("step"),
          col("n_users")))
    steps.tail.zipWithIndex.foreach { case (s, i) =>
      reached = events.filter(col(typeCol) === s)
        .join(reached, userCol)
        .filter(col(tsCol) > col("_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      summaries += reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2).as("step_index"), lit(s).as("step"), col("n_users"))
    }
    summaries.reduce(_ unionByName _)
  }

  /** Retention cohort matrix: users grouped by the week of their first
    * event (`cohort_week`, Monday-truncated), counted as active in
    * each whole-week offset from that first day. Two hash
    * aggregations + one join on the user id; distinct-user counts per
    * (cohort, offset) cell ride Spark's Expand-based count distinct.
    * Returns (cohort_week, week_offset, n_users).
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("_first"))
    events.select(col(userCol), to_date(col(tsCol)).as("_d"))
      .join(firsts, userCol)
      .withColumn("cohort_week", date_trunc("week", col("_first")).cast("date"))
      .withColumn("week_offset", expr("datediff(_d, _first) div 7").cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
