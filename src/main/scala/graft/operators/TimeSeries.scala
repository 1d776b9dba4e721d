package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn a sparse per-key series into a
  * dense daily one. The reference's date dimension (`schema.sql:
  * 289-317`) densifies the calendar globally; this is the per-key
  * version a metrics warehouse actually needs — every key gets its own
  * contiguous spine and carried-forward observations.
  */
object TimeSeries {

  /** Densify `(key, date, value)` rows to one row per key per day
    * between that key's first and last observation, forward-filling
    * missing values (`value_ff` = latest observation at or before the
    * day; `is_observed` marks real rows).
    *
    * Scale shape: the spine comes from a per-key min/max aggregate and
    * a `sequence` explode — span-proportional rows, never a cross join
    * against a global calendar; the fill is one window per key ordered
    * by day (`last(ignoreNulls)` — bounded by the key's span). Input
    * must be at (key, date) grain — pre-aggregate first.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, dateCol: String,
                   valueCol: String): DataFrame = {
    val spine = df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("_lo"), max(col(dateCol)).as("_hi"))
      .select(col(keyCol),
        explode(expr("sequence(_lo, _hi, interval 1 day)")).as(dateCol))
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, Seq(keyCol, dateCol), "left")
      .withColumn("value_ff", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("is_observed", col(valueCol).isNotNull)
  }

  /** Rolling distinct count over a trailing day window — WAU/MAU-style
    * "distinct ids in the `windowDays` days ending at each observed
    * day". A RANGE-window `countDistinct` doesn't exist in Spark (and
    * a per-day self-join over the range is O(days·window) scans); the
    * scale shape is: collapse to per-day DISTINCT ids first (the big
    * reduction — a 100 TB event log becomes |days|·|dailyActive|
    * pairs), EXPLODE each (day, id) to the `windowDays` window-ends it
    * contributes to (the interval-join bin trick with bin = day), keep
    * window-ends that are observed days (tiny broadcast semi-join),
    * and count distinct per window-end. Shuffle ∝ windowDays × the
    * per-day-distinct relation — linear in the window, never quadratic
    * in days. Output: (dateCol, n_distinct), observed days only.
    */
  /** Recursive exponentially-weighted moving average of each key's
    * event sequence — the classic monitoring smoother
    * (ewmaₜ = (1−α)·ewmaₜ₋₁ + α·xₜ, seeded with the first value),
    * bounded to the last `lookback` rows so the window frame, the
    * state, and the weight tail are all finite.
    *
    * A recursion looks engine-hostile, but a BOUNDED fold is exactly
    * what both Spark and SQL evaluate deterministically: the ordered
    * window frame collects ≤`lookback` values and a left HOF fold
    * (`aggregate`; `list_reduce` in the oracle) replays the recursion
    * with an IDENTICAL operation order — same doubles, same bits, no
    * rounding discipline needed beyond the final 6 dp. Cost: one
    * window shuffle on the key, O(lookback) state per row, no
    * self-join and no per-row re-scan (the repeated-substring
    * contrast: DuckDB re-folds per window where Spark streams — here
    * both fold per row, the frame is small by contract).
    *
    * `orderCols` must be a deterministic total order within each key
    * (include a unique tiebreaker). Null values poison the windows
    * that contain them (null ewma) — filter upstream if nulls are
    * expected; silently skipping them would shift everyone's weights.
    * To make that contract hold, the frame collects STRUCT-wrapped
    * values (`collect_list` drops bare nulls, which would silently
    * shrink the frame and re-weight every row instead): the struct is
    * never null, the null rides inside as a field, and the fold's
    * `acc·(1−α) + null·α` propagates null exactly as the oracle's
    * `list()`/`list_reduce` does.
    */
  def ewma(df: DataFrame, keyCol: String, orderCols: Seq[String],
           valueCol: String, alpha: Double, lookback: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(lookback >= 1, s"lookback must be >= 1, got $lookback")
    require(!df.columns.contains("_w"),
      "input already has a _w column — rename it first")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(lookback - 1), 0)
    df.withColumn("_w",
        collect_list(struct(col(valueCol).cast("double").as("v"))).over(win))
      .withColumn("ewma", expr(
        s"floor(aggregate(slice(_w, 2, size(_w) - 1), element_at(_w, 1).v, " +
          s"(acc, x) -> acc * ${1 - alpha}D + x.v * ${alpha}D) " +
          "* 1000000 + 0.5) / 1000000"))
      .drop("_w")
  }

  def rollingDistinct(df: DataFrame, tsCol: String, idCol: String,
                      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val daily = df
      .select(to_date(col(tsCol)).as("_day"), col(idCol).as("_id"))
      .where(col("_day").isNotNull && col("_id").isNotNull)
      .distinct()
    val days = daily.select(col("_day").as("_win_end")).distinct()
    daily
      .withColumn("_win_end", explode(sequence(col("_day"),
        date_add(col("_day"), windowDays - 1))))
      .join(broadcast(days), Seq("_win_end"), "left_semi")
      .groupBy(col("_win_end").as(tsCol + "_window_end"))
      .agg(countDistinct(col("_id")).as("n_distinct"))
  }
}
