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
}
