package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.bq
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for every left row, attach the single right row
  * with the greatest `rightTs <= leftTs` within the same key group —
  * the standard point-in-time lookup of feature stores and training-data
  * pipelines (label events joined to the latest feature snapshot).
  *
  * The reference workload has no as-of join; this is a training-pipeline
  * extension built by composing existing operators (SURVEY §2 preference
  * order (a)): no custom plan node needed.
  *
  * Spark-first shape: tag both inputs, union them, and run one
  * running-`last(ignoreNulls)` window ordered by (ts, tag) per key. That
  * is a single shuffle on the key and a linear pass — NOT the naive
  * `left.join(right, key && rightTs <= leftTs)` + max-window, whose
  * intermediate is O(|left| × |right|) per key and collapses at scale.
  * Ties (`rightTs == leftTs`): the right row sorts before the left row
  * (tag 0 < 1), so an exactly-simultaneous snapshot IS visible — same
  * semantics as DuckDB/kdb ASOF JOIN's `>=` match.
  *
  * `right` must be unique per (key, rightTs) — pre-dedup it otherwise;
  * with duplicates the survivor would depend on partition order. Right
  * rows with a NULL `rightTs` are dropped up front: a null timestamp
  * never matches under ASOF `>=` semantics (DuckDB/kdb agree), and
  * without the filter nulls-first ordering would forward-fill their
  * payload into every row of the key group.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, payloadCols, forward = false)

  /** Forward as-of join: attach the single right row with the SMALLEST
    * `rightTs >= leftTs` per key — outcome labeling (each event joined
    * to the next conversion/order at or after it). Same single-shuffle
    * union+window shape as [[asofJoin]], with the running pass walking
    * time backwards; equality ties match, like DuckDB's
    * `ASOF JOIN ... ON l.ts <= r.ts`.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTs, rightTs, payloadCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       payloadCols: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns
    // The whole right payload travels as ONE struct so the running
    // last(ignoreNulls) picks an entire right row atomically — filling
    // each payload column with its own window would stitch values from
    // different right rows whenever a payload field is null.
    val rPayloadType = StructType(payloadCols.map(c => right.schema(c)).toArray)
    // Align the two sides on (keys, ts, tag, leftPayload…, _r struct).
    // Every caller-supplied name goes through bq: keys, timestamps,
    // payload and carried left columns may all be dotted raw headers.
    val lAligned = left
      .withColumn("_ts", bq(leftTs))
      .withColumn("_tag", lit(1))
      .select((keys.map(bq(_)) :+ col("_ts") :+ col("_tag")) ++
        leftCols.filterNot(keys.contains).map(bq(_)) :+
        lit(null).cast(rPayloadType).as("_r"): _*)
    val rAligned = right
      .filter(bq(rightTs).isNotNull)
      .withColumn("_ts", bq(rightTs))
      .withColumn("_tag", lit(0))
      .select((keys.map(bq(_)) :+ col("_ts") :+ col("_tag")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(bq(_)): _*).as("_r"): _*)
    val w = Window.partitionBy(keys.map(bq(_)): _*)
      // forward = the same running pass over time reversed; at equal
      // ts the right row (tag 0) is seen first either way, so both
      // directions match exact-timestamp snapshots
      .orderBy(if (forward) col("_ts").desc else col("_ts").asc,
        col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(bq(_)) ++
        payloadCols.map(c => bq("_r", c).as(c)): _*)
  }
}
