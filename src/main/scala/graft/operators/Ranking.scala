package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row-numbering — the W4 shape (`etl/pipeline.py:465`)
  * at unbounded input size.
  *
  * `row_number().over(Window.orderBy(...))` funnels the entire input
  * through ONE partition: correct on an already-aggregated few-row
  * frame, a guaranteed stall at "rank all distinct owner names" scale.
  * This two-phase form keeps every stage distributed:
  *
  *   1. range-repartition on the sort keys (sampled range bounds — the
  *      same machinery a distributed `orderBy` uses), so partitions
  *      hold disjoint, ordered key ranges;
  *   2. partition-local `row_number` (parallel, per-range);
  *   3. per-partition counts → running offsets (one row per partition,
  *      a driver-bounded frame) broadcast back and added to the local
  *      ranks.
  *
  * Cost: two data shuffles (range + the window's hash on the partition
  * id) and one broadcast of `numPartitions` rows — versus the single
  * shuffle-to-one-partition of the naive form. `orderExprs` must be a
  * total order (include a tie-break key) for deterministic output —
  * the same requirement the single-window form has.
  */
object Ranking {

  def globalRowNumber(df: DataFrame, orderExprs: Seq[Column],
                      outCol: String): DataFrame = {
    val parted = df.repartitionByRange(orderExprs: _*)
      .withColumn("_pid", spark_partition_id())
    val local = parted.withColumn("_lrn",
      row_number().over(Window.partitionBy("_pid").orderBy(orderExprs: _*)))
    // numPartitions rows — the one place a global window is safe.
    val offsets = local.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    local.join(broadcast(offsets), "_pid")
      .withColumn(outCol, (col("_lrn") + col("_offset")).cast("int"))
      .drop("_pid", "_lrn")
  }
}
