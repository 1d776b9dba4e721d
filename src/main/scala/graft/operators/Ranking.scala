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

  /** Working columns the two-phase machinery claims internally.
    * `withColumn` silently REPLACES a same-named input column, which
    * would corrupt results rather than error — so refuse such inputs
    * up front.
    */
  private val ReservedCols = Set("_pid", "_lrn", "_n", "_offset", "_grn", "_total")

  private def assertNoReserved(df: DataFrame): Unit = {
    val clash = df.columns.filter(ReservedCols.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Ranking's " +
        s"reserved working names (${ReservedCols.mkString(", ")}) — rename them first")
  }

  /** The rank is a LONG by default: beyond 2^31−1 rows an int rank
    * overflows (ANSI mode fails the job), defeating the unbounded-input
    * design goal. Pass `asInt = true` only when `row_number`-identical
    * schema parity matters and the frame is known int-bounded.
    */
  /** Shared two-phase machinery: partition-locally ranked rows plus the
    * numPartitions-row offsets frame (per-partition count, running
    * offset, grand total).
    *
    * The partitioned relation is MATERIALIZED (localCheckpoint) before
    * `_pid` is read: both consumers — the ranked rows and the offsets
    * aggregate — must see the SAME partition assignment, and `_pid` is
    * only well-defined per execution. Without the lineage cut the
    * offsets branch re-executes the range exchange for its broadcast;
    * exchange reuse usually dedupes the two, but it is an OPTIMIZATION,
    * not a guarantee — inside a larger write plan (chained ntiles under
    * a clustered publish) the exchanges compile differently, the range
    * sampler runs twice, boundaries diverge, and the `_pid` equi-join
    * silently drops or duplicates rows (caught by the q_l
    * cluster-roundtrip oracle at sf0.1: 150k rows in, ~39k out,
    * different every run). The checkpoint costs one storage pass of the
    * already-shuffled relation — the price of making a
    * physical-execution artifact (`spark_partition_id`) safe to join
    * on, same reasoning as the CC per-round checkpoint.
    */
  private def localRankAndOffsets(df: DataFrame,
                                  orderExprs: Seq[Column]): (DataFrame, DataFrame) = {
    assertNoReserved(df)
    val parted = df.repartitionByRange(orderExprs: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val local = parted.withColumn("_lrn",
      row_number().over(Window.partitionBy("_pid").orderBy(orderExprs: _*)))
    // numPartitions rows — the one place a global window is safe.
    val offsets = local.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_total", sum(col("_n")).over(Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    (local, offsets)
  }

  def globalRowNumber(df: DataFrame, orderExprs: Seq[Column],
                      outCol: String, asInt: Boolean = false): DataFrame = {
    val (local, offsets) = localRankAndOffsets(df, orderExprs)
    val rank = col("_lrn") + col("_offset")
    local.join(broadcast(offsets.select("_pid", "_offset")), "_pid")
      .withColumn(outCol, if (asInt) rank.cast("int") else rank)
      .drop("_pid", "_lrn", "_offset")
  }

  /** Exact `ntile(k)` without a single-partition window: two-phase
    * global rank, then the NTILE bucket formula applied per row against
    * the broadcast total count. SQL NTILE semantics: with n rows the
    * first n mod k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — a pure
    * function of (rank, n, k), so once the distributed rank exists the
    * bucket is a map-side expression. This is the scale path for
    * "quartile every customer": an `approx_percentile` cutpoint join
    * would avoid the rank entirely but changes tie/boundary semantics;
    * this form is bit-identical to `ntile` at any input size.
    */
  def globalNtile(df: DataFrame, orderExprs: Seq[Column], k: Int,
                  outCol: String): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    // The grand total rides the SAME numPartitions-row offsets frame the
    // rank join already broadcasts — no separate count subquery. (An
    // earlier form counted the ranked frame itself, which re-executed the
    // whole two-phase pipeline as a broadcast subquery: 14.6 s vs ~1 s at
    // sf0.1 on q_w8_ntile.)
    val (local, offsets) = localRankAndOffsets(df, orderExprs)
    // All-long DIV arithmetic (Column./ would be double division). CASE
    // WHEN evaluates lazily, so the small-bucket branch's division is
    // never executed when n < k makes the floor bucket size zero.
    val bucket = expr(
      s"""CASE WHEN _grn <= (_total % $k) * ((_total DIV $k) + 1)
         |THEN (_grn - 1) DIV ((_total DIV $k) + 1)
         |ELSE (_total % $k) + (_grn - (_total % $k) * ((_total DIV $k) + 1) - 1) DIV (_total DIV $k)
         |END""".stripMargin)
    local.join(broadcast(offsets.select("_pid", "_offset", "_total")), "_pid")
      .withColumn("_grn", col("_lrn") + col("_offset"))
      .withColumn(outCol, (bucket + 1L).cast("int"))
      .drop("_pid", "_lrn", "_offset", "_total", "_grn")
  }
}
