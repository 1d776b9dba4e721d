package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Ranking

/** Multi-column clustering layout (Morton / Z-order) for the versioned
  * lake, the write-side half of [[VersionedTable]]'s file skipping: a
  * single sort key can make min/max pruning perfect on ONE column but
  * useless on every other, while interleaving the bits of several
  * per-column ranks gives every clustered column locality ∝ 2^-bits per
  * file, so a range predicate on ANY of them prunes most files.
  *
  * Per-column ranks are EQUI-DEPTH, not min/max-scaled: each column is
  * bucketed by [[Ranking.globalNtile]] (two-phase, no single-partition
  * window), so a lognormal `o_totalprice` spreads over all 2^bits codes
  * instead of collapsing into the first few the way linear min/max
  * scaling would. The cost — one local sort + broadcast-offsets join
  * per clustered column — is write-time only and amortizes over every
  * pruned read, the same trade a table format's OPTIMIZE ZORDER makes.
  *
  * Tie-break within equal column values is partition-dependent; that
  * only moves rows between ADJACENT buckets, which perturbs layout, not
  * results — readers re-apply exact predicates ([[VersionedTable.ColRange
  * .rowPredicate]]), so clustering can never change query output.
  */
object Clustering {

  /** Append a Z-value column: interleaves the low `bits` bits of each
    * column's equi-depth bucket rank, column j's bit i landing at
    * position `i*n + j`. Nulls sort first and land in bucket 0 — they
    * cluster together, and null-rejecting range reads skip their files.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
                 out: String): DataFrame = {
    require(cols.nonEmpty, "need at least one clustering column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*columns must fit a long, got $bits x ${cols.size}")
    val working = cols.map(c => s"${out}_b_$c")
    (working :+ out).foreach(w => require(!df.columns.contains(w),
      s"working column $w clashes with an input column"))
    val bucketed = cols.zip(working).foldLeft(df) { case (d, (c, b)) =>
      Ranking.globalNtile(d, Seq(col(c)), 1 << bits, b)
    }
    val n = cols.size
    // ntile is 1-based; bucket-1 keeps codes in [0, 2^bits)
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      working.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright((col(b) - 1).cast("long"), i).bitwiseAND(lit(1L)),
          i * n + j))
      }
    }
    bucketed.withColumn(out, z).drop(working: _*)
  }

  /** Re-lay `df` out as `numFiles` Z-ordered ranges: range-partition on
    * the Z-value so each output file owns a contiguous Z interval (=
    * a small hyper-rectangle neighborhood of the clustered columns),
    * sort within partitions so parquet row-group stats are tight too,
    * then drop the helper. Schema out == schema in.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
              bits: Int = 8): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val zc = "_graft_z"
    val z = withZValue(df, cols, bits, zc)
    z.repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** Cluster and publish in one step, with file stats on the clustered
    * columns (plus any `extraStats`) so [[VersionedTable.readCurrentWhere]]
    * can prune on every clustered dimension.
    */
  def publishClustered(df: DataFrame, root: String, cols: Seq[String],
                       numFiles: Int, bits: Int = 8,
                       keepVersions: Int = 3,
                       extraStats: Seq[String] = Nil): String =
    VersionedTable.publish(cluster(df, cols, numFiles, bits), root,
      keepVersions, statsColumns = (cols ++ extraStats).distinct)

  /** OPTIMIZE for a clustered table: rewrite the CURRENT version
    * re-clustered (fresh equi-depth ranks over today's value
    * distribution, `targetFiles` Z-ranges) as a new version — the
    * layout-preserving counterpart of [[VersionedTable.compact]],
    * whose hash repartition would destroy the Z-order. Run after
    * enough upserts have interleaved unclustered rows that file
    * min/max ranges drift wide. Same no-window manifest publish.
    */
  def recluster(spark: org.apache.spark.sql.SparkSession, root: String,
                cols: Seq[String], targetFiles: Int, bits: Int = 8,
                keepVersions: Int = 3, extraStats: Seq[String] = Nil): String = {
    // reads only the bare base — a pending MOR overlay would be
    // silently superseded by the republish; fold it first
    VersionedTable.requireNoPendingDeltas(spark, root, "recluster")
    publishClustered(VersionedTable.readCurrent(spark, root), root, cols,
      targetFiles, bits, keepVersions, extraStats)
  }
}
