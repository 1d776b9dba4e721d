package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) versioning — the warehouse
  * counterpart the reference's dimension loads imply but implement only
  * as type 1 overwrite (`dl/src/etl/pipeline.py` upserts dim_owner /
  * dim_business in place): rebuild a dimension's full version history
  * from an observation log, emitting one row per (key, attribute state)
  * interval with `valid_from` / `valid_to` / `is_current`.
  *
  * Shape at scale: everything partitions on the dimension key — one
  * hash shuffle, then two windows (change-detect lag, interval-close
  * lead) over the SAME partitioning/ordering, so Catalyst reuses the
  * single exchange (plan-asserted in PlanSpec). No self-join against
  * the "previous load" (the classic SCD2 MERGE formulation), which at
  * 100 TB would shuffle the dimension twice per load.
  */
object Scd {

  /** Collapse an observation log into type-2 version intervals.
    *
    * @param df      observation rows: key columns + attribute columns +
    *                an observation time + a within-time sequence column
    * @param keys    dimension natural-key columns
    * @param attrs   tracked attribute columns — a version closes when
    *                ANY of them changes (null-safe struct comparison)
    * @param tsCol   observation time (version validity granularity);
    *                multiple observations at one instant collapse to the
    *                latest by `seqCol` ("last write wins" per snapshot)
    * @param seqCol  total-order tie-break within one `tsCol` instant
    */
  def buildType2(df: DataFrame, keys: Seq[String], attrs: Seq[String],
                 tsCol: String, seqCol: String): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val grp = (keys :+ tsCol).map(col)
    // One explicit partition on the KEY serves the whole pipeline: a
    // key-only partitioning co-locates every (key, instant) group, so
    // the snapshot aggregation AND both windows ride this single
    // exchange (the default plan shuffles twice — once on (key, ts) for
    // the groupBy, again on key for the windows). Trade: the snapshot
    // collapse loses its map-side partial step, which only matters when
    // same-instant duplicate writes dominate the log.
    val snap = df.repartition(keys.map(col): _*).groupBy(grp: _*)
      .agg(max_by(col(attrs.head), col(seqCol)).as(attrs.head),
        attrs.tail.map(a => max_by(col(a), col(seqCol)).as(a)): _*)
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val state = struct(attrs.map(col): _*)
    snap
      .withColumn("_prev", lag(state, 1).over(byKey))
      // keep rows where the state differs from the previous snapshot
      // (null-safe: the first snapshot per key always survives)
      .filter(!(col("_prev") <=> state))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_prev", tsCol)
  }
}
