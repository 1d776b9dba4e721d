package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.QueryPack

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module QueryPacks; each pack entry is one operator
  * from SURVEY.md §2 (or a training-data-pipeline extension) with a
  * DuckDB oracle where SQL-expressible.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.analytics.AnalyticsQueries,
    graft.operators.JoinQueries,
    graft.operators.WindowQueries,
    graft.operators.RelationalQueries,
    graft.textops.TextQueries,
    graft.warehouse.WarehouseQueries,
    graft.stream.StreamQueries,
    graft.lake.LakeQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap

  /** The bench surface: every oracled query plus the bench-only twins
    * (production-hash sketch variants) — what `graft.Bench` times.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ packs.flatMap(_.benchOnly)
}
