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

  /** Oracle queries whose multi-referenced CTEs get a `MATERIALIZED`
    * hint ([[materializeMultiRefCtes]]). DuckDB (1.0) INLINES every
    * CTE reference — the minhash oracles' `band` CTE is referenced by
    * 16 band expansions and the pair join, so the whole
    * shingle→hash→signature pipeline re-derives up to 20× per query;
    * at sf0.1 that made the three near-dedup store-step twins the
    * replay's longest pole. The hint is replay-side only (the Spark
    * plans are untouched) and value-neutral by construction — same
    * engine, same SQL semantics — verified bit-equal per entry at
    * sf0.01 before whitelisting. A whitelist rather than a blanket
    * because materialization can also LOSE (it blocks predicate
    * pushdown into the CTE): q_t_boilerplate measured 1.4× SLOWER
    * materialized, so only measured wins are listed.
    */
  private val MaterializeOracles: Set[String] = Set(
    "q_s_neardedup_step", "q_s_neardedup_amortized_step",
    "q_s_neardedup_segmented_step",
    "q_t_minhash_lsh", "q_t_edit_verify", "q_t_simhash",
    "q_t_dedup_clusters", "q_t_cluster_split", "q_t_curate_best",
    "q_t_curriculum", "q_t_repsub")

  /** Add `MATERIALIZED` to every CTE of `sql` that is referenced at
    * least twice (word-boundary count over the original text, minus
    * the definition itself). Purely a DuckDB execution hint: the
    * planner computes the CTE once instead of inlining a copy per
    * reference.
    */
  private def materializeMultiRefCtes(sql: String): String = {
    // negative lookbehind: a named `WINDOW w AS (...)` clause is not a
    // CTE definition — hinting it would be a syntax error
    val names = """(?<!WINDOW )(\w+) AS \(""".r.findAllMatchIn(sql)
      .map(_.group(1)).toSeq.distinct
    names.foldLeft(sql) { (acc, n) =>
      val refs = ("\\b" + java.util.regex.Pattern.quote(n) + "\\b").r
        .findAllMatchIn(sql).size - 1
      if (refs >= 2) acc.replace(s"$n AS (", s"$n AS MATERIALIZED (")
      else acc
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap.map { case (k, v) =>
      k -> (if (MaterializeOracles(k)) materializeMultiRefCtes(v) else v)
    }

  /** The bench surface: every oracled query plus the bench-only twins
    * (production-hash sketch variants) — what `graft.Bench` times.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ packs.flatMap(_.benchOnly)
}
