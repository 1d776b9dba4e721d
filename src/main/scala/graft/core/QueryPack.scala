package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each module of the engine (analytics, warehouse, serve, textops, …)
  * contributes a QueryPack; `graft.SparkEntry` concatenates them. Every
  * entry in `queries` should have a matching DuckDB-SQL oracle in
  * `oracle` unless the operator is not SQL-expressible (the driver then
  * records a weaker rows-only check).
  *
  * Contract (see the driver prompt): the oracle compare sorts columns by
  * name and hashes values, so Spark-side and SQL-side column names must
  * match exactly, and floating aggregates must be computed so both
  * engines produce bit-identical values (cast to DECIMAL before SUM,
  * round ratios).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]

  /** Bench-only twins: measured by `graft.Bench` but EXCLUDED from the
    * Verify/oracle surface — for production variants whose only delta
    * from an oracled query is a non-SQL-expressible ingredient (e.g.
    * the xxhash64 sketch family vs its Md5Portable oracle stand-in).
    * Keeping them out of `queries` keeps the correctness report free
    * of weaker rows-only rows.
    */
  def benchOnly: Map[String, Q] = Map.empty
}
