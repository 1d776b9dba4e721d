package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaped operators from SURVEY.md §2.3 that need a deliberate
  * Spark formulation to stay scalable.
  */
object Joins {

  /** Disjunctive (OR-of-equi-conjunctions) join — `etl/pipeline.py:393-396`
    * joins `ON (first=first AND last=last) OR (legal_entity=legal_entity)`.
    *
    * A raw OR condition forces Spark into BroadcastNestedLoopJoin (O(n·m)
    * — unusable at scale). Rewritten as a union of hash joins, deduped on
    * the output key columns: each disjunct shuffles on its own equi keys,
    * so the whole thing stays O(n+m) per disjunct.
    */
  def orEquiJoin(left: DataFrame, right: DataFrame,
                 disjuncts: Seq[Column], dedupKeys: Seq[String]): DataFrame =
    disjuncts
      .map(cond => left.join(right, cond, "inner"))
      .reduce(_ unionByName _)
      .dropDuplicates(dedupKeys)

  /** Anti-join orphan check (`etl/pipeline.py:574-590`): rows of `fact`
    * whose key has no match in `dim`. left_anti keeps only fact columns
    * and never materializes matches.
    */
  def orphans(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(dim, keys, "left_anti")

  /** Upsert emulation (`ON CONFLICT DO UPDATE`, `etl/pipeline.py:314-318`
    * et al.) without a transactional table format: keep every old row
    * whose key is absent from `updates` (anti join), union the updates.
    *
    * At scale both sides shuffle once on `keys`; if `updates` is small
    * Catalyst broadcasts it and the old table never shuffles. Callers
    * writing to a lake should write to a temp path and swap (the
    * atomicity note in SURVEY §7).
    */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(updates, keys, "left_anti").unionByName(updates)

  /** Scalar "subquery" (`etl/pipeline.py:517-522`): attach a 1-row
    * aggregate to every row of `df` without a shuffle — Catalyst plans
    * the cross join of a 1-row side as broadcast.
    */
  def withScalar(df: DataFrame, scalar: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalar))
}
