package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.bq

/** Declarative data-quality expectations — the engine form of the
  * reference's scattered quality gates (`ingestion_pipeline.py:54-74`
  * per-column null audits, `etl/pipeline.py:205-267` completeness
  * scores, `:567-609` integrity checks): callers declare constraints,
  * the checker returns one row per constraint with its violation count.
  *
  * Scale shape: every constraint — including uniqueness — is evaluated
  * in ONE aggregation pass over the data. Row-level predicates are
  * conditional sums (map-side partial agg); uniqueness is
  * `count(*) − count(distinct key)`, which Spark plans into the same
  * aggregate via Expand. No per-constraint scans, no driver-side loop
  * over rules: checking 50 expectations on 100 TB costs the same scan
  * as checking one.
  *
  * Null semantics: range/set membership constraints pass nulls (a null
  * is "unknown", not "out of range") — declare an explicit [[NotNull]]
  * to reject them, exactly like SQL CHECK constraints.
  */
object Expectations {

  sealed trait Constraint {
    /** Stable label, used as the output row key. */
    def label: String
    /** Violation counter — an aggregate expression. */
    private[ingest] def agg: Column
  }

  /** Column must be non-null. */
  final case class NotNull(colName: String) extends Constraint {
    val label = s"not_null($colName)"
    private[ingest] def agg =
      sum(when(col(colName).isNull, 1L).otherwise(0L))
  }

  /** Key (possibly composite) must be unique across the frame. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    val label = s"unique(${cols.mkString(",")})"
    private[ingest] def agg =
      count(lit(1)) - countDistinct(struct(cols.map(col): _*))
  }

  /** Value must fall inside [lo, hi] (nulls pass — see object doc). */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Constraint {
    val label = s"in_range($colName,$lo,$hi)"
    private[ingest] def agg =
      sum(when(col(colName) < lo || col(colName) > hi, 1L).otherwise(0L))
  }

  /** Value must be one of `values` (nulls pass). */
  final case class InSet(colName: String, values: Seq[String])
      extends Constraint {
    val label = s"in_set($colName)"
    private[ingest] def agg =
      sum(when(col(colName).isNotNull && !col(colName).isin(values: _*), 1L)
        .otherwise(0L))
  }

  /** Row must satisfy an arbitrary boolean expression (nulls violate —
    * an expectation that cannot be evaluated did not hold).
    */
  final case class Satisfies(label0: String, predicate: Column)
      extends Constraint {
    val label = s"satisfies($label0)"
    private[ingest] def agg =
      sum(when(coalesce(predicate, lit(false)), 0L).otherwise(1L))
  }

  /** One row per constraint: (constraint, violations, passed) — the
    * whole check is a single aggregation job.
    */
  def violations(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "at least one constraint is required")
    val aggs = constraints.map(c => coalesce(c.agg, lit(0L)).as(c.label))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = constraints.flatMap(c => Seq(lit(c.label), bq(c.label)))
    one.select(explode(map(pairs: _*)).as(Seq("constraint", "violations")))
      .select(col("constraint"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }
}
