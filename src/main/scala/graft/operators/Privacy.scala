package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.bq

/** Privacy-preserving release operators (public k-anonymity model,
  * Sweeney 2002 "k-anonymity: a model for protecting privacy"). The
  * reference redacts nothing before publishing its owner tables; a
  * training-data pipeline releasing derived datasets needs at least
  * suppression of rare quasi-identifier combinations — a row whose
  * (segment, nation, …) combination occurs fewer than k times is
  * re-identifiable by linkage even with names removed.
  */
object Privacy {

  /** Suppress quasi-identifier values in groups smaller than `k`: every
    * row keeps its payload, but its QI columns collapse to `"*"` when
    * fewer than `k` rows share the full QI combination — after which
    * every released row is QI-indistinguishable from ≥ k−1 others (the
    * suppressed rows all share the all-`*` combination, provided at
    * least k of them exist; re-check with [[kAnonymityReport]]).
    *
    * QI columns are returned as strings (the suppression sentinel and
    * values share a type). One window over the QI key — a single
    * shuffle; group counts never leave their partition.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(qiCols.nonEmpty, "at least one quasi-identifier column required")
    require(!df.columns.contains("_qi_n"),
      "input already has a _qi_n column — rename it first")
    val w = Window.partitionBy(qiCols.map(c => bq(c)): _*)
    qiCols.foldLeft(df.withColumn("_qi_n", count(lit(1)).over(w))) { (d, c) =>
      d.withColumn(c,
        when(col("_qi_n") < k, lit("*"))
          .otherwise(bq(c).cast("string")))
    }.drop("_qi_n")
  }

  /** Distinct l-diversity suppression (Machanavajjhala et al., "l-
    * diversity: privacy beyond k-anonymity", TKDE 2007): k-anonymity
    * alone fails the HOMOGENEITY attack — a size-k QI group whose
    * SENSITIVE value is uniform discloses that value for every member
    * without any linkage. Here a QI group must also contain at least
    * `l` distinct sensitive values or its QI columns suppress to `"*"`
    * (the sensitive column itself is never rewritten — it is the
    * payload being protected, not the identifier).
    *
    * Plan shape: one aggregation on the QI key — count + distinct
    * sensitive count in the same pass (null sensitive values don't
    * count toward diversity) — then the |groups|-row relation joins
    * back onto the table with NULL-SAFE equality (`<=>` per QI
    * column): groupBy keeps null groups, and a plain equi-join would
    * never match them, silently dropping every row with a NULL
    * quasi-identifier — the null-safe join retains them, matching
    * [[kAnonymize]]'s window form, and still plans as a hash join.
    * No broadcast hint: at 100 TB-scale QI cardinality the stats
    * relation can exceed the broadcast ceiling, so AQE chooses
    * (broadcasting whenever it fits). Suppression fires when EITHER
    * bar fails (size < k or diversity < l), so the released table is
    * k-anonymous AND l-diverse in its unsuppressed groups.
    */
  def lDiversify(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 k: Int, l: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(l > 0, s"l must be positive, got $l")
    require(qiCols.nonEmpty, "at least one quasi-identifier column required")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot be a quasi-identifier")
    val clash = df.columns.filter(Set("_qi_n", "_qi_l").contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with lDiversify's " +
        "working names (_qi_n, _qi_l) — rename them first")
    val stats = df.groupBy(qiCols.map(c => bq(c)): _*)
      .agg(count(lit(1)).as("_qi_n"),
        countDistinct(bq(sensitiveCol)).as("_qi_l"))
    val t = df.as("_ldiv_t")
    val s = stats.as("_ldiv_s")
    val cond = qiCols.map(c => bq("_ldiv_t", c) <=> bq("_ldiv_s", c))
      .reduce(_ && _)
    val joined = t.join(s, cond)
      .select(col("_ldiv_t.*"),
        col("_ldiv_s._qi_n").as("_qi_n"), col("_ldiv_s._qi_l").as("_qi_l"))
    qiCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(col("_qi_n") < k || col("_qi_l") < l, lit("*"))
          .otherwise(bq(c).cast("string")))
    }.drop("_qi_n", "_qi_l")
  }

  /** Post-release audit: group sizes of the RELEASED table's QI
    * combinations — k-anonymity holds iff the minimum is ≥ k. Run it
    * on [[kAnonymize]]'s output, not its input: suppression merges all
    * suppressed rows into one `*` group, which this report sizes.
    */
  def kAnonymityReport(released: DataFrame, qiCols: Seq[String]): DataFrame =
    released.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .agg(min(col("group_size")).as("min_group_size"),
        count(lit(1)).as("n_groups"))
}
