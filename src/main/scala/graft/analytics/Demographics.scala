package graft.analytics

import graft.functions.StableMath.gridSnap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.bq

/** Composable analytics query functions — the Spark-native equivalent of
  * the reference's demographics analyzer
  * (`dl/src/analytics/demographics_analyzer.py:16-235`).
  *
  * Every function is a pure `DataFrame => DataFrame` (lazy plan); nothing
  * collects to the driver. All aggregations are hash-agg shaped so Spark
  * plans partial (map-side) + final aggregation — the shape that scales:
  * the shuffle carries one row per distinct group, not per input row.
  */
object Demographics {

  /** A1 distinct counts behind ONE call site with the 100 TB seam
    * SCALING.md names: `exact = true` (default) is the oracle-checkable
    * `countDistinct` (Expand-based when several columns are counted
    * together); `exact = false` swaps in HLL `approx_count_distinct`
    * at relative standard deviation `rsd` — a single pass with
    * constant sketch memory per column and NO Expand blow-up — without
    * the caller changing shape: same aliases, same 1-row result.
    * Choose approx when the cardinality itself is the answer
    * (profiling, monitors) and exact when downstream math consumes the
    * integers (the diversity indices divide by them). `counts` pairs
    * each input column with its output alias; the trailing row count
    * lands under `rowCountAlias`.
    */
  def distinctCounts(df: DataFrame, counts: Seq[(String, String)],
                     exact: Boolean = true, rsd: Double = 0.05,
                     rowCountAlias: String = "n_rows"): DataFrame = {
    require(counts.nonEmpty, "need at least one (column, alias) pair")
    require(rsd > 0 && rsd < 1, s"rsd must be in (0,1), got $rsd")
    val aggs = counts.map { case (c, a) =>
      if (exact) countDistinct(bq(c)).as(a)
      else approx_count_distinct(bq(c), rsd).as(a)
    } :+ count(lit(1)).as(rowCountAlias)
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Frequency table (pandas `value_counts`,
    * `demographics_analyzer.py:89-90`): one shuffle keyed on `col`,
    * map-side partial counts first.
    */
  def frequencyTable(df: DataFrame, col: String): DataFrame =
    df.filter(bq(col).isNotNull)
      .groupBy(bq(col))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), bq(col).asc)

  /** Top-K frequency (`value_counts().head(k)`). Sort+limit plans as
    * TakeOrderedAndProject — each partition keeps only k rows, the driver
    * merges k·partitions rows; no global sort at 100 TB.
    * Deterministic under ties via the secondary key.
    */
  def topK(df: DataFrame, col: String, k: Int): DataFrame =
    frequencyTable(df, col).limit(k)

  /** Group-size histogram (`demographics_analyzer.py:31-43`): row count
    * per key, then bucketed counts in a single second-stage aggregate.
    */
  def groupSizeHistogram(df: DataFrame, key: String): DataFrame = {
    val sizes = df.groupBy(bq(key)).agg(count(lit(1)).as("n"))
    sizes.agg(
      count(lit(1)).as("n_groups"),
      sum(when($("n") === 1, 1L).otherwise(0L)).as("size_1"),
      sum(when($("n") === 2, 1L).otherwise(0L)).as("size_2"),
      sum(when($("n") === 3, 1L).otherwise(0L)).as("size_3"),
      sum(when($("n") === 4, 1L).otherwise(0L)).as("size_4"),
      sum(when($("n") >= 5, 1L).otherwise(0L)).as("size_5_plus"),
      max($("n")).as("max_size"))
  }

  /** Column length statistics (`demographics_analyzer.py:58-62`).
    * `avg(length)` is an exact integer sum divided once — the division
    * is the ONE float op, snapped to the 6-dp grid engine-stably
    * ([[graft.functions.StableMath]]: integer-sum/count quotients are
    * exactly the 2^a·5^b-denominator tie class `round` renders
    * differently across engines).
    */
  def lengthStats(df: DataFrame, col: String): DataFrame = {
    val len = length(bq(col))
    df.filter(bq(col).isNotNull).agg(
      gridSnap(avg(len), 6).as("avg_len"),
      min(len).as("min_len"),
      max(len).as("max_len"),
      count(lit(1)).as("n"))
  }

  /** Conditional predicate counts in ONE pass
    * (`demographics_analyzer.py:70-80,103-123,148-159`): each (name,
    * predicate) becomes `sum(when(p,1))` in a single aggregate — one scan
    * however many patterns, instead of the reference's pass-per-pattern.
    */
  def patternCounts(df: DataFrame, preds: Seq[(String, Column)]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      preds.map { case (name, p) =>
        sum(when(p, 1L).otherwise(0L)).as(name)
      }: _*)

  /** Shannon entropy −Σ p·log2(p) over the value distribution of `col`
    * (`demographics_analyzer.py:205-209`). Two-stage: hash-agg counts
    * (shuffle = one row per distinct value) then a scalar fold. Rounded
    * so the float sum is stable across summation orders.
    */
  def shannonEntropy(df: DataFrame, col: String): DataFrame = {
    val counts = df.filter(bq(col).isNotNull)
      .groupBy(bq(col)).agg(count(lit(1)).as("cnt"))
    counts
      .agg(sum($("cnt")).as("tot"),
           sum($("cnt") * log2($("cnt"))).as("wlog"))
      // −Σ p·log2 p  ==  log2(tot) − (Σ cnt·log2 cnt)/tot : one float
      // division/log at the end keeps the heavy math in exact integers;
      // gridSnap (not round) keeps the snap engine-stable.
      .select(gridSnap(log2($("tot")) - $("wlog") / $("tot"), 6).as("entropy"),
              $("tot").as("n"))
  }

  /** Mutual information between two categorical columns in bits —
    * the dependence measure the marginal diversity stats
    * ([[shannonEntropy]], [[giniSimpson]]) can't see: MI(X;Y) = 0 iff
    * the columns are independent, and MI = H(X) when one determines
    * the other. The dataset-audit question it answers: "is this
    * attribute leaking that one?" (e.g. does `source` predict `lang`
    * — a mixing-skew alarm).
    *
    * Same exact-integer discipline as [[shannonEntropy]]: the joint
    * and both marginals are integer counts; each cell contributes
    * c·(log2 c + log2 n − log2 cx − log2 cy), DECIMAL-cast so the
    * across-cell sum is order-independent; ONE division and rounding
    * at the end. The joint relation is |X|·|Y| cells — categorical by
    * contract — so the marginal joins broadcast and the only
    * corpus-sized work is the first aggregation. Null in either
    * column drops the row (matching the entropy convention).
    * Returns 1 row: (mi_bits, n).
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 16)
    val j = df
      .where(bq(xCol).isNotNull && bq(yCol).isNotNull)
      .groupBy(bq(xCol).as("_x"), bq(yCol).as("_y"))
      .agg(count(lit(1)).as("_c"))
    val n = j.agg(sum($("_c")).as("_n"))
    val mx = j.groupBy("_x").agg(sum($("_c")).as("_cx"))
    val my = j.groupBy("_y").agg(sum($("_c")).as("_cy"))
    graft.operators.Joins.withScalar(
        j.join(broadcast(mx), "_x").join(broadcast(my), "_y"), n)
      .select(($("_c").cast("double") *
          (log2($("_c")) + log2($("_n")) - log2($("_cx")) - log2($("_cy"))))
        .cast(dec).as("_t"), $("_n"))
      .groupBy("_n")
      .agg(gridSnap(sum($("_t")).cast("double") / $("_n"), 6).as("mi_bits"))
      .select($("mi_bits"), $("_n").as("n"))
  }

  /** Gini–Simpson diversity 1 − Σ p² (`demographics_analyzer.py:211-215`). */
  def giniSimpson(df: DataFrame, col: String): DataFrame = {
    val counts = df.filter(bq(col).isNotNull)
      .groupBy(bq(col)).agg(count(lit(1)).as("cnt"))
    counts
      .agg(sum($("cnt")).as("tot"), sum($("cnt") * $("cnt")).as("sq"))
      .select(gridSnap(lit(1.0) - $("sq") / ($("tot") * $("tot")), 6).as("gini_simpson"),
              $("tot").as("n"))
  }

  /** Token mining (`demographics_analyzer.py:161-182`): tokenize, filter
    * word-shaped tokens, global top-k. The explode multiplies rows but
    * stays pipelined (no shuffle) until the count aggregation.
    */
  def tokenTopK(df: DataFrame, col: String, k: Int,
                tokenPattern: String = "^[a-zA-Z]{3,}$"): DataFrame =
    df.select(explode(split(bq(col), " ")).as("word"))
      .filter($("word").rlike(tokenPattern))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word"))
      .limit(k)

  /** Null/completeness profile per column
    * (`ingestion_pipeline.py:54-74`): single-pass multi-aggregate.
    */
  def completenessProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap { c =>
        val cc = bq(c)
        Seq(sum(when(cc.isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
            gridSnap(avg(when(cc.isNull, 0.0).otherwise(1.0)) * 100, 4)
              .as(s"${c}_completeness_pct"))
      }: _*)

  private def $(c: String): Column = org.apache.spark.sql.functions.col(c)
}
