package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs, assembled from the exact operators in this
  * package (each independently oracle-checked):
  *
  *   exact dedup (deterministic survivor)
  *     → quality gate (score ≥ threshold)
  *     → language gate (predicted language ∈ keep set)
  *
  * Every stage is a lazy DataFrame transform: Catalyst fuses the three
  * gates into the scan where possible, and the only shuffle is the
  * dedup's fingerprint window. At 100 TB this is the cheapest possible
  * shape — one wide shuffle, then pure map-side filtering.
  */
object Curation {

  def curate(df: DataFrame, idCol: String, textCol: String,
             minQuality: Double, keepLangs: Seq[String]): DataFrame = {
    val deduped = Dedup.dropExactDuplicates(df, idCol, textCol)
    val gated = TextAnalysis.languageId(
      TextAnalysis.qualityScore(deduped, textCol), textCol)
    gated.filter(col("quality_score") >= minQuality &&
      col("predicted_lang").isin(keepLangs: _*))
  }

  /** Near-duplicate-aware survivor selection: exact Jaccard pairs →
    * transitive clusters ([[Dedup.connectedComponents]]) → keep the
    * minimum-id member of every cluster plus all unclustered docs.
    * The closure matters: in an A~B~C chain with A≁C, pairwise-greedy
    * dropping could keep both A and C; the component collapses the
    * whole chain onto one survivor. Compose BEFORE `curate` for the
    * full pipeline (near-dedup → exact dedup → gates).
    *
    * Pair generation defaults to `"auto"`: [[Dedup.preferPrefixFilter]]
    * picks the full shingle join or the AllPairs prefix-filtered join
    * from sampled corpus statistics (the winner is a property of the
    * corpus's sharing structure — boilerplate-heavy corpora want the
    * prefix filter, short high-entropy ones want the full join;
    * measured crossover in SCALING.md). `"full"` / `"prefix"` force a
    * variant — identical results either way (property-tested).
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, threshold: Double = 0.5,
                         pairStrategy: String = "auto"): DataFrame = {
    val pairs = pairStrategy match {
      case "auto" => Dedup.jaccardPairsAuto(df, idCol, textCol, shingleN, threshold)
      case "prefix" => Dedup.jaccardPairsPrefix(df, idCol, textCol, shingleN, threshold)
      case "full" => Dedup.jaccardPairs(df, idCol, textCol, shingleN, threshold)
      case other => throw new IllegalArgumentException(
        s"pairStrategy must be auto|full|prefix, got '$other'")
    }
    val losers = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("node") =!= col("label"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Per-source curation report over `curate` output: kept docs, token
    * mass, mean quality (decimal-cast so the average is exact).
    */
  def report(curated: DataFrame, textCol: String,
             sourceCol: String = "source"): DataFrame =
    curated
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextFunctions.tokens(col(textCol)))).as("total_tokens"),
        round(avg(col("quality_score")
          .cast(org.apache.spark.sql.types.DecimalType(18, 6))), 6)
          .cast("double").as("avg_quality"))
      .orderBy(sourceCol)
}
