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
