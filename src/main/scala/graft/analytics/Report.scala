package graft.analytics

import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableMath.gridSnap

/** Assembles the reference's comprehensive demographics report
  * (`demographics_analyzer.py:217-235` + `storage_manager.py:94-110`):
  * one nested row — ownership patterns, name demographics, role
  * analysis, business-name patterns, diversity indices — written as a
  * JSON document.
  *
  * Every section is a small aggregate (bounded rows); sections are
  * combined with broadcast cross joins, so the report costs a handful
  * of scans over the cleaned table and no large shuffle. Top-k lists
  * are embedded as arrays of structs via collect_list over
  * already-limited frames.
  */
object Report {

  private def asStructList(df: DataFrame, alias: String): DataFrame =
    df.agg(collect_list(struct(df.columns.map(col).toIndexedSeq: _*)).as(alias))

  def comprehensiveReport(cleaned: DataFrame): DataFrame = {
    val ownership = cleaned.agg(
      count(lit(1)).as("total_records"),
      countDistinct(col("Account Number")).as("total_businesses"),
      countDistinct(col("Owner Full Name")).as("unique_owners"),
      gridSnap(count(lit(1)).cast("double") / countDistinct(col("Account Number")), 6)
        .as("avg_owners_per_business"))

    val individual = cleaned.filter(col("Is Individual Owner"))
    val topFirstNames = asStructList(
      Demographics.topK(individual, "Owner First Name", 20), "top_first_names")
    val topLastNames = asStructList(
      Demographics.topK(individual, "Owner Last Name", 20), "top_last_names")
    val topRoles = asStructList(
      Demographics.topK(cleaned, "Title", 10), "top_roles")

    val namePatterns = Demographics.patternCounts(
      cleaned.filter(col("Legal Name").isNotNull), Seq(
        "llc_count" -> col("Legal Name").rlike("\\bLLC\\b"),
        "inc_count" -> col("Legal Name").rlike("\\bINC\\b"),
        "corp_count" -> col("Legal Name").rlike("\\bCORP\\b"),
        "has_digits" -> col("Legal Name").rlike("[0-9]")))
      .withColumnRenamed("n_rows", "named_businesses")

    val diversity = Demographics.shannonEntropy(individual, "Owner Last Name")
      .select(col("entropy").as("last_name_entropy"))
      .crossJoin(Demographics.giniSimpson(individual, "Owner Last Name")
        .select(col("gini_simpson").as("last_name_gini")))

    Seq(topFirstNames, topLastNames, topRoles, namePatterns, diversity)
      .foldLeft(ownership)((acc, s) => Joins.withScalar(acc, s))
      .select(
        struct(col("total_records"), col("total_businesses"), col("unique_owners"),
          col("avg_owners_per_business")).as("ownership_patterns"),
        struct(col("top_first_names"), col("top_last_names")).as("name_demographics"),
        struct(col("top_roles")).as("role_analysis"),
        struct(col("named_businesses"), col("llc_count"), col("inc_count"),
          col("corp_count"), col("has_digits")).as("business_names"),
        struct(col("last_name_entropy"), col("last_name_gini")).as("diversity"))
  }

  /** Persist as a single JSON document (the analytics-layer report sink). */
  def writeJson(report: DataFrame, path: String): Unit =
    report.coalesce(1).write.mode("overwrite").json(path)
}
