package graft.textops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic corpora for dedup benchmarking and the data-driven
  * pair-generator choice. Entirely expression-based (no driver-side
  * text building, no UDFs): document i of template t takes token p from
  * the template stream unless a per-(doc, position) hash fires the
  * mutation, so any slice of the corpus is reproducible on any executor
  * without coordination.
  *
  * The shape models boilerplate-heavy web/document corpora: `variants`
  * near-duplicate copies per template with `mutPct`% token substitutions
  * — LONG documents whose shingle buckets hold ~`variants` documents
  * each. That density is what makes the full Σ bucket² shingle join
  * explode and the AllPairs prefix filter pay off; the TPC-H-ish
  * `documents` table (short, high-entropy rows) sits at the opposite
  * pole.
  */
object SyntheticCorpus {

  /** `nTemplates × variants` documents of `docLen` tokens over a
    * `vocab`-word vocabulary; ~`mutPct`% of each variant's positions
    * are rewritten with a doc-specific token. Pairwise Jaccard between
    * same-template variants ≈ m³/(2−m³) for m = per-position match
    * rate (1−mutPct/100)² — e.g. 3% mutation → J ≈ 0.71.
    */
  def templateCorpus(spark: SparkSession, nTemplates: Int, variants: Int,
                     docLen: Int, vocab: Int = 800, mutPct: Int = 3): DataFrame =
    spark.range(nTemplates.toLong * variants)
      .withColumn("tpl", col("id") % nTemplates)
      .withColumn("toks", expr(
        s"""transform(sequence(0, ${docLen - 1}), i ->
           |  CASE WHEN pmod(xxhash64(id, i, 77), 100) < $mutPct
           |    THEN concat('w', pmod(xxhash64(id, i, 13), $vocab))
           |    ELSE concat('w', pmod(xxhash64(tpl, i), $vocab)) END)""".stripMargin))
      .select(col("id").as("doc_id"), array_join(col("toks"), " ").as("text"))
}
