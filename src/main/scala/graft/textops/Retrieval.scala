package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.StableMath.gridSnap

/** Hybrid-retrieval composition: fuse independently-produced ranked
  * lists (lexical BM25, dense cosine, …) into one ranking. The
  * reference's search surface is single-signal substring containment
  * (`api/main.py:135`); a training pipeline needs the hybrid form for
  * retrieval-augmented dedup triage and eval-set construction, where
  * neither signal alone ranks well.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * each input list contributes 1/(k + rank) per document; documents
    * missing from a list contribute nothing for it. RRF is the
    * fusion that needs NO score calibration — only ranks — which is
    * why it is the standard first choice for lexical+dense hybrids.
    *
    * Every input is a TOP-K RELATION (the output of a retrieval
    * operator), so the global rank window runs over ≤ topK rows per
    * list — the aggregate-then-window discipline, never a corpus-wide
    * sort. Ranks are deterministic: score DESC, id ASC. Per-id
    * contributions are DECIMAL-summed (order-independent across any
    * partitioning and engine) and rounded to 6 dp.
    *
    * Returns (idCol, rrf_score, n_lists) — `n_lists` is how many
    * input lists surfaced the document, a useful confidence signal.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String,
              k: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k >= 0, s"rank constant must be non-negative, got $k")
    val contribs = lists.map { df =>
      df.select(col(idCol),
          row_number().over(
            Window.orderBy(desc(scoreCol), asc(idCol))).as("_r"))
        .select(col(idCol),
          (lit(1.0) / (lit(k) + col("_r"))).cast(DecimalType(38, 18)).as("_c"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(gridSnap(sum(col("_c")).cast("double"), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
  }
}
