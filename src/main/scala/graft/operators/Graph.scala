package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as DataFrame plans — the Pregel-style
  * pattern already used by the dedup connected-components pass
  * (`textops/Dedup.connectedComponents`), here for ranking. The
  * reference's "network analysis" is a plain owner→business count
  * table (`enhanced_streamlit_app.py:203-216`); PageRank is the
  * centrality upgrade for the same data shape (who anchors a
  * duplication cluster, which supplier anchors a market).
  */
object Graph {

  /** PageRank with a fixed iteration count over the SYMMETRIZED graph
    * (both directions of every edge; guarantees no dangling nodes, so
    * no rank mass leaks and no redistribution pass is needed).
    *
    * Determinism across engines and layouts: per-edge contributions
    * are computed in double (identical bits everywhere), DECIMAL-cast
    * before the incoming-edge SUM (order-independent — a raw double
    * sum would depend on partitioning), and each iteration's rank is
    * rounded to 10 dp as PART OF THE ALGORITHM, so two engines can
    * never drift. Per iteration: one join of edges against the k-row
    * rank relation + one hash aggregation on the destination —
    * `localCheckpoint` truncates the lineage exactly as in the CC
    * loop. Returns (node, rank) with rank rounded to 6 dp.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               damping: Double = 0.85, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iteration count must be positive, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // Degrees double as the node relation (symmetrized ⇒ every node is
    // a src): one aggregation yields deg, nodes, AND the count — no
    // separate distinct passes, and the checkpoint stops the
    // iterations from re-aggregating the edge relation each round.
    val deg = und.groupBy("src").agg(count(lit(1)).as("_deg"))
      .localCheckpoint()
    val n = deg.agg(count(lit(1)).as("_n"))
    var ranks = deg.select(col("src").as("node"))
      .crossJoin(broadcast(n))
      .withColumn("rank", round(lit(1.0) / col("_n"), 10))
      .localCheckpoint()
    val dec = org.apache.spark.sql.types.DecimalType(38, 16)
    for (_ <- 1 to iters) {
      val contrib = und
        .join(ranks.select(col("node").as("src"), col("rank"), col("_n")), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), col("_n"),
          (col("rank") / col("_deg")).cast(dec).as("_c"))
      ranks = contrib.groupBy("node")
        .agg(first(col("_n")).as("_n"),
          round(lit((1 - damping)) / first(col("_n"))
            + lit(damping) * sum(col("_c")).cast("double"), 10).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
