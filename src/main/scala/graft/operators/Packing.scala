package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assemble documents into fixed-token-budget
  * "packs" (context windows) for LLM training batches. The reference
  * pipeline stops at per-document token stats; packing is the step a
  * training pipeline runs right after curation, so it is part of the
  * training-data extension surface (BASELINE.json north star).
  *
  * Semantics (the classic greedy next-fit): within each shard, walk the
  * documents in ascending id order, accumulating token counts; when
  * adding the next document would exceed `budget`, close the pack and
  * open a new one. A document larger than the whole budget still gets a
  * pack of its own (the accumulator resets to its size, and the next
  * document necessarily opens a new pack). Deterministic — a pure
  * function of (shard, id-order, token counts), never of partitioning.
  *
  * Scale shape: packing is inherently sequential WITHIN a shard (each
  * pack boundary depends on every prior document), so the shard is the
  * parallelism unit — one hash shuffle on the shard column, a
  * sort-within-partitions on (shard, id), then a single streaming pass
  * with O(1) state per task. 100 TB across ~10^5 source shards
  * parallelizes perfectly; one mega-shard serializes by construction
  * (the order-dependence is the semantics), so choose shards
  * accordingly (source, source×date, …). No driver state, no collect.
  */
object Packing {

  /** Pack `df` rows into per-shard greedy packs.
    *
    * @param tokensCol integral column with the document's token count
    * @return input columns (shardCol, idCol, tokensCol) plus `pack_seq`
    *         (0-based pack index within the shard)
    */
  def packGreedy(df: DataFrame, shardCol: String, idCol: String,
                 tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(shardCol).cast("string").as("shard"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .as[(String, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .mapPartitions { it =>
        // Runs of one shard are contiguous after the sort; state resets
        // at each shard boundary, so memory is O(1) per task regardless
        // of shard size.
        var curShard: String = null
        var acc = 0L
        var pack = -1L
        it.map { case (shard, id, tok) =>
          if (shard != curShard) { curShard = shard; acc = 0L; pack = -1L }
          if (pack < 0 || acc + tok > budget) { pack += 1; acc = tok }
          else acc += tok
          (shard, id, tok, pack)
        }
      }
      .toDF(shardCol, idCol, tokensCol, "pack_seq")
  }

  /** Pack-level summary: documents and token mass per pack. Every pack
    * except possibly the last of each shard is within budget (unless a
    * single oversized document forced an overflow pack).
    */
  def packSummary(packed: DataFrame, shardCol: String,
                  tokensCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("pack_seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("pack_tokens"))
      .orderBy(col(shardCol), col("pack_seq"))
}
