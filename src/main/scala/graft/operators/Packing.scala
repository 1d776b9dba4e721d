package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
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
    * Shard and id keep their native types — the walk order is the id
    * column's OWN ordering (longs numerically, strings
    * lexicographically), so fingerprint-keyed corpora work unchanged.
    * The id should be unique within its shard: duplicate ids make the
    * walk order — and therefore pack boundaries — partition-dependent.
    * A null token count contributes 0 tokens (the row still lands in a
    * pack).
    *
    * @param tokensCol numeric column with the document's token count
    * @return input columns (shardCol, idCol, tokensCol as long) plus
    *         `pack_seq` (0-based pack index within the shard)
    */
  def packGreedy(df: DataFrame, shardCol: String, idCol: String,
                 tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(df.schema(tokensCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tokensCol '$tokensCol' must be numeric, got ${df.schema(tokensCol).dataType}")
    require(!df.columns.contains("pack_seq"),
      "input already has a pack_seq column — rename it first")
    val sorted = df
      .select(col(shardCol), col(idCol), col(tokensCol).cast("long").as(tokensCol))
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(idCol))
    val outSchema = sorted.schema
      .add("pack_seq", org.apache.spark.sql.types.LongType, nullable = false)
    sorted.mapPartitions { it =>
      // Runs of one shard are contiguous after the sort; state resets
      // at each shard boundary, so memory is O(1) per task regardless
      // of shard size. The sentinel start value differs from every real
      // shard value INCLUDING null, so the first row always resets.
      val fresh = new AnyRef
      var curShard: Any = fresh
      var acc = 0L
      var pack = -1L
      it.map { r =>
        val shard = r.get(0)
        if (shard != curShard) { curShard = shard; acc = 0L; pack = -1L }
        val tok = if (r.isNullAt(2)) 0L else r.getLong(2)
        if (pack < 0 || acc + tok > budget) { pack += 1; acc = tok }
        else acc += tok
        Row.fromSeq(r.toSeq :+ pack)
      }
    }(Encoders.row(outSchema))
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
