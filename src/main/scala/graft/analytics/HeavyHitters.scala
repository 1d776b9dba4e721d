package graft.analytics

import graft.functions.Cols.bq
import graft.functions.MisraGriesAggregator.mgSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact top-N frequent keys with sketch-bounded shuffle — the
  * unbounded-cardinality upgrade of the reference's frequency tables
  * (`enhanced_streamlit_app.py:203-216` owner→count leaderboards,
  * `dl/src/analytics/queries.py` value counts): same answer, but the
  * state and shuffle are capped no matter how many distinct keys exist.
  *
  * Two passes over the data, both cardinality-bounded:
  *   1. CANDIDATES — a global [[graft.functions.MisraGriesAggregator]]
  *      sketch (k counters; map-side partials carry ≤k entries each,
  *      the merged result ≤k). Any key with frequency > total/(k+1) is
  *      guaranteed present.
  *   2. VERIFY — re-count ONLY candidate rows exactly: broadcast the
  *      ≤k candidate keys, semi-join-filter the input (rows for
  *      non-candidate keys never enter the aggregation), group by key,
  *      TakeOrdered(topN) with an explicit (count DESC, key ASC)
  *      tie-break.
  *
  * The composition is EXACT and layout-independent whenever the true
  * top-N frequencies clear total/(k+1) — size k to the head you care
  * about (k = 100·topN gives 1% headroom), not to the key space. A
  * plain `groupBy.count` + TakeOrdered materializes and shuffles every
  * distinct key; at open-vocabulary scale that is billions of groups
  * to surface ten. Here the exchange after pass 1 carries
  * O(partitions·k) rows and the pass-2 aggregate holds ≤k groups.
  *
  * Sizing honesty: if a tail key's true count ties into the top-N
  * boundary while below the guarantee threshold, it may or may not be
  * a candidate (sketch content below the bound is layout-dependent) —
  * exactly the regime where "top N" is not well-defined for a sketch
  * of that size; increase k.
  */
object HeavyHitters {

  /** Top `topN` keys of `df(keyCol)` by exact count, computed with
    * sketch-bounded state (`counters` MG counters). Nulls are excluded
    * (a null key is absence, not a value). Output: (key string, cnt),
    * ordered cnt DESC then key ASC.
    */
  def topHeavy(df: DataFrame, keyCol: String, counters: Int,
               topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    require(counters >= topN,
      s"counter budget $counters cannot resolve a top-$topN")
    val keyed = df.where(bq(keyCol).isNotNull)
      .select(bq(keyCol).cast("string").as("key"))
    val cands = keyed.agg(mgSketch(counters, col("key")).as("sketch"))
      .select(explode(map_keys(col("sketch"))).as("key"))
    keyed.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("key"))
      .limit(topN)
  }

  /** Per-GROUP top-N frequent keys — one MG sketch per group (the same
    * udaf under `groupBy`, so each group's partial state is k-bounded
    * and the exchange carries ≤k map entries per group per partition),
    * then the exact re-count of (group, candidate) pairs and a
    * row_number cut. The ranking window runs over the CANDIDATE
    * relation — at most groups·k rows, already aggregated — never over
    * the data, so "top tokens per domain at 100 TB" pays two
    * data passes and one bounded window. Exactness condition is
    * [[topHeavy]]'s, per group. Output: (groupCol, key, cnt, rank).
    */
  def topHeavyPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                       counters: Int, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    require(counters >= topN,
      s"counter budget $counters cannot resolve a top-$topN")
    val keyed = df.where(bq(keyCol).isNotNull && bq(groupCol).isNotNull)
      .select(bq(groupCol).as("grp"), bq(keyCol).cast("string").as("key"))
    val cands = keyed.groupBy("grp")
      .agg(mgSketch(counters, col("key")).as("sketch"))
      .select(col("grp"), explode(map_keys(col("sketch"))).as("key"))
    // no broadcast hint here: the candidate relation is groups·k rows,
    // bounded per group but not globally — AQE picks broadcast when
    // groups are few and a shuffled semi-join when they are not
    val counted = keyed.join(cands, Seq("grp", "key"), "left_semi")
      .groupBy("grp", "key").agg(count(lit(1)).as("cnt"))
    counted
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(desc("cnt"), asc("key"))))
      .where(col("rank") <= topN)
      .withColumnRenamed("grp", groupCol)
  }
}
