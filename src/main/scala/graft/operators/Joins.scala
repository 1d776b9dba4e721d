package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaped operators from SURVEY.md §2.3 that need a deliberate
  * Spark formulation to stay scalable.
  */
object Joins {

  /** Disjunctive (OR-of-equi-conjunctions) join — `etl/pipeline.py:393-396`
    * joins `ON (first=first AND last=last) OR (legal_entity=legal_entity)`.
    *
    * A raw OR condition forces Spark into BroadcastNestedLoopJoin (O(n·m)
    * — unusable at scale). Rewritten as a union of hash joins, deduped on
    * the output key columns: each disjunct shuffles on its own equi keys,
    * so the whole thing stays O(n+m) per disjunct.
    */
  def orEquiJoin(left: DataFrame, right: DataFrame,
                 disjuncts: Seq[Column], dedupKeys: Seq[String]): DataFrame =
    disjuncts
      .map(cond => left.join(right, cond, "inner"))
      .reduce(_ unionByName _)
      .dropDuplicates(dedupKeys)

  /** Anti-join orphan check (`etl/pipeline.py:574-590`): rows of `fact`
    * whose key has no match in `dim`. left_anti keeps only fact columns
    * and never materializes matches.
    */
  def orphans(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(dim, keys, "left_anti")

  /** Upsert emulation (`ON CONFLICT DO UPDATE`, `etl/pipeline.py:314-318`
    * et al.) without a transactional table format: keep every old row
    * whose key is absent from `updates` (anti join), union the updates.
    *
    * At scale both sides shuffle once on `keys`; if `updates` is small
    * Catalyst broadcasts it and the old table never shuffles. Callers
    * writing to a lake should write to a temp path and swap (the
    * atomicity note in SURVEY §7).
    */
  def upsert(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(updates, keys, "left_anti").unionByName(updates)

  /** Scalar "subquery" (`etl/pipeline.py:517-522`): attach a 1-row
    * aggregate to every row of `df` without a shuffle — Catalyst plans
    * the cross join of a 1-row side as broadcast.
    */
  def withScalar(df: DataFrame, scalar: DataFrame): DataFrame =
    df.crossJoin(broadcast(scalar))

  /** Anti join with a Bloom-filter pre-filter — "which of these N new
    * documents are NOT already in the corpus?" when the corpus key set
    * is far too big to broadcast but a few bits per key fit anywhere.
    *
    * Exactness: a Bloom filter has no false negatives, so every
    * bloom-negative row is provably absent from `right` and short-
    * circuits past the join; only the bloom-positive sliver (true
    * matches + ~fpp false positives) pays the exact left_anti. The
    * union is bit-identical to a plain `left.join(right, key,
    * "left_anti")` at any fpp — fpp tunes cost, never correctness.
    *
    * Scale shape: `right` is scanned once to build the sketch
    * (`stat.bloomFilter` — distributed aggregation, driver holds only
    * the final bit array) which broadcasts at ~1.2 bytes/key at 3% fpp;
    * the big `left` side then shuffles only its bloom-positive sliver
    * into the confirming join instead of all of it. With a mostly-new
    * left (the common ingest case) that cuts the anti-join shuffle by
    * 1/fpp. The `mightContain` probe is a closure over the broadcast
    * sketch (no codegen) — acceptable because it REPLACES a shuffle,
    * not a codegen'd expression; everything around it stays fused.
    *
    * Cost honesty: the two complementary filters are separate plan
    * branches, so `left` (scan + any upstream projection) is evaluated
    * TWICE. That trade is deliberate — two columnar scans are far
    * cheaper than the full shuffle of `left` a plain anti join pays,
    * and scans pipeline while shuffles barrier. If `left` is an
    * expensive derivation rather than a scan, persist it first (or
    * accept the recompute); don't "fix" this with a checkpoint inside
    * the operator — that pins partitioning and spills 100 TB to disk.
    */
  def antiJoinBloom(left: DataFrame, right: DataFrame, keyCol: String,
                    expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    // String keys only: the sketch hashes the column's native type, so a
    // long-keyed probe through the string path would silently miss.
    Seq(left, right).foreach { side =>
      require(side.schema(keyCol).dataType ==
        org.apache.spark.sql.types.StringType,
        s"antiJoinBloom expects a string key, got ${side.schema(keyCol).dataType} for '$keyCol'")
    }
    val bloom = right.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bloom)
    // Null keys probe false → routed to the "definitely new" branch —
    // the same rows a plain left_anti keeps (null never equi-matches).
    val might = udf((k: String) => k != null && bc.value.mightContainString(k))
    val definitelyNew = left.filter(!might(col(keyCol)))
    val confirmed = left.filter(might(col(keyCol)))
      .join(right.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(confirmed)
  }

  /** Blocked fuzzy join (record linkage): pairs whose string keys are
    * within Levenshtein distance `maxDist`, found WITHOUT the O(n·m)
    * all-pairs scan. Multi-pass blocking — the standard industrial
    * shape (Fellegi–Sunter linkage pipelines): each pass derives a
    * cheap blocking key from the string (prefix, suffix, a stable
    * substring...); candidates are pairs agreeing on ≥ 1 pass's key,
    * generated by ONE hash equi-join on (pass index, key value); the
    * exact Levenshtein verifier then decides. A length-difference
    * pre-filter (|len_a − len_b| ≤ maxDist, a Levenshtein lower bound)
    * discards impossible candidates before the O(len²) edit-distance
    * kernel runs.
    *
    * Semantics are "agrees on ≥1 blocking key AND within maxDist" — the
    * blocking is part of the contract, not a silent recall loss: a pair
    * whose edits disturb every blocking key is out of scope by
    * definition (callers choose passes to cover their error model; the
    * default prefix+suffix passes catch any single edit cluster away
    * from one end). Scale: Σ block² candidate work, governed by the
    * selectivity of the caller's keys; every stage is a hash shuffle.
    */
  /** Bin-bucketed interval join — `point ∈ [start, end]` matching over
    * NUMERIC columns (epoch days/seconds; callers convert temporals).
    *
    * The direct formulation (`points.join(intervals, p.between(s, e))`)
    * has no equi key, so Spark plans a BroadcastNestedLoopJoin —
    * O(points·intervals) comparisons, unusable at scale. Binning
    * restores a hash key: points land in bin ⌊p/binWidth⌋; each
    * interval explodes to every bin its span covers; an equi-join on
    * the bin finds all candidates, and the exact BETWEEN re-check
    * removes same-bin near-misses. Identical results to the nested
    * loop (property-tested), but the join is a plain shuffled/broadcast
    * hash join: work is O(points + Σ span/binWidth + true matches).
    *
    * Pick `binWidth` ≈ the typical interval span: much smaller
    * multiplies the interval side's explode factor; much larger piles
    * unrelated candidates into each bin for the residual filter to
    * discard. Both degrade gracefully (correctness never depends on
    * the width). Hot bins (a burst window every interval covers) are
    * ordinary join skew — AQE skew-join or salting applies unchanged.
    * Intervals with `end < start` are empty by definition and match
    * nothing; null endpoints/points drop (SQL three-valued BETWEEN
    * would reject them anyway).
    */
  def intervalJoin(points: DataFrame, pointCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.where(col(pointCol).isNotNull)
      .withColumn("_bin", floor(col(pointCol) / binWidth))
    val iv = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .withColumn("_bin", explode(sequence(
        floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(iv, Seq("_bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }

  def blockedFuzzyJoin(left: DataFrame, leftId: String, leftKey: String,
                       right: DataFrame, rightId: String, rightKey: String,
                       maxDist: Int,
                       blockKeys: Seq[Column => Column] = Seq(
                         k => substring(k, 1, 4), k => substring(k, -4, 4)))
      : DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockKeys.nonEmpty, "at least one blocking pass is required")
    def blocked(df: DataFrame, id: String, key: String) = {
      val passes = blockKeys.zipWithIndex.map { case (bk, i) =>
        struct(lit(i).as("pass"), bk(col(key)).as("bv"))
      }
      df.select(col(id), col(key), explode(array(passes: _*)).as("_b"))
        .select(col(id), col(key), col("_b.pass").as("_pass"),
          col("_b.bv").as("_bv"))
        .filter(col("_bv").isNotNull)
    }
    blocked(left, leftId, leftKey)
      .join(blocked(right, rightId, rightKey), Seq("_pass", "_bv"))
      .drop("_pass", "_bv")
      .dropDuplicates(leftId, rightId)
      .filter(abs(length(col(leftKey)) - length(col(rightKey))) <= maxDist)
      // threshold form: banded O(len·maxDist) DP with early exit (−1
      // when the distance exceeds maxDist) instead of the full
      // O(len²) matrix — same kept rows, same dist values for them
      .withColumn("dist", levenshtein(col(leftKey), col(rightKey), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }
}
