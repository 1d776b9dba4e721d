package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableMath.gridSnap

/** Deterministic dataset splitting and sampling for training-data
  * pipelines. Split assignment must be reproducible across runs,
  * clusters, and data layouts — so it derives from a content hash of a
  * key, never from RNG state or partition position (`rand()` changes
  * under repartitioning; a hash never does). The same property gives
  * leakage-safe splits: every row with the same key lands on the same
  * side forever, even across dataset versions.
  */
object Sampling {

  /** Stable bucket in [0, 100) from the md5 of the key. md5 (not
    * xxhash64) so the assignment is portable across engines — any
    * system that can md5 a string reproduces the split exactly (the
    * DuckDB oracle does).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Deterministic train/test split: rows whose key bucket falls below
    * `testPct` go to "test". Pure projection — no shuffle, no RNG.
    */
  def withSplit(df: DataFrame, keyCol: String, testPct: Int): DataFrame = {
    require(testPct >= 0 && testPct <= 100, s"testPct must be 0..100, got $testPct")
    df.withColumn("split",
      when(hashBucket(col(keyCol)) < testPct, "test").otherwise("train"))
  }

  /** Stratified sample: per-stratum keep fractions (class balancing /
    * downsampling the majority stratum). Seeded Bernoulli sampling per
    * row — approximate counts, exact strata.
    */
  def stratified(df: DataFrame, strataCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Fine-grained stable bucket in [0, 2^24) — 6 md5 hex digits. The
    * percent-granular [[hashBucket]] is too coarse for corpus-mixing
    * fractions like 0.0042; 24 bits give ~6e-8 granularity while
    * keeping the same engine-portable md5 derivation.
    */
  def fineBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 6), 16, 10).cast("long")

  /** Corpus mixing: deterministically downsample each source to a
    * per-source token budget. The keep fraction for source s is
    * `min(1, targetTokens / total_tokens_s)` and a row survives iff its
    * key's [[fineBucket]] falls under that fraction — so the sampled
    * token mass lands on the target in expectation, oversampled sources
    * shrink, under-target sources pass through whole, and membership is
    * a pure function of the key (stable across runs, layouts, engines).
    *
    * Scale shape: the per-source totals relation is |sources| rows —
    * aggregated map-side, then joined back by broadcast. The big side
    * never shuffles: one scan, one broadcast hash join, one map-side
    * filter. (A window-over-source formulation would shuffle the full
    * corpus on a skewed key; this form moves only the totals.)
    */
  def sampleToTokenBudget(df: DataFrame, sourceCol: String, keyCol: String,
                          tokensCol: String, targetTokens: Long): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive, got $targetTokens")
    val clash = df.columns.filter(Set("_source_tokens", "keep_frac").contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with sampleToTokenBudget's " +
        "working/output names (_source_tokens, keep_frac) — rename them first")
    // SQL-engine semantics the oracle shares: a null key hashes to a
    // null bucket and a null source never equi-matches the totals —
    // both are EXCLUDED from the sample. Keys and sources should be
    // non-null (they are ids); the output adds a `keep_frac` column
    // with the source's applied fraction.
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).as("_source_tokens"))
    val frac = least(lit(1.0),
      lit(targetTokens.toDouble) / col("_source_tokens").cast("double"))
    df.join(broadcast(totals), Seq(sourceCol))
      .withColumn("keep_frac", frac)
      .filter(fineBucket(col(keyCol)).cast("double") <
        col("keep_frac") * lit((1L << 24).toDouble))
      .drop("_source_tokens")
  }

  /** Temperature-weighted corpus mixing — the standard multi-source /
    * multilingual LLM recipe: source s gets target share
    * w_s = T_s^α / Σ T^α of a total token budget (α = 1 keeps natural
    * proportions; α → 0 approaches uniform; α ≈ 0.3–0.7 upweights
    * tail sources at the head's expense). Keep fraction per source is
    * min(1, budget·w_s / T_s); membership is the same engine-portable
    * [[fineBucket]] hash as [[sampleToTokenBudget]], so the sample is
    * a pure function of the key.
    *
    * Numeric discipline: the α-powers are rounded to 9 dp and summed
    * as DECIMAL (a raw double Σ T^α would depend on the totals
    * relation's partition order — cross-engine pow noise below 1e-9 is
    * rounded away, and the sum is then order-exact); the final keep
    * fraction is rounded to 9 dp before the bucket compare so both
    * sides of an oracle see identical boundaries. Scale shape as
    * [[sampleToTokenBudget]]: totals are |sources| rows aggregated
    * map-side; the corpus never shuffles — one scan, one broadcast
    * join, one map-side filter. Output adds `mix_frac`.
    */
  def sampleWithTemperature(df: DataFrame, sourceCol: String, keyCol: String,
                            tokensCol: String, totalTokens: Long,
                            alpha: Double): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val clash = df.columns.filter(Set("_t", "_w", "_ws", "mix_frac").contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with " +
        "sampleWithTemperature's working/output names — rename them first")
    val dec = org.apache.spark.sql.types.DecimalType(38, 9)
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).as("_t"))
      .withColumn("_w", gridSnap(pow(col("_t").cast("double"), lit(alpha)), 9))
    val wsum = totals.agg(sum(col("_w").cast(dec)).cast("double").as("_ws"))
    val fracs = totals.crossJoin(broadcast(wsum))
      .withColumn("mix_frac", gridSnap(least(lit(1.0),
        lit(totalTokens.toDouble) * col("_w") / col("_ws")
          / col("_t").cast("double")), 9))
      .select(col(sourceCol), col("mix_frac"))
    df.join(broadcast(fracs), Seq(sourceCol))
      .filter(fineBucket(col(keyCol)).cast("double") <
        col("mix_frac") * lit((1L << 24).toDouble))
  }

  /** Deterministic global training-order shuffle: every row gets a
    * stable position `outCol` = its rank under `md5(seed \\0 key)`
    * (key as tie-break). Reordering a 100 TB corpus is a range shuffle
    * no matter what; what this buys is reproducibility — same seed,
    * same order, on any cluster, any partitioning, any engine that can
    * md5. The rank comes from [[Ranking.globalRowNumber]], so there is
    * no single-partition window anywhere.
    *
    * The NUL byte between seed and key keeps distinct (seed, key)
    * pairs distinct — bare concatenation would make seed "epoch1" +
    * key "23" collide with "epoch12" + "3", correlating epochs that
    * must shuffle independently. `keyCol` must be UNIQUE and non-null:
    * duplicate keys tie on both order expressions, and
    * [[Ranking.globalRowNumber]] requires a total order for
    * deterministic output.
    */
  def shuffleOrder(df: DataFrame, keyCol: String, seed: String,
                   outCol: String = "ord"): DataFrame = {
    require(!df.columns.contains("_shuffle_key"),
      "input already has a _shuffle_key column — rename it first")
    Ranking.globalRowNumber(
        df.withColumn("_shuffle_key",
          md5(concat(lit(seed), lit("\u0000"), col(keyCol).cast("string")))),
        Seq(col("_shuffle_key"), col(keyCol)), outCol)
      .drop("_shuffle_key")
  }

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis 2006
    * A-ES, public "Weighted random sampling with a reservoir"): each
    * row draws a deterministic uniform u from 52 md5 bits of its key
    * and competes with exponential key −ln(u)/w; the k smallest win.
    * This yields the distribution of sequential weighted draws without
    * replacement, but as a pure projection + top-k: no sequential
    * state, no RNG — TakeOrdered keeps k rows per partition and
    * merges, so a 100 TB corpus is one scan, no shuffle.
    *
    * Everything is engine-portable arithmetic (md5, exact
    * 52-bit-to-double conversion, ln): same key + salt ⇒ the same
    * sample on any cluster, layout, or engine. The key is rounded to
    * 6 dp with an id tie-break so cross-engine ULP noise in `ln`
    * cannot reorder the boundary. Rows with non-positive or null
    * weight never win (A-ES is undefined there) — they are filtered.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column,
                     k: Int, salt: String = "", outCol: String = "es_key")
      : DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    require(!df.columns.contains(outCol),
      s"input already has a $outCol column — rename it first")
    // 13 hex chars = 52 bits < 2^53: exact in double in any engine.
    // NUL-separated salt+key, as in shuffleOrder: distinct pairs stay
    // distinct under concatenation.
    val v = conv(substring(md5(concat(lit(salt), lit("\u0000"),
      col(keyCol).cast("string"))), 1, 13), 16, 10).cast("double")
    val u = (v + lit(1.0)) / lit(4503599627370497.0) // 2^52 + 1 ⇒ u ∈ (0,1]
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn(outCol, gridSnap(-log(u) / weightCol.cast("double"), 6))
      .orderBy(asc(outCol), col(keyCol).asc)
      .limit(k)
  }

  /** Exactly `n` rows per stratum, deterministic, WITHOUT a per-group
    * sort — the exact-count counterpart of [[stratified]]'s Bernoulli
    * fractions (eval-set construction wants "exactly 1000 per
    * language", not "about"). Each row draws the engine-portable
    * 52-bit md5 uniform of its key (the [[weightedSample]]
    * derivation); a k-bounded [[graft.functions.TopKAggregator]] keeps
    * each stratum's n largest uniforms — map-side partials carry ≤n
    * entries per stratum, so the exchange is O(strata·n) and no
    * stratum is ever sorted (the window formulation sorts every row of
    * every stratum; a hot stratum at 100 TB sorts billions of rows to
    * keep a thousand). Strata with ≤ n rows pass through whole.
    * Membership is a pure function of (salt, key): stable across runs,
    * layouts, and engines. `keyCol` must be integral (the id rides the
    * bounded buffer as a long) and (strataCol, keyCol) pairs must be
    * DISTINCT across rows: winners are re-selected by key VALUE via a
    * left_semi join, so a duplicated pair brings back every row that
    * shares it and the stratum returns more than `n` rows. With a
    * per-row unique key (the intended use — a surrogate or primary
    * key) the count is exactly min(n, stratum size).
    */
  def stratifiedExactN(df: DataFrame, strataCol: String, keyCol: String,
                       n: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"per-stratum sample size must be positive, got $n")
    val clash = df.columns.filter(Set("_g", "_wid").contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with " +
        "stratifiedExactN's working names (_g, _wid) — rename them first")
    val v = conv(substring(md5(concat(lit(salt), lit("\u0000"),
      col(keyCol).cast("string"))), 1, 13), 16, 10).cast("double")
    val u = (v + lit(1.0)) / lit(4503599627370497.0)
    val winners = df
      .select(col(strataCol).as("_g"), col(keyCol).cast("long").as("_id"),
        u.as("_u"))
      .groupBy("_g")
      .agg(graft.functions.TopKAggregator.topK(n, col("_u"), col("_id"))
        .as("_top"))
      .select(col("_g"), explode(col("_top")).as("_e"))
      .select(col("_g"), col("_e.id").as("_wid"))
    df.join(winners,
      col(strataCol) === col("_g") && col(keyCol).cast("long") === col("_wid"),
      "left_semi")
  }
}
