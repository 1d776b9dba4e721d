package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.StableMath.gridSnap

/** Model-based quality filtering: a hashed bag-of-words logistic
  * regression trained and applied entirely inside Spark — the
  * fastText/CCNet-style classifier gate that sits between the heuristic
  * gates ([[TextAnalysis.qualityScore]]) and near-dedup in a
  * pretraining curation pipeline. Training-data extension beyond the
  * reference's heuristic-only filtering (its quality gates are static
  * predicates — `data_processor.py`-style null/length checks); a
  * learned gate is what production corpora actually use for "looks
  * like the trusted corpus" scoring.
  *
  * Design:
  *   - Features are the engine-portable md5 hash of each whitespace
  *     token, mod `dim` (hashing trick). No vocabulary is ever built or
  *     collected: the feature id is a pure function of the token, so
  *     the map side needs no dictionary broadcast and any engine with
  *     md5 reproduces the features bit-for-bit (the
  *     [[graft.operators.Sampling.withSplit]] discipline).
  *   - Training is full-batch gradient descent on log-loss. Each
  *     iteration is two feature-relation passes: margin per doc (join
  *     features with the broadcast dim-row weight relation, sum), then
  *     gradient per feature (join features with the per-doc residual,
  *     sum). All sums run in DECIMAL so they are order- and
  *     partitioning-independent; weights and residuals are rounded to
  *     9 dp per iteration (the PageRank rounding discipline), which
  *     makes the whole fit a pure function of the corpus — layout-,
  *     retry-, and engine-independent.
  *   - Scoring is one broadcast join + one per-doc aggregation.
  *
  * 100 TB shape: you do NOT full-batch-train on the whole corpus — fit
  * on a [[graft.operators.Sampling.withSplit]] sample (a classifier
  * with `dim` parameters saturates long before 10^6 docs), then run
  * the cheap scoring pass over everything. Per training iteration the
  * only wide ops are one shuffle of the sample's feature relation by
  * doc (margin agg re-uses the grouping) and one by feature — both
  * with map-side partial aggregation; the weight relation is dim ≤
  * 2^20 rows and always broadcast, and nothing is ever collected to
  * the driver. Scoring the full corpus is embarrassingly parallel:
  * broadcast weights, one narrow tokenize+hash pass, one per-doc sum.
  */
object QualityModel {

  // 1 integer digit + 9 fractional: shares, residuals, and weights all
  // live in [−10, 10], and (10,9)×(10,9) → DECIMAL(21,18) stays under
  // both engines' 38-digit cap WITHOUT precision-loss rescaling — the
  // products and sums are exact in Spark and DuckDB alike. (Wider
  // inputs would push the product past 38 digits and Spark would
  // silently round the scale down; DuckDB wouldn't — a portability
  // trap, not a theoretical one.)
  private val dec9 = DecimalType(10, 9)

  /** Largest 9-dp value DECIMAL(10,9) holds — the weight clamp bound
    * (mirrors in SQL as `GREATEST(-9.999999999, LEAST(9.999999999, …))`).
    */
  val WeightBound = 9.999999999

  /** Engine-portable feature id: first 8 md5 hex digits of the token,
    * as a long, mod `dim` — always in [0, dim). Mirrors in any SQL
    * engine as `CAST(('0x' || substring(md5(tok),1,8)) AS BIGINT) % dim`.
    */
  def featureId(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim

  /** Hashed bag-of-words feature relation: one row per (doc, feature)
    * with the raw token count `cnt` and the length-normalized share
    * `x` = gridSnap(cnt / doc token count, 9 dp) — the fastText input
    * convention. Normalized shares (Σ_f x = 1 per doc) keep every
    * margin a weighted MEAN of token weights, so gradient steps can't
    * saturate the sigmoid on long documents the way raw counts do.
    * Tokens are lowercased whitespace tokens (the [[TextAnalysis]]
    * tokenization convention); empty tokens from whitespace runs are
    * dropped. Documents with no tokens contribute no rows — they carry
    * no evidence either way and score sigmoid(0) = 0.5 at apply time.
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     dim: Int): DataFrame = {
    require(dim > 0, s"feature dimension must be positive, got $dim")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
    // Two exchanges by design, NOT a pre-repartition on id: the
    // groupBy's map-side partial aggregation collapses repeated tokens
    // before anything moves, so the (id, feat) exchange and the
    // window's id exchange both carry the SMALL aggregated relation.
    // Repartitioning the raw token explode by id first would be one
    // exchange — of the unaggregated token rows, ~avg-token-multiplicity
    // larger, with every giant document concentrated on one partition.
    df.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("_tok"))
      .where(col("_tok") =!= "")
      .groupBy(col(idCol), featureId(col("_tok"), dim).as("feat"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("x",
        gridSnap(col("cnt").cast("double") / sum(col("cnt")).over(byDoc), 9)
          .cast(dec9))
  }

  /** Fit logistic-regression weights by `iters` rounds of full-batch
    * gradient descent from w = 0. Returns the dim-row (at most — only
    * features observed in the corpus appear) weight relation
    * `(feat, w)`, with w rounded to 9 dp.
    *
    * `labelCol` must be a 0/1 numeric column (e.g. the output of a
    * trusted-vs-crawl union, or a heuristic seed label). The update is
    * per-feature mass-normalized gradient descent (diagonal
    * preconditioning — the plain 1/n step shrinks with the corpus and
    * a rare feature would never move):
    *   w_f ← gridSnap(w_f − lr · Σ_docs (gridSnap(σ(margin), 9) − y) · x_f
    *                        / Σ_docs x_f, 9)
    * so a feature exclusive to the positive class moves by +lr/2 in
    * round one regardless of corpus size or feature frequency. Every
    * Σ is a DECIMAL sum, so two runs over any layout of the same rows
    * produce identical weights.
    */
  def trainLogistic(df: DataFrame, idCol: String, textCol: String,
                    labelCol: String, dim: Int = 256, iters: Int = 2,
                    lr: Double = 0.5): DataFrame =
    trainLogisticOn(hashedFeatures(df, idCol, textCol, dim),
      df.select(col(idCol), col(labelCol)), idCol, labelCol, iters, lr)

  /** Dense-vector feature relation: one row per (id, dimension index)
    * with `x` = gridSnap(component, 9 dp) — the embedding-space
    * counterpart of [[hashedFeatures]] (a semantic quality gate over
    * the `embeddings` table instead of a lexical one over `documents`).
    * float→double widening is value-exact, so the 9-dp rounding is the
    * only lossy step and both engines agree on it. Mirrors in DuckDB
    * as `UNNEST(vec)` zipped with `generate_subscripts(vec, 1) − 1`.
    */
  def vectorFeatures(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("feat", "_v")))
      .select(col(idCol), col("feat").cast("long").as("feat"),
        gridSnap(col("_v").cast("double"), 9).cast(dec9).as("x"))

  /** The generic GD core: fit weights over ANY feature relation
    * `(idCol, feat: long, x: DECIMAL(10,9))` — sparse hashed text
    * shares ([[hashedFeatures]]) or dense embedding components
    * ([[vectorFeatures]]) — against `labels` `(idCol, labelCol)`.
    *
    * `norm` picks the per-feature step divisor:
    *   - `"mass"` (the [[trainLogistic]] default): divide by Σ_docs x_f
    *     — diagonal preconditioning for NON-NEGATIVE features (token
    *     shares), where the plain 1/n step would let rare features
    *     crawl. Requires positive per-feature mass; signed features
    *     can drive Σx toward 0 and blow the step up.
    *   - `"count"`: divide by the feature's row count — the safe mean
    *     gradient for signed dense features (embeddings).
    *
    * `init` warm-starts from an existing `(feat, w)` relation (the
    * online-refresh path, [[graft.stream.Streaming]]'s logistic batch
    * step): the weight table becomes the UNION of prior and observed
    * features — unseen-before features enter at 0, and features the
    * current rows never touch keep their prior weight through every
    * round (their gradient is structurally zero).
    */
  def trainLogisticOn(features: DataFrame, labels: DataFrame, idCol: String,
                      labelCol: String, iters: Int, lr: Double,
                      norm: String = "mass",
                      init: Option[DataFrame] = None): DataFrame = {
    require(iters > 0, s"iteration count must be positive, got $iters")
    require(norm == "mass" || norm == "count",
      s"norm must be 'mass' or 'count', got '$norm'")
    val reserved = Set("feat", "cnt", "x", "w", "_tok", "_y", "_m", "_r",
      "_g", "_c", "_gs", "_mass")
    require(!reserved.contains(idCol) && !reserved.contains(labelCol),
      s"idCol/labelCol collide with trainLogisticOn's working names " +
        s"(${reserved.mkString(", ")}) — rename them first")
    // The feature relation is consumed twice per iteration (margin agg
    // + gradient join) — materialize it once.
    val feats = features
      .join(labels.select(col(idCol), col(labelCol).cast("long").as("_y")),
        idCol)
      .localCheckpoint()
    val observed = feats.select(col("feat")).distinct()
    var w = (init match {
      case None => observed.withColumn("w", lit(0.0))
      case Some(prior) => prior
        .select(col("feat"), col("w").cast("double").as("w"))
        .join(observed, Seq("feat"), "full")
        .na.fill(0.0, Seq("w"))
    }).localCheckpoint()
    for (_ <- 1 to iters) {
      // Margin per doc: exact DECIMAL dot product of 9-dp weights with
      // 9-dp shares — order-independent by construction.
      val margins = feats.join(broadcast(w), "feat")
        .withColumn("_c", col("w").cast(dec9) * col("x"))
        .groupBy(col(idCol), col("_y"))
        .agg(sum(col("_c")).as("_m"))
      // Residual σ(margin) − y, rounded to 9 dp: the only non-exact
      // step per iteration is the sigmoid itself, truncated well above
      // double-ulp noise so both engines agree.
      val resid = margins.select(col(idCol),
        (gridSnap(lit(1.0) / (lit(1.0) + exp(-col("_m").cast("double"))), 9)
          - col("_y")).as("_r"))
      // Gradient and step divisor per feature in ONE aggregation —
      // all exact DECIMAL/long sums over the same joined rows.
      val grad = feats.join(resid, idCol)
        .withColumn("_g", col("_r").cast(dec9) * col("x"))
        .groupBy(col("feat"))
        .agg(sum(col("_g")).as("_gs"),
          (if (norm == "mass") sum(col("x")) else count(lit(1)))
            .as("_mass"))
      // LEFT join: with no init every weight row has a gradient (w =
      // observed features), so this is the old inner join; with a
      // warm start, prior-only features carry no gradient and keep
      // their weight unchanged. The update is clamped to the
      // DECIMAL(10,9)-representable band: past ±10 Spark's non-ANSI
      // cast would turn the weight into NULL and sum() would silently
      // drop the model's strongest feature from every margin — the
      // sigmoid is saturated long before ±10 anyway, so the clamp
      // changes nothing in-range and prevents silent corruption out of
      // range (an aggressive lr, or many warm-started online rounds of
      // one-sided evidence, can get there). localCheckpoint cuts the
      // per-iteration lineage (w is consumed twice next round).
      w = w.join(grad, Seq("feat"), "left")
        .select(col("feat"),
          when(col("_gs").isNull, col("w"))
            .otherwise(greatest(lit(-WeightBound), least(lit(WeightBound),
              gridSnap(col("w") - lit(lr)
                * (col("_gs").cast("double") / col("_mass").cast("double")),
                9))))
            .as("w"))
        .localCheckpoint()
    }
    w
  }

  /** Score documents with a trained weight relation: `(idCol, score)`
    * with score = σ(Σ w·x) over the length-normalized shares x —
    * the same feature convention the trainer fits on. Weights are
    * broadcast (dim-bounded); docs with no in-vocabulary token —
    * including empty docs — score σ(0) = 0.5 via the left join's null
    * sum. This is the full-corpus pass: narrow tokenize+hash, one
    * per-doc aggregation, no other shuffle.
    */
  def scoreLogistic(df: DataFrame, weights: DataFrame, idCol: String,
                    textCol: String, dim: Int): DataFrame =
    scoreLogisticOn(hashedFeatures(df, idCol, textCol, dim), weights,
      df.select(col(idCol)), idCol)

  /** Generic scoring: σ(Σ w·x) rounded to 9 dp, for every id in `ids`
    * — ids with no feature row (or only out-of-vocabulary features)
    * fall back through the left joins to σ(0) = 0.5. Weights are
    * assumed in the trained band |w| ≤ [[WeightBound]] (the trainer
    * clamps); an out-of-band hand-built weight would null out under
    * the DECIMAL cast.
    */
  def scoreLogisticOn(features: DataFrame, weights: DataFrame,
                      ids: DataFrame, idCol: String): DataFrame = {
    val reserved = Set("feat", "cnt", "x", "w", "_c", "_m", "score")
    require(!reserved.contains(idCol),
      s"idCol collides with scoreLogisticOn's working names " +
        s"(${reserved.mkString(", ")}) — rename it first")
    val margins = features
      .join(broadcast(weights), Seq("feat"), "left")
      .withColumn("_c", coalesce(col("w"), lit(0.0)).cast(dec9) * col("x"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("_m"))
    ids.join(margins, Seq(idCol), "left")
      .select(col(idCol),
        gridSnap(lit(1.0) / (lit(1.0)
          + exp(-coalesce(col("_m").cast("double"), lit(0.0)))), 9)
          .as("score"))
  }
}
