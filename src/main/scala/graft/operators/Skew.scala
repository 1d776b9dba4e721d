package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join splitting (on by default) handles most cases at
  * runtime; this explicit salting is the static fallback for the
  * pathological shape AQE can't fix — a replicated-broadcast side that
  * is too big to broadcast and a fact side where one key dominates.
  *
  * `saltedJoin` spreads each hot fact key over `saltFactor` sub-keys
  * and replicates the dimension side once per salt value: the join
  * stays an equi hash join on (key, salt), and the hot key's rows land
  * on `saltFactor` reducers instead of one.
  */
object Skew {

  /** The salt is `xxhash64` of the WHOLE fact row — a pure function of
    * row content, so a task retry or stage recomputation reproduces the
    * identical salt for every row (unlike `rand()` or
    * `monotonically_increasing_id()`, whose values change on
    * recomputation and can disagree with shuffle files already
    * written). Duplicate rows share a salt; for a hot key whose rows
    * carry any payload variety the hash still spreads them across all
    * `saltFactor` reducers. The degenerate case is a hot key whose
    * rows are EXACT duplicates across every column (e.g. after
    * projecting away everything but the join key): all of them hash to
    * one salt and the skew silently returns. If that shape is possible,
    * keep a unique row id (a surrogate/primary key) in the projection —
    * any distinguishing column restores the spread; positional salts
    * (partition id, monotonic id) are NOT a fix, they reintroduce the
    * retry nondeterminism this salt exists to avoid.
    */
  /** Content-derived salt in [0, saltFactor): `xxhash64` over every
    * column of `fact` — deterministic under recomputation. Exposed for
    * the determinism spec.
    */
  private[graft] def stableSalt(fact: DataFrame, saltFactor: Int) =
    pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int")

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", stableSalt(fact, saltFactor))
    val saltedDim = dim
      .withColumn("_salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Sketch-driven differentiated join — the classic hot/cold split,
    * with the hot-key set DETECTED rather than configured: a
    * [[graft.functions.MisraGriesAggregator]] pass over the fact keys
    * (k-bounded state, one extra scan) surfaces every key that could
    * exceed `1/(hotCounters+1)` of the rows; fact rows with those keys
    * join against the (tiny) hot slice of the dimension by BROADCAST —
    * no shuffle ever sees the hot rows — while the cold remainder
    * takes the ordinary shuffled equi-join whose per-reducer load is
    * now bounded by the hot threshold. Union of the two halves is
    * row-identical to the plain join (spec'd).
    *
    * Versus [[saltedJoin]]: salting spreads a hot key over saltFactor
    * reducers but still shuffles every hot row and replicates the
    * whole dimension; here hot rows skip the exchange entirely and
    * only the hot dimension slice replicates (broadcast). Use salting
    * when the DIMENSION is too big to slice-broadcast even per-key —
    * i.e. when hot keys are many; the sketch tells you which regime
    * you are in before you pick.
    */
  def hotColdJoin(fact: DataFrame, dim: DataFrame, key: String,
                  hotCounters: Int = 64): DataFrame = {
    // Null keys never join (dropped by the inner join on both halves)
    // and a null landing in the MG buffer would be rejected by Catalyst
    // as a map key, so exclude them from the sketch scan up front.
    val hot = fact.where(col(key).isNotNull)
      .agg(graft.functions.MisraGriesAggregator
        .mgSketch(hotCounters, col(key).cast("string")).as("sk"))
      .select(explode(map_keys(col("sk"))).as("_hk"))
    // the ≤k hot keys broadcast as the semi/anti discriminator
    val hotFact = fact.join(broadcast(hot),
      col(key).cast("string") === col("_hk"), "left_semi")
    val coldFact = fact.join(broadcast(hot),
      col(key).cast("string") === col("_hk"), "left_anti")
    val hotDim = dim.join(broadcast(hot),
      col(key).cast("string") === col("_hk"), "left_semi")
    hotFact.join(broadcast(hotDim), Seq(key))
      .unionByName(coldFact.join(dim, Seq(key)))
  }
}
