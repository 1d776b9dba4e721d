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

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      (pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))).cast("int"))
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
    val hot = fact.agg(graft.functions.MisraGriesAggregator
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
