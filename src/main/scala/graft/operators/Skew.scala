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
}
