package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skewed side feeds a
  * co-grouped window, or the planner can't see the skew in stats).
  *
  * The skewed (large) side gets a random salt in [0, salts); the small
  * side is replicated once per salt value via `explode`. The join key
  * becomes (key, salt), splitting each hot key's rows across `salts`
  * shuffle partitions instead of one. Replication multiplies the small
  * side by `salts` — keep it for dimension-sized relations only.
  */
object SaltedJoin {

  def join(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val salted = large.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
