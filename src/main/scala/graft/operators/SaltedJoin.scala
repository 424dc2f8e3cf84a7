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

  /** Threshold-gated broadcast-head inner join for Zipf-skewed keys —
    * the cure for `rows ⋈ stats` where `stats` is a per-key aggregate
    * whose `fanInCol` bounds the per-key row count on the shuffle: keys
    * whose fan-in exceeds `headFanIn` (the Zipf head — "the", "of", …)
    * join via a BROADCAST of their stats rows (map-side, no hot
    * reducer); the tail joins on the shuffle with per-reducer-key rows
    * ≤ `headFanIn` by construction. Output is row-identical to
    * `rows.join(stats, Seq(key))` (every key lands on exactly one side
    * of the threshold; SkewJoinSpec pins equality on a Zipf fixture).
    *
    * Cost shape: `rows` feeds both branches, but its upstream exchange
    * is IDENTICAL in each, so ReuseExchange materializes it once and the
    * head branch adds only a map-side probe. When no key crosses the
    * threshold the head relation is empty and AQE's empty-relation
    * propagation prunes that whole branch at runtime — the gate costs
    * nothing until skew exists. The head's size is Zipf-bounded:
    * #keys with fan-in > T ≤ (total rows)/T, and in a Zipfian vocabulary
    * far fewer — at the default T=10⁷ a 10⁹-document corpus broadcasts
    * only the few-hundred-thousand-word stopword head. */
  def headBroadcast(rows: DataFrame, stats: DataFrame, key: String,
      fanInCol: String, headFanIn: Long): DataFrame =
    headBroadcast(rows, stats, Seq(key), fanInCol, headFanIn)

  /** Multi-column-key form of [[headBroadcast]] (e.g. bigram stats keyed
    * by (w1, w2) in [[graft.text.Quality.bigramCrossEntropy]]). Same
    * threshold routing; the gate applies per composite key. */
  def headBroadcast(rows: DataFrame, stats: DataFrame, keys: Seq[String],
      fanInCol: String, headFanIn: Long): DataFrame = {
    require(headFanIn > 0)
    val head = stats.filter(col(fanInCol) > headFanIn)
    // NULL fan-in routes to the TAIL (plain-join identity requires every
    // stats row to land on exactly one side; a three-valued `<=` alone
    // would drop NULL-fan-in keys from both)
    val tail = stats.filter(col(fanInCol) <= headFanIn || col(fanInCol).isNull)
    rows.join(tail, keys)
      .unionByName(rows.join(broadcast(head), keys))
  }
}
