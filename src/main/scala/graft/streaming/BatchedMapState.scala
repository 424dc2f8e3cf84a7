package graft.streaming

import org.apache.spark.sql.streaming.MapState

/** The batched-update law for COMMUTATIVE `MapState`, shared by the
  * streaming-sketch processors (q110 count-min counters, q105 HLL
  * registers) instead of re-derived per processor (VERDICT r12 #5).
  *
  * When per-entry updates commute (counter sums, register maxes), the
  * correct state traffic per trigger is bounded by the DIRTY-ENTRY
  * count, not the row count: aggregate the whole micro-batch into a
  * local heap map first, then touch the state store once per dirty
  * entry. The difference is not cosmetic — q110's first 16× run paid
  * 6 RocksDB point-ops + 3 md5s PER ROW and grew 7.8× for 16× data;
  * batched, the same replay grew ≤2.5× (SCALE.md "streaming CM").
  * At 100 TB-scale stream volume this is the difference between state
  * IO proportional to the sketch size and state IO proportional to the
  * stream.
  */
object BatchedMapState {

  /** Merge a micro-batch's locally-aggregated `local` map into `state`
    * under a commutative-associative `combine`: one
    * `containsKey`/`getValue` + at most one `updateValue` per DIRTY
    * entry. Entries whose combined value equals the stored value skip
    * the write entirely — for idempotent combines like max, a
    * non-advancing register costs a read, never a changelog entry. */
  def mergeInto[K, V](state: MapState[K, V], local: java.util.Map[K, V],
      combine: (V, V) => V): Unit =
    local.forEach { (k, v) =>
      if (!state.containsKey(k)) state.updateValue(k, v)
      else {
        val cur = state.getValue(k)
        val merged = combine(cur, v)
        if (merged != cur) state.updateValue(k, merged)
      }
    }
}
