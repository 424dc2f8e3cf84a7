package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.MapState
import graft.streaming.BatchedMapState

/** Pins the shared batched-update law for commutative MapState
  * (VERDICT r12 #5): state traffic per merge is bounded by DIRTY
  * entries, and non-advancing idempotent merges (max that doesn't
  * advance) never write. */
class BatchedMapStateSpec extends AnyFunSuite {

  /** In-memory MapState double that counts store touches. */
  final class FakeMapState[K, V] extends MapState[K, V] {
    val backing = scala.collection.mutable.Map.empty[K, V]
    var reads = 0
    var writes = 0
    override def exists(): Boolean = backing.nonEmpty
    override def getValue(key: K): V = { reads += 1; backing(key) }
    override def containsKey(key: K): Boolean = backing.contains(key)
    override def updateValue(key: K, value: V): Unit = { writes += 1; backing(key) = value }
    override def iterator(): Iterator[(K, V)] = backing.iterator
    override def keys(): Iterator[K] = backing.keys.iterator
    override def values(): Iterator[V] = backing.values.iterator
    override def removeKey(key: K): Unit = backing.remove(key)
    override def clear(): Unit = backing.clear()
  }

  private def javaMap[K, V](kvs: (K, V)*): java.util.Map[K, V] = {
    val m = new java.util.HashMap[K, V]()
    kvs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  test("sum combine: accumulates across merges, one write per dirty entry") {
    val st = new FakeMapState[Int, Long]
    BatchedMapState.mergeInto(st, javaMap(1 -> 5L, 2 -> 3L), (a: Long, b: Long) => a + b)
    BatchedMapState.mergeInto(st, javaMap(1 -> 2L, 3 -> 1L), (a: Long, b: Long) => a + b)
    assert(st.backing === Map(1 -> 7L, 2 -> 3L, 3 -> 1L))
    // 4 dirty entries across both merges -> exactly 4 writes, however
    // many rows were folded into the local maps upstream
    assert(st.writes === 4)
  }

  test("max combine: non-advancing entries read but never write") {
    val st = new FakeMapState[Int, Int]
    BatchedMapState.mergeInto(st, javaMap(1 -> 9, 2 -> 4), (a: Int, b: Int) => math.max(a, b))
    val writesAfterSeed = st.writes
    // 1 -> 7 does not advance past 9; 2 -> 6 advances
    BatchedMapState.mergeInto(st, javaMap(1 -> 7, 2 -> 6), (a: Int, b: Int) => math.max(a, b))
    assert(st.backing === Map(1 -> 9, 2 -> 6))
    assert(st.writes === writesAfterSeed + 1, "non-advancing max must skip the write")
  }

  test("absent keys are inserted without a read") {
    val st = new FakeMapState[String, Long]
    BatchedMapState.mergeInto(st, javaMap("a" -> 1L), (a: Long, b: Long) => a + b)
    assert(st.backing === Map("a" -> 1L))
    assert(st.reads === 0)
  }
}
