package graft

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.operators.PlanCache

/** Pins the PlanCache reuse contract after ADVICE r12 #1/#2: the slot
  * only hands back a previous frame that is STILL PERSISTED in the live
  * session — an external `clearCache()` (Bench runs one after every
  * rep) must force a re-persist, not return an unpersisted frame whose
  * every consumer recomputes the pipeline (the measured q26 regression:
  * 1.24 s → 1.95 s between rounds). */
class PlanCacheSpec extends SparkSpec {
  import spark.implicits._

  private def frame(): DataFrame =
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .groupBy("s").count()

  test("same plan while cached: the slot frame is reused, still persisted") {
    val ref = new AtomicReference[DataFrame]()
    val a = PlanCache.swapPersist(ref, frame())
    val b = PlanCache.swapPersist(ref, frame())
    assert(b eq a, "same-computation call must return the resident frame")
    assert(b.storageLevel != StorageLevel.NONE)
    a.unpersist(); ref.set(null)
  }

  test("clearCache between calls: the slot re-persists instead of handing back a cold frame") {
    val ref = new AtomicReference[DataFrame]()
    val a = PlanCache.swapPersist(ref, frame())
    assert(a.storageLevel != StorageLevel.NONE)
    spark.catalog.clearCache() // what Bench does after every rep
    assert(a.storageLevel == StorageLevel.NONE, "precondition: external clear took")
    val b = PlanCache.swapPersist(ref, frame())
    assert(b.storageLevel != StorageLevel.NONE,
      "post-clearCache call must hand back a PERSISTED frame (ADVICE r12 #1)")
    b.unpersist(); ref.set(null)
  }

  test("different plan: new frame persists and the old one is released") {
    val ref = new AtomicReference[DataFrame]()
    val a = PlanCache.swapPersist(ref, frame())
    val c = PlanCache.swapPersist(ref, frame().filter($"count" > 0))
    assert(c ne a)
    assert(c.storageLevel != StorageLevel.NONE)
    assert(a.storageLevel == StorageLevel.NONE, "previous slot frame must be unpersisted")
    c.unpersist(); ref.set(null)
  }
}
