package graft.operators

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.DataFrame

/** Bounded one-slot cache for operators whose returned frame references
  * a persisted intermediate (jaccard postings, TextRank edges,
  * perplexity scores): the frame cannot unpersist eagerly — the caller
  * hasn't run its action yet — but it must not leak either.
  *
  * The naive swap (`getAndSet` + unpersist previous) has a trap this
  * helper exists to avoid, measured as a 1.5× q26 bench regression:
  * Spark's CacheManager keys cached data by CANONICALIZED plan, so when
  * the same operator runs twice on the same input, the second
  * `persist()` re-registers the FIRST call's entry — and unpersisting
  * the previous frame then drops the very cache the new call is about
  * to use, recomputing the intermediate once per downstream consumer.
  * So: if the previous frame computes the SAME result, reuse it (the
  * cache stays warm across repeated calls — the bench-rep and
  * long-lived-session pattern); only a genuinely different input swaps
  * the slot, materializing the new cache BEFORE releasing the old.
  */
object PlanCache {

  /** Persist-and-materialize `df` through the one-slot `ref`:
    * same-computation calls return the previous (already materialized)
    * frame; different inputs persist fresh, then release the slot's
    * old frame. At most one resident cache per slot, ever.
    *
    * Reuse requires ALL of (ADVICE r12 #1/#2):
    *  - same canonicalized computation (`sameResult`);
    *  - the previous frame is STILL CACHED — an external
    *    `spark.catalog.clearCache()` (Bench runs one after every rep)
    *    leaves the slot holding an unpersisted frame, and handing that
    *    back would recompute the intermediate once per downstream
    *    consumer, the very fan-out the cache exists to prevent;
    *  - same live SparkSession — a frame from an earlier (possibly
    *    stopped) session must not be handed to a new session's caller.
    *
    * NOT for single-action consumers: when every reference to the
    * intermediate hangs off ONE caller action, `ReuseExchange` already
    * dedups its exchanges inside that execution and the resident cache
    * only adds a full materialization pass per cold call — q107's
    * measured +2 s (VERDICT r13 #2; TextRank dropped this cache for
    * exactly that reason). Use the slot when the intermediate is
    * re-consumed across SEPARATE actions (jaccard postings, perplexity
    * scores) or ends below any exchange boundary reuse could key on. */
  def swapPersist(ref: AtomicReference[DataFrame], df: DataFrame): DataFrame = {
    val prev = ref.get()
    val reusable = prev != null &&
      (prev.sparkSession eq df.sparkSession) &&
      prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) &&
      prev.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    if (reusable) {
      prev
    } else {
      val p = df.persist()
      p.count() // materialize once, before any multi-consumer fan-out
      Option(ref.getAndSet(p)).filter(_ ne p).foreach { old =>
        // release the old frame ONLY if it computes a different result:
        // CacheManager keys entries by canonicalized plan, so when the
        // slot held a same-plan-but-externally-uncached frame (the
        // clearCache path above), unpersisting it here would drop the
        // very entry p just registered — the original trap, one branch
        // over. Sessions must also match (never touch a stopped one).
        if ((old.sparkSession eq df.sparkSession) &&
            !old.queryExecution.analyzed.sameResult(p.queryExecution.analyzed))
          old.unpersist()
      }
      p
    }
  }
}
