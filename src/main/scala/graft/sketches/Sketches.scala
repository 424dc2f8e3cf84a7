package graft.sketches

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketch aggregations for interactive analytics over 100 TB:
  * one-pass, bounded-memory, partial-aggregatable summaries where exact
  * answers would need a full shuffle of the key space. All wrap Spark's
  * codegen'd built-ins (HyperLogLog++, GK quantiles, CountMinSketch,
  * BloomFilter) with the engine's conventions; exactness-vs-memory is the
  * `rsd`/`accuracy`/`fpp` knob.
  */
object Sketches {

  /** HyperLogLog++ distinct count (±rsd relative error, ~1.5 KB state at
    * rsd=0.05 vs a full distinct shuffle). */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Greenwald-Khanna quantiles: one pass, mergeable, error bounded by
    * `1/accuracy` of rank. */
  def approxQuantiles(df: DataFrame, col0: String,
      probabilities: Seq[Double], relativeError: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(col0, probabilities.toArray, relativeError).toSeq

  /** Count-min sketch of a key column: point-lookup frequency estimates
    * with ε=eps over-count bound. Returns the sketch's binary for reuse. */
  def countMin(df: DataFrame, keyCol: String, eps: Double = 0.001,
      confidence: Double = 0.99, seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(keyCol, eps, confidence, seed)

  /** Bloom filter over a key column: set-membership with `fpp` false
    * positives — the scan-pruning companion for semi-join pushdown. */
  def bloom(df: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    df.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Bloom-pruned semi join: build a bloom filter on the (small) right
    * key set, push it as a scan predicate on the big side, then exact
    * semi-join only the survivors — the manual form of Spark's runtime
    * bloom-filter join (InjectRuntimeFilter), usable when the build side
    * is computed outside the query. Integral keys only (the filter
    * stores raw longs).
    *
    * Pass `expectedItems` when the build-side cardinality is known (even
    * roughly): it skips the sizing `count()`, leaving ONE job over the
    * build side (the filter aggregation itself). The probe is Spark's
    * own `BloomFilterMightContain` expression — codegen'd, stays inside
    * the scan's WholeStageCodegen span — not a boxed scalar UDF. */
  def bloomSemiJoin(large: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val n = math.max(if (expectedItems > 0) expectedItems else small.count(), 1L)
    val bf = small.stat.bloomFilter(key, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe = call_function("bloom_might_contain",
      lit(bos.toByteArray), col(key).cast("long"))
    large.filter(probe)
      .join(small.select(key).distinct(), Seq(key), "left_semi")
  }
}
