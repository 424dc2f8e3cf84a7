package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.dedup.Dedup

/** Mergeable cardinality sketches — the "count distinct URLs across
  * 100 TB without a distinct shuffle" primitive a corpus pipeline needs
  * for vocabulary sizing, dedup-rate monitoring, and per-shard novelty
  * accounting.
  *
  * HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007, "HyperLogLog:
  * the analysis of a near-optimal cardinality estimation algorithm")
  * re-expressed Spark-first:
  *
  *   - the hash/register/rank computation fuses into the scan (pure
  *     codegen'd builtins over [[Dedup.h60]]),
  *   - the ONLY shuffle is `groupBy(keys, reg_idx).max(rho)` — a
  *     map-side partial max collapses every partition to at most
  *     m = 2^p rows per key before the exchange, so the wire cost is
  *     O(keys × m) regardless of input size (vs `count(distinct)`
  *     shuffling every unique value),
  *   - sketches MERGE by pointwise register max (associative,
  *     commutative, idempotent), so per-shard / per-day register
  *     tables union into corpus-level cardinalities without touching
  *     the raw data again — the property exact distinct can never have.
  *
  * Determinism: the register rank is integer arithmetic on the
  * md5-derived [[Dedup.h60]] (bit length via `bin()`, identical in
  * Spark and DuckDB), and the estimator keeps the harmonic sum in
  * DECIMAL(38,0) at fixed-point scale 2^61 — exact and
  * association-free — so the one IEEE division that produces the
  * estimate sees bit-identical operands in both engines. The
  * linear-counting correction's `ln` passes through DECIMAL(27,12)
  * (the repo-wide cross-engine log discipline).
  */
object Sketches {

  /** 2^61 — the fixed-point scale of the harmonic sum. rho ∈ [1, 61]
    * so every term 2^(61-rho) is an exact BIGINT. */
  private val Scale61 = 2305843009213693952L

  /** α_m · m² · 2^61 for the raw HLL estimator, as the ONE double
    * literal both engines parse (α's mantissa × 2^(2p+61) is an exact
    * integer, so the decimal rendering is lossless). */
  def alphaNumerator(p: Int): Double = {
    val m = 1 << p
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    java.lang.Math.scalb(alpha, 2 * p + 61)
  }

  /** Exact decimal rendering of [[alphaNumerator]] for oracle SQL. */
  def alphaNumeratorLiteral(p: Int): String =
    new java.math.BigDecimal(alphaNumerator(p)).toPlainString

  /** Per-key HLL register table: `(keys..., reg_idx, max_rho)`.
    *
    * Register index = low p bits of h60; rank rho = leading-zero count
    * of the remaining (60-p)-bit word + 1, i.e. `(60-p+1) - bitlen`
    * with `bitlen = length(bin(rem))` (0 when rem = 0) — `bin` renders
    * without leading zeros in both engines. One exchange, ≤ m rows per
    * key after map-side partial max. */
  def hllRegisters(df: DataFrame, value: Column, keys: Seq[String], p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val h = Dedup.h60(value)
    val rem = shiftright(h, p)
    val bitlen = when(rem === 0L, lit(0)).otherwise(length(bin(rem)))
    val rho = (lit(60 - p + 1) - bitlen).cast("int")
    df.select(keys.map(col) :+ h.bitwiseAND(lit((m - 1).toLong)).as("reg_idx") :+ rho.as("rho"): _*)
      .groupBy(keys.map(col) :+ col("reg_idx"): _*)
      .agg(max("rho").as("max_rho"))
  }

  /** Merge register tables by dropping key columns: pointwise register
    * max. `regs` may be a union of independently-built sketches (shards,
    * days, languages) — merge never revisits the raw data. */
  def hllMerge(regs: DataFrame, keepKeys: Seq[String]): DataFrame =
    regs.groupBy(keepKeys.map(col) :+ col("reg_idx"): _*)
      .agg(max("max_rho").as("max_rho"))

  /** Cardinality estimate per key group from a register table:
    * `(keys..., n_reg, n_zero, est)`.
    *
    * Harmonic sum Z·2^61 = (m − n_reg)·2^61 + Σ 2^(61−max_rho) stays in
    * DECIMAL(38,0) (exact, order-free); raw estimate = α·m²·2^61 / that,
    * one IEEE division. Small-range correction (raw ≤ 2.5m with empty
    * registers) switches to linear counting m·ln(m/n_zero), the ln
    * rounded through DECIMAL(27,12) for cross-engine stability. */
  def hllEstimate(regs: DataFrame, keys: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val term = expr("shiftleft(CAST(1 AS BIGINT), 61 - max_rho)").cast(DecimalType(38, 0))
    val agg = regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_reg"), sum(term).as("z_present"))
    val nZero = (lit(m) - col("n_reg")).cast("long")
    val zInt = (nZero.cast(DecimalType(10, 0)) * lit(Scale61).cast(DecimalType(19, 0)))
      .cast(DecimalType(38, 0)) + col("z_present")
    val raw = lit(alphaNumerator(p)) / zInt.cast("double")
    val linear = (lit(m).cast(DecimalType(10, 0)) *
      log(lit(m.toDouble) / nZero.cast("double")).cast(DecimalType(27, 12))).cast("double")
    agg.select(
      keys.map(col) :+ col("n_reg") :+ nZero.as("n_zero") :+
        when(raw <= lit(2.5 * m) && nZero > 0, linear).otherwise(raw).as("est"): _*)
  }

  /** One-call convenience: distinct-count estimate of `value` per key
    * group, `(keys..., n_reg, n_zero, est)`. */
  def hllDistinct(df: DataFrame, value: Column, keys: Seq[String], p: Int): DataFrame =
    hllEstimate(hllRegisters(df, value, keys, p), keys, p)

  // --- Built-in sketch wrappers (formerly graft.sketches.Sketches; the
  // --- two same-named one-letter-apart packages invited wrong imports —
  // --- VERDICT r11 #3). All wrap Spark's codegen'd built-ins
  // --- (HyperLogLog++, GK quantiles, CountMinSketch, BloomFilter);
  // --- exactness-vs-memory is the rsd/accuracy/fpp knob.

  /** HyperLogLog++ distinct count (±rsd relative error, ~1.5 KB state at
    * rsd=0.05 vs a full distinct shuffle) — Spark's built-in aggregate;
    * [[hllDistinct]] is the custom mergeable-register-table form. */
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
