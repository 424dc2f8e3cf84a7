package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Johnson–Lindenstrauss dimensionality reduction by deterministic
  * sign (Rademacher) random projection (Achlioptas 2003,
  * "Database-friendly random projections": entries ±1 preserve
  * pairwise distances with the same JL guarantee as Gaussians). The
  * pipeline step it implements: compressing a corpus's embedding
  * column (64–4096 dims of float32) to a k-dim sketch BEFORE the
  * expensive pairwise stages — clustering, near-dup blocking, ANN
  * indexing — so those stages move k doubles per row instead of d.
  *
  *   y_j = (1/√k) · Σ_i x_i · s(i,j),   s(i,j) ∈ {+1,−1}
  *
  * The sign matrix is derived from the repo's 60-bit md5 discipline
  * (`Dedup.h60`): s(i,j) = +1 iff h60("salt:i:j") is even — no RNG, no
  * seed file; any engine (and the DuckDB oracle) reconstructs the same
  * matrix from the salt alone.
  *
  * Scale shape: the d×k sign matrix is built ONCE on the driver and
  * compiles into the codegen'd [[org.apache.spark.sql.graft.SignProject]]
  * expression as a plan constant (for 4096→256 that is ~8 MB — well
  * under broadcast scale); per-row work is one fused primitive loop
  * with NO shuffle, no joins, no per-row hashing — the projection runs
  * at full scan throughput inside whole-stage codegen (the
  * zip_with/aggregate HOF form would evaluate interpreted, boxing a
  * lambda per element, and break the codegen span).
  *
  * Determinism: each product x_i·s(i,j) is pinned to an exact scaled
  * integer — `floor(x·10¹² + 0.5)` as BIGINT (the q59 floor-pinning
  * discipline; a double→DECIMAL cast would NOT do: Spark rounds the
  * double's shortest string form where DuckDB rounds the exact binary
  * value, and the 13th-digit disagreements accumulate across the
  * inner product). The integer sum is exact and order-independent;
  * the final combine is two IEEE double ops, and with k a power of
  * four (16 → scale 0.25) the 1/√k factor is binary-exact — so the
  * q108 oracle replays every output coordinate bit-for-bit. Valid for
  * |x_i| < ~4×10³ (10¹²-scaled doubles stay under 2⁵³) — embedding
  * coordinates are O(1).
  */
object RandomProjection {

  /** Driver-side twin of [[graft.dedup.Dedup.h60]]: first 15 hex chars
    * of md5 as a non-negative 60-bit long. */
  def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** The deterministic sign: +1.0 iff h60("salt:i:j") is even. */
  def signOf(salt: String, i: Int, j: Int): Double =
    if ((h60(s"$salt:$i:$j") & 1L) == 0L) 1.0 else -1.0

  /** Project `vecCol` (array<float|double>, `inDims` wide) to `outDims`
    * coordinates: one row per (id, dim) with the projected value.
    * `inDims` must match the stored vectors (checked at runtime by the
    * zip_with, which nulls out on length mismatch — asserted in the
    * spec). */
  def project(emb: DataFrame, idCol: String, vecCol: String,
      inDims: Int, outDims: Int, salt: String = "rp"): DataFrame = {
    require(inDims > 0 && outDims > 0, s"dims must be positive: $inDims -> $outDims")
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    // row-major by output dim — matches SignProject's kernel layout
    val flatSigns = (0 until outDims).flatMap(j =>
      (0 until inDims).map(i => signOf(salt, i, j)))
    val y = graft.functions.VectorFunctions.signProject(
      Similarity.asDouble(col(vecCol)), flatSigns, outDims, scale)
    emb.select(col(idCol), posexplode(y).as(Seq("dim", "value")))
      .select(col(idCol), col("dim").cast("int").as("dim"), col("value"))
  }
}
