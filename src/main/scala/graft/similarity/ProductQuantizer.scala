package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search" — the FAISS `PQ` stage): split each vector
  * into `m` subvectors, learn a `ksub`-centroid codebook per subspace
  * ([[Similarity.kmeansFit]] — deterministic, DECIMAL-exact means), and
  * store each vector as its `m` nearest-centroid codes. A corpus vector
  * then costs `m` small ints instead of `dim` floats (e.g. 64 floats →
  * 4 bytes at m=4: 64× smaller), and query scoring needs only the
  * query's per-subspace dot table — the asymmetric distance computation
  * (ADC) — looked up per code, never the original vectors.
  *
  * Scoring approximates the INNER PRODUCT: `<q, x> ≈ Σ_s <q_s,
  * c_{s,code_s(x)}>` (IP is additive across subspaces, which is what
  * makes the LUT decomposition exact-in-form; cosine is not). Codebook
  * assignment reuses the spherical (cosine) objective of
  * [[Similarity.kmeansFit]] for determinism with the rest of the
  * k-means family; the oracle replays both halves bit-for-bit.
  *
  * Scale shape: training touches the corpus `m × iters` times with
  * broadcast centroids (k·dim/m doubles each — driver-bounded);
  * encoding is ONE pass (all m codebooks in a single broadcast, scored
  * rows collapse map-side by the `max_by` partial agg, the shuffle
  * carries N×m code rows keyed by id); ADC scoring is a scan of the
  * CODES table against a broadcast per-query LUT through the codegen'd
  * `pq_adc` loop, with per-query top-k as the bounded-heap
  * [[graft.operators.TopKByScore]] — no score matrix ever shuffles, no
  * join against the codebook at scan time. */
object ProductQuantizer {

  /** Learn per-subspace codebooks. `vectors` = `(id: long, vec:
    * array<double>)`, `dim % m == 0`. Returns `(sub, cid, cvec)` with
    * `sub` in `[0, m)`, `cid` in `[0, ksub)`, `cvec` of `dim/m`.
    *
    * All `m` subspaces train in ONE keyed pass per k-means step (r17):
    * the original per-subspace [[Similarity.kmeansFit]] loop launched
    * `m × (iters + 1)` tiny driver actions — at m=4/iters=1 that made
    * q78 a 37-job query whose wall was mostly per-job fixed cost, and
    * on a cluster it is m sequential barrier chains where one suffices.
    * Keying every stage by `sub` runs the same math on the same row
    * groups (init = the ksub lowest-id vectors per sub; assignment =
    * same broadcast cosine + max_by tie rule; update = the same
    * DECIMAL(27,12) per-(sub,cid,dim) mean), so the codebooks are
    * bit-identical (SimilaritySpec pins this against the per-sub loop;
    * the q78 oracle replays training unchanged). */
  def pqTrain(vectors: DataFrame, dim: Int, m: Int, ksub: Int,
      iters: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val sub = dim / m
    val spark = vectors.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val subvecs = vectors
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("vec").as("fullvec"))
      .select(col("sub").cast("int").as("sub"), col("id"),
        slice(col("fullvec"), col("sub") * sub + 1, lit(sub)).as("vec"))
    // init: per subspace, the ksub lowest-id subvectors, cid in id order
    // (kmeansFit's orderBy(id).limit(k) seed rule, keyed)
    var centroids: Seq[(Int, Int, Seq[Double])] = subvecs
      .withColumn("rn", row_number().over(
        Window.partitionBy("sub").orderBy("id")))
      .filter(col("rn") <= ksub)
      .select(col("sub"), (col("rn") - 1).cast("int").as("cid"), col("vec"))
      .as[(Int, Int, Seq[Double])].collect().toSeq
    for (_ <- 0 until iters) {
      val cdf = centroids.toDF("sub", "cid", "cvec")
      centroids = subvecs.join(broadcast(cdf), Seq("sub"))
        .select(col("sub"), col("id"), col("vec"), col("cid"),
          VectorFunctions.cosineFast(col("vec"), col("cvec")).as("sim"))
        .groupBy("sub", "id", "vec")
        .agg(max_by(col("cid"), struct(col("sim"), (-col("cid")).as("nid")))
          .as("cid"))
        .select(col("sub"), col("cid"), posexplode(col("vec")).as(Seq("dim", "v")))
        .groupBy("sub", "cid", "dim")
        .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(27, 12)))
          .cast("double") / count(lit(1))).as("m"))
        .groupBy("sub", "cid")
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("sub"), col("cid"),
          transform(col("dm"), s => s("m")).as("cvec"))
        .as[(Int, Int, Seq[Double])].collect().toSeq
    }
    centroids.toDF("sub", "cid", "cvec")
  }

  /** Encode every vector as its `m` nearest-centroid codes (cosine
    * assignment, ties to the lower cid — the [[Similarity.kmeansAssign]]
    * rule per subspace). One corpus pass: all `m` codebooks ride a
    * single broadcast, scores collapse map-side, and the only shuffle
    * carries `(id, sub, code)` rows. Returns `(id, codes: array<int>)`
    * with `codes[s]` the subspace-`s` code. */
  def pqEncode(vectors: DataFrame, codebooks: DataFrame, dim: Int,
      m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    vectors.crossJoin(broadcast(codebooks))
      .select(col("id"), col("sub"), col("cid"),
        VectorFunctions.cosineFast(
          slice(col("vec"), col("sub") * sub + 1, lit(sub)), col("cvec"))
          .as("sim"))
      .groupBy("id", "sub")
      .agg(max_by(col("cid"), struct(col("sim"), (-col("cid")).as("nid")))
        .as("code"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        e => e.getField("code")).as("codes"))
  }

  /** ADC top-k: approximate `<q, x>` by the per-subspace LUT sum over
    * `x`'s codes. `queries` = `(query_id, query_vec)`. Self-matches
    * (`query_id == id`) are excluded, mirroring [[Similarity.ivfTopK]].
    * Returns `(query_id, cand_id, rank, score)` with rank 1..k by
    * (score desc, cand_id asc).
    *
    * The LUT build is queries × (m·ksub) broadcast rows — bounded by the
    * query batch; the scan side touches only the codes table. */
  def pqTopK(queries: DataFrame, codebooks: DataFrame, codes: DataFrame,
      dim: Int, m: Int, ksub: Int, k: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val sub = dim / m
    // The flat LUT's indexing assumes a DENSE (sub, cid) grid, but
    // kmeansFit drops clusters that lose every member — a sparse
    // codebook would shift every index after the gap. Densify against
    // the full grid with 0.0 entries: a dropped centroid is never
    // assigned, so its slot is never looked up and the filler is inert.
    val spark = queries.sparkSession
    val grid = spark.range(m).select(col("id").cast("int").as("sub"))
      .crossJoin(spark.range(ksub).select(col("id").cast("int").as("cid")))
    val dense = grid.join(codebooks, Seq("sub", "cid"), "left")
    // flat LUT per query, subspace-major: lut[s*ksub + cid] = <q_s, c_{s,cid}>
    val lut = queries.crossJoin(broadcast(dense))
      .select(col("query_id"),
        struct(col("sub"), col("cid"),
          when(col("cvec").isNull, lit(0.0)).otherwise(
            VectorFunctions.dotFast(
              slice(col("query_vec"), col("sub") * sub + 1, lit(sub)),
              col("cvec"))).as("d")).as("e"))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(col("e"))), e => e.getField("d"))
        .as("lut"))
    val scored = codes.crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        VectorFunctions.pqAdc(col("codes"), col("lut"), ksub).as("score"))
    graft.operators.TopKByScore.topKPerGroup(
        scored, Seq("query_id"), "score", "id", k)
      .select(col("query_id"), col("id").as("cand_id"), col("rank"),
        col("score"))
  }
}
