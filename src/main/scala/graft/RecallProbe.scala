package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Retrieval-QUALITY probe for the approximate ANN variants: recall@k
  * against the exact brute-force baseline, per tuning knob — LSH by
  * `numPlanes` (single-probe, multi-probe, banded), IVF by `nprobe`, and
  * `nearDupPairs` pair-recall by bands×planes vs the exact
  * `cosine >= threshold` pair set. The oracle queries (q30/q31/q51)
  * verify the IMPLEMENTATION (DuckDB replays the same algorithm); this
  * probe measures what that algorithm retrieves.
  *
  * Each LSH row also prints the THEORETICAL recall from the
  * Goemans–Williamson collision model — `p = 1 − θ/π` per hyperplane,
  * `p^m` single-probe, `P(≤1 bit differs)` multi-probe,
  * `1 − (1 − p^bp)^nb` banded — averaged over the actual ground-truth
  * neighbor angles. Measured ≈ predicted is itself a correctness check:
  * the synthetic embeddings are weakly clustered, so absolute recall is
  * bounded by the data's neighbor angles, not by the implementation.
  * Results are recorded in SCALE.md; RecallSpec pins floors so a
  * regression fails the build.
  *
  * Run: `sbt "runMain graft.RecallProbe [sfDir] [numQueries] [k]"`
  * (defaults: /root/testdata/sf0.1, 200, 10).
  */
object RecallProbe {

  /** Mean per-query recall@k of `approx` vs `truth` (both in the top-k
    * output shape `query_id, cand_id, rank`). Queries with no approx
    * rows count as recall 0 (left join from the truth side). */
  def recallAtK(truth: DataFrame, approx: DataFrame, k: Int): Double = {
    val t = truth.select(col("query_id"), col("cand_id"))
    val a = approx.select(col("query_id"), col("cand_id"))
    val hits = t.join(a, Seq("query_id", "cand_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val perQuery = t.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select((coalesce(col("hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
    perQuery.agg(avg("recall")).head().getDouble(0)
  }

  /** Pair recall: |approx ∩ exact| / |exact| over (id_a, id_b) pairs. */
  def pairRecall(exact: DataFrame, approx: DataFrame): (Long, Long, Double) = {
    val e = exact.select("id_a", "id_b")
    val nExact = e.count()
    val nHit = e.join(approx.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_semi").count()
    (nHit, nExact, if (nExact == 0) 1.0 else nHit.toDouble / nExact)
  }

  /** Exact all-pairs `cosine >= threshold` ground truth — O(N²) scoring,
    * probe-only (N ≤ a few thousand here; never a production path). */
  def exactPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("id").as("id_a"), col("vec").as("va"))
    val b = vectors.select(col("id").as("id_b"), col("vec").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorFunctions.cosineFast(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Dequantized copy of a vector under the SAME per-vector affine
    * int8-style scheme as [[org.apache.spark.sql.graft.QuantizeMse]]
    * (min/max range, `levels` uniform steps, floor(x+0.5) rounding) —
    * what a store serving quantized embeddings would hand back. Probe-only
    * (interpreted HOF transform is fine off the hot path); production
    * stores the quantized bytes and this probe answers whether retrieval
    * survives that. */
  def dequantized(vec: Column, levels: Int): Column = {
    require(levels >= 1, s"dequantized: levels must be >= 1, got $levels")
    val mn = array_min(vec)
    val scale = (array_max(vec) - mn) / lit(levels.toDouble)
    when(scale === 0.0, vec).otherwise(
      transform(vec, x => mn +
        least(greatest(floor((x - mn) / scale + lit(0.5)), lit(0.0)),
          lit(levels.toDouble)) * scale))
  }

  /** Per-plane collision probability of a pair at cosine `c`. */
  private def pCollide(c: Column): Column =
    lit(1.0) - acos(greatest(lit(-1.0), least(lit(1.0), c))) / math.Pi

  /** Predicted recall = mean over ground-truth pairs of `model(p)`. */
  private def predicted(truthWithCos: DataFrame, model: Column => Column): Double =
    truthWithCos.agg(avg(model(pCollide(col("cos"))))).head().getDouble(0)

  def main(args: Array[String]): Unit = {
    // `runMain graft.RecallProbe leakage [dir...]` — just the streaming
    // leakage row(s), without the (slow) full probe suite
    if (args.headOption.contains("leakage")) {
      val dirs = if (args.length > 1) args.drop(1).toSeq
        else Seq("/root/testdata/sf0.1")
      val spark = GraftSession.get("local[32]", 32)
      println(s"| corpus | removable dups | admitted | rate | lost clusters |")
      println("|---|---|---|---|---|")
      dirs.foreach { d =>
        val (removable, extras, rate, lost) = streamingDedupLeakage(spark, d)
        println(f"| $d | $removable | $extras | $rate%.3f | $lost |")
      }
      spark.stop()
      return
    }
    // `runMain graft.RecallProbe pq [dir]` — product-quantization
    // retrieval quality: recall@10 of the ADC scan vs the exact INNER
    // PRODUCT top-k (PQ approximates IP — cosine truth would conflate
    // the metric change with the quantization loss) across code budgets.
    if (args.headOption.contains("pq")) {
      val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val spark = GraftSession.get("local[32]", 32)
      val emb = Tables.embeddings(spark, dir)
      val queries = emb.filter(col("vec_id") < 200)
        .select(col("vec_id").as("query_id"),
          Similarity.asDouble(col("embedding")).as("query_vec"))
      val vecs = emb.select(col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("vec"))
      val cands = vecs.select(col("id").as("cand_id"), col("vec").as("cand_vec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("ip").desc, col("cand_id"))
      val truth = queries.crossJoin(cands)
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          graft.functions.VectorFunctions.dotFast(col("query_vec"), col("cand_vec")).as("ip"))
        .withColumn("r", row_number().over(w)).filter(col("r") <= 10)
        .persist()
      truth.count()
      println("| PQ (ADC, IP truth) | m x ksub (bits/vec) | recall@10 |")
      println("|---|---|---|")
      for ((m, ksub) <- Seq((4, 16), (8, 16), (8, 64), (16, 16), (16, 256))) {
        val books = graft.similarity.ProductQuantizer.pqTrain(vecs, 64, m, ksub, iters = 2)
        val codes = graft.similarity.ProductQuantizer.pqEncode(vecs, books, 64, m)
        val top = graft.similarity.ProductQuantizer.pqTopK(queries, books, codes,
          64, m, ksub, 10)
        val r = recallAtK(truth, top, 10)
        val bits = m * (math.log(ksub) / math.log(2)).round
        println(f"| PQ | $m x $ksub ($bits b/vec) | $r%.3f |")
      }
      spark.stop()
      return
    }
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(200)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.get("local[32]", 32)

    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), Similarity.asDouble(col("embedding")).as("query_vec"))
    val cands = emb
      .select(col("vec_id").as("cand_id"), Similarity.asDouble(col("embedding")).as("cand_vec"))
    val nCands = cands.count()
    println(s"# RecallProbe: dir=$dir queries=$nQ candidates=$nCands k=$k")

    val truth = Similarity.bruteForceTopK(queries, cands, k).persist()
    truth.count()

    println(s"\n| variant | setting | recall@$k | predicted |")
    println("|---|---|---|---|")
    for (p <- Seq(2, 4, 6, 8)) {
      val r = recallAtK(truth, Similarity.lshTopK(queries, cands, k, numPlanes = p), k)
      val pr = predicted(truth, pc => pow(pc, p))
      println(f"| LSH single-probe | numPlanes=$p | $r%.3f | $pr%.3f |")
    }
    for (p <- Seq(4, 6, 8)) {
      val r = recallAtK(truth, Similarity.lshTopKMultiProbe(queries, cands, k, numPlanes = p), k)
      val pr = predicted(truth, pc =>
        pow(pc, p) + lit(p.toDouble) * pow(pc, p - 1) * (lit(1.0) - pc))
      println(f"| LSH multi-probe (Hamming<=1) | numPlanes=$p | $r%.3f | $pr%.3f |")
    }
    for ((bp, nb) <- Seq((4, 8), (4, 16), (4, 32))) {
      val r = recallAtK(truth,
        Similarity.lshTopKBanded(queries, cands, k, bandPlanes = bp, numBands = nb), k)
      val pr = predicted(truth, pc => lit(1.0) - pow(lit(1.0) - pow(pc, bp), nb))
      println(f"| LSH banded | $nb x $bp planes | $r%.3f | $pr%.3f |")
    }
    for (np <- Seq(1, 2, 4, 8)) {
      val (centroids, assigned) = Similarity.ivfIndex(cands, nlist = 16)
      val r = recallAtK(truth, Similarity.ivfTopK(queries, centroids, assigned, k, nprobe = np), k)
      println(f"| IVF (nlist=16) | nprobe=$np | $r%.3f | — |")
    }
    // trained centroids (2 Lloyd iterations) vs the first-nlist seed:
    // same nprobe budget, measured side by side
    for (np <- Seq(1, 2, 4, 8)) {
      val (centroids, assigned) = Similarity.ivfIndex(cands, nlist = 16, trainIters = 2)
      val r = recallAtK(truth, Similarity.ivfTopK(queries, centroids, assigned, k, nprobe = np), k)
      println(f"| IVF trained (nlist=16, 2 iters) | nprobe=$np | $r%.3f | — |")
    }

    // Quantized-corpus retrieval: full-precision queries scored against
    // an int8-dequantized candidate set (asymmetric distance — the
    // standard serving layout for a quantized 100 TB embedding store).
    println(s"\n| quantized corpus | levels | recall@$k | mean MSE |")
    println("|---|---|---|---|")
    for (levels <- Seq(255, 15, 3)) {
      val candsQ = cands.select(col("cand_id"),
        dequantized(col("cand_vec"), levels).as("cand_vec"))
      val r = recallAtK(truth, Similarity.bruteForceTopK(queries, candsQ, k), k)
      val mse = cands.agg(avg(graft.functions.VectorFunctions.quantizeMse(
        col("cand_vec"), lit(levels)))).head().getDouble(0)
      println(f"| int8-style affine | $levels | $r%.3f | $mse%.2e |")
    }

    val vecs = emb.select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
    val threshold = 0.4
    val exact = exactPairs(vecs, threshold).persist()
    println(s"\n| nearDupPairs (threshold=$threshold) | bands×planes | pair recall | predicted |")
    println("|---|---|---|---|")
    for ((bands, planes) <- Seq((4, 4), (8, 4), (16, 4), (32, 4))) {
      val approx = Similarity.nearDupPairs(vecs, threshold, bandPlanes = Some(planes), numBands = Some(bands))
      val (hit, tot, r) = pairRecall(exact, approx)
      val pr = exact.agg(avg(lit(1.0) - pow(lit(1.0) - pow(pCollide(col("cos")), planes), bands)))
        .head().getDouble(0)
      println(f"| $hit/$tot | $bands x $planes | $r%.3f | $pr%.3f |")
    }

    val docsDf = Tables.documents(spark, dir)
    val truthPairs = exactTextPairs(docsDf, "doc_id", "text", 3).persist()
    truthPairs.count()
    println(s"\n| minhash banding S-curve (numPerm=32) | bands×rows | jaccard bin | pairs | measured | predicted |")
    println("|---|---|---|---|---|---|")
    for ((bands, rows) <- Seq((4, 8), (8, 4), (16, 2))) {
      minhashCaptureByBin(docsDf, truthPairs, bands, rows).foreach {
        case (bin, n, meas, pred) =>
          println(f"| capture | $bands x $rows | [${bin / 10.0}%.1f,${(bin + 1) / 10.0}%.1f) | $n | $meas%.3f | $pred%.3f |")
      }
    }
    println(s"\n| simhash capture (60 bits) | maxHamming | cosine bin | pairs | measured | predicted |")
    println("|---|---|---|---|---|---|")
    for (h <- Seq(1, 3, 6)) {
      simhashCaptureByBin(docsDf, truthPairs, 60, h).foreach {
        case (bin, n, meas, pred) =>
          println(f"| capture | h<=$h | [${bin / 10.0}%.1f,${(bin + 1) / 10.0}%.1f) | $n | $meas%.3f | $pred%.3f |")
      }
    }
    val (removable, extras, leakRate, lost) = streamingDedupLeakage(spark, dir)
    println(s"\n| streaming near-dedup vs batch (q73 config) | removable dups | admitted | rate | lost clusters |")
    println("|---|---|---|---|---|")
    println(f"| leader-only state leakage | $removable | $extras | $leakRate%.3f | $lost |")
    spark.stop()
  }

  /** Streaming near-dedup leakage vs the batch ground truth — the cost
    * of [[graft.streaming.StreamingDedup.nearDedupVerdicts]]'s
    * leader-only state, measured at the RecallProbe standard: run q73's
    * exact streaming config (3-shingles, 16 perms × 4 bands, est-Jaccard
    * verify at 0.5) and the batch [[graft.dedup.Dedup.dedupByMinhash]]
    * with the IDENTICAL config over the same corpus, then score the
    * stream's survivor set against the batch clusters (the estimator is
    * shared, so every disagreement is structural: leader-only state +
    * arrival order, never minhash variance).
    *
    * Returns (removable, extras, admittedDupRate, lostClusters):
    * `removable` = Σ (size−1) over batch clusters — the duplicates a
    * perfect pass removes; `extras` = Σ max(0, survivors−1) — duplicates
    * the stream ADMITTED (its leakage); `admittedDupRate` =
    * extras/removable; `lostClusters` = clusters with ZERO streaming
    * survivors (over-suppression — content lost, should be 0: a
    * cluster's first arrival hits no leader of its own cluster). */
  def streamingDedupLeakage(spark: SparkSession, dir: String): (Long, Long, Double, Long) =
    leakageVsBatch(spark, dir,
      graft.streaming.StreamingDedup.runNear(spark, dir)
        .select(col("doc_id"), col("survives")))

  /** Same scoring for the CLOSED loop (q74, streaming + incrementalDedup
    * sweep): post-sweep leakage should be at-or-below the raw streaming
    * leakage, with cross-epoch admitted dups eliminated. */
  def sweptDedupLeakage(spark: SparkSession, dir: String): (Long, Long, Double, Long) =
    leakageVsBatch(spark, dir,
      graft.streaming.StreamingDedup.runNearSwept(spark, dir)
        .select(col("doc_id"), col("survives_final").as("survives")))

  private def leakageVsBatch(spark: SparkSession, dir: String,
      stream: org.apache.spark.sql.DataFrame): (Long, Long, Double, Long) = {
    val batch = graft.dedup.Dedup.dedupByMinhash(
      Tables.documents(spark, dir), "doc_id", "text",
      n = 3, numPerm = 16, bands = 4, threshold = 0.5)
      .select(col("id").as("doc_id"), col("cluster"))
    val per = batch.join(stream, Seq("doc_id"))
      .groupBy("cluster").agg(
        count(lit(1)).as("size"),
        sum(col("survives").cast("long")).as("n_surv"))
    val r = per.agg(
      coalesce(sum(when(col("size") > 1, col("size") - 1).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("size") > 1,
        greatest(col("n_surv") - 1, lit(0L))).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("n_surv") === 0, 1L).otherwise(0L)), lit(0L))).head()
    val (removable, extras, lost) = (r.getLong(0), r.getLong(1), r.getLong(2))
    (removable, extras,
      if (removable == 0) 0.0 else extras.toDouble / removable, lost)
  }

  /** Exact pairwise shingle overlap ground truth for the TEXT dedup
    * family: true n-gram Jaccard and set-cosine (`|A∩B|/√(|A||B|)` —
    * the similarity simhash's hyperplane model sees) for every pair
    * sharing at least one shingle. Inverted-index join, probe-only at
    * probe corpus sizes; shingles with document frequency > `maxDf`
    * are dropped from the ground truth exactly like jaccardPairs'
    * stop-shingle guard (affects only near-zero-similarity pairs). */
  def exactTextPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Int = 200): DataFrame = {
    val posting = graft.dedup.Dedup.shinglePosting(docs, idCol, textCol, n)
      .dropDuplicates("id", "s")
    val guarded = posting.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("s")))
      .filter(col("df") <= maxDf).drop("df")
    val sizes = guarded.groupBy("id").agg(count(lit(1)).as("nsh"))
    val common = guarded.select(col("s"), col("id").as("id_a"))
      .join(guarded.select(col("s"), col("id").as("id_b")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("nsh").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("nsh").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("na") + col("nb") - col("common"))).as("jac"),
        (col("common").cast("double") / sqrt(col("na") * col("nb"))).as("cos"))
  }

  /** Measured vs predicted minhash-banding capture per true-Jaccard
    * bin — the LSH S-curve `P(candidate) = 1−(1−s^rows)^bands`,
    * measured through `minhashLshPairs` with the estimate filter OFF
    * (threshold 0) so pure banding capture is what's observed.
    * Returns (bin, nPairs, measured, predicted) for bins with pairs. */
  def minhashCaptureByBin(docs: DataFrame, truthPairs: DataFrame,
      bands: Int, rows: Int): Seq[(Int, Long, Double, Double)] = {
    val cand = graft.dedup.Dedup.minhashLshPairs(
      docs, "doc_id", "text", n = 3, numPerm = bands * rows,
      bands = bands, threshold = 0.0)
    truthPairs
      .join(cand.select(col("id_a"), col("id_b"), lit(1.0).as("hit")),
        Seq("id_a", "id_b"), "left")
      .withColumn("bin", floor(col("jac") * 10).cast("int"))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        avg(coalesce(col("hit"), lit(0.0))).as("measured"),
        avg(lit(1.0) - pow(lit(1.0) - pow(col("jac"), rows), bands)).as("predicted"))
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
  }

  /** Measured vs predicted simhash capture per set-cosine bin: the
    * blocked pair generator has pigeonhole-perfect recall at
    * `hamming <= h`, so capture is exactly `P(hamming <= h)` — and the
    * Charikar hyperplane model says hamming ~ Binomial(bits, θ/π) with
    * `θ = acos(cos)`. Matching measured to that CDF validates the
    * md5-derived bit votes as a faithful random-hyperplane family. */
  def simhashCaptureByBin(docs: DataFrame, truthPairs: DataFrame,
      bits: Int, maxHamming: Int): Seq[(Int, Long, Double, Double)] = {
    val sh = graft.dedup.Dedup.withSimhash(docs, "doc_id", "text", bits)
    val q = acos(greatest(lit(-1.0), least(lit(1.0), col("cos")))) / math.Pi
    def chooseD(n: Int, k: Int): Double =
      (0 until k).map(i => (n - i).toDouble / (i + 1)).product
    val binomCdf = (0 to maxHamming).map(i =>
      lit(chooseD(bits, i)) * pow(q, i) * pow(lit(1.0) - q, bits - i))
      .reduce(_ + _)
    truthPairs
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("cos"),
        (bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= maxHamming)
          .cast("double").as("captured"),
        binomCdf.as("pred"))
      .withColumn("bin", floor(col("cos") * 10).cast("int"))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        avg(col("captured")).as("measured"), avg(col("pred")).as("predicted"))
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
  }
}
