package graft
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._

/** Scaling probe: replicate sf0.1 inputs N× and measure the heavy
  * operator classes, to verify near-linear scaling (the 100-TB argument
  * made measurable). Run: `sbt "runMain graft.ScaleProbe"`.
  *
  * Pair-GENERATING operators are probed on a MUTATED replication
  * (`repMutatedDocs`/`repMutatedEmb`): naive N× replication makes every
  * document an exact duplicate of N−1 copies, so pair output — and thus
  * measured time — would grow quadratically by construction of the
  * corpus, not the operator. Instead copy `i` mutates a deterministic
  * `i/16` fraction of token positions (resp. perturbs the embedding
  * proportionally to `i`), so a copy family's mutual similarities decay
  * with copy index and each document keeps a BOUNDED near-dup
  * neighborhood regardless of N — realistic dedup density. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    if (args.headOption.contains("verify-order")) {
      // verify-order [factors-csv] [both|distinct|verify] — factor rows
      // can be split across JVMs so the heavy 16× orders don't share one
      // process's shuffle-spill headroom
      val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16))
      val which = args.lift(2).getOrElse("both")
      verifyOrder(spark, dir, factors, which); spark.stop(); return
    }
    if (args.headOption.contains("round14")) {
      // round14 [factors-csv] — the round-14 operator families at corpus
      // multiples: BPE trainer rounds, winnowing density+wall, zipf/KL
      // corpus stats, edit-verified pairs, and the ivfMaintain
      // delta-cost vs full-rebuild ratio.
      val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(1, 4, 16))
      round14Probe(spark, dir, factors); spark.stop(); return
    }
    if (args.headOption.contains("editband")) {
      // editband [factors-csv] — the q130 candidate-volume KNOB,
      // measured (VERDICT r14 #7): editVerifiedPairs' 16× growth is
      // candidate-intrinsic on the mutated-copy corpus, and the scaladoc
      // claims LSH band geometry bounds candidates independent of corpus
      // size. Evidence that row: same corpus, same threshold, rows-per-
      // band 4 (numPerm 16 / bands 4) vs 8 (numPerm 32 / bands 4) —
      // per-band collision probability falls s^4 → s^8, so sub-threshold
      // collision noise collapses while true near-dups (s ≈ 1) survive.
      val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(4, 16))
      editBandProbe(spark, dir, factors); spark.stop(); return
    }
    if (args.headOption.contains("sorted-contains")) {
      // sorted-contains — micro-measure the boilerplate membership probe:
      // per-line binary search (sorted_contains) vs linear array_contains
      // against broadcast sets of growing size, over the sf0.1 corpus
      // split to lines. The removeBoilerplate broadcast branch uses the
      // former; this probe quantifies the ceiling the linear probe had.
      sortedContainsProbe(spark, dir); spark.stop(); return
    }
    def rep(df: DataFrame, n: Int, idCol: String): DataFrame =
      (0 until n).map(i => df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ unionByName _)
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    // `pairs [factors-csv] [modulus]` — run ONLY the pair-operator probe
    // at the given factors (default 1,4,16; the 64× probe runs
    // `pairs 16,64` so the growth ratio is measured within one
    // JVM/session). `modulus` scales the text-mutation denominator
    // (default 16 — the historical corpus): copy i mutates ~i/modulus of
    // token positions, so past i ≥ modulus every copy is a BIJECTIVE
    // relabeling that re-expresses the base corpus's near-set structure
    // under fresh hashes (the 64× simhash ×61-output artifact). A ≥256×
    // probe passes 4·factor so mutation never saturates and family
    // similarity keeps decaying across all copies.
    val pairFactors: Seq[Int] =
      if (args.headOption.contains("pairs"))
        args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16))
      else Seq(1, 4, 16)
    val pairsOnly = args.headOption.contains("pairs")
    val widthOnly = args.headOption.contains("simhash-width")
    val perceptualOnly = args.headOption.contains("perceptual") ||
      args.headOption.contains("containment") ||
      args.headOption.contains("events-skew")
    val mutModulus: Int =
      if (pairsOnly || args.headOption.contains("containment"))
        args.lift(2).map(_.trim.toInt).getOrElse(16)
      else 16
    val li = Tables.lineitem(spark, dir)
    val docs = Tables.documents(spark, dir)
    val ev = Tables.events(spark, dir)
    li.count(); docs.count(); ev.count() // warm
    if (!pairsOnly && !widthOnly && !perceptualOnly)
      println("factor,rows_lineitem,agg_join_s,rolling_s,minhash_s,topk_s")
    for (n <- Seq(1, 4, 16) if !pairsOnly && !widthOnly && !perceptualOnly) {
      val liN = rep(li, n, "l_orderkey")
      val docsN = rep(docs, n, "doc_id")
      val evN = rep(ev, n, "event_id")
      val aggS = time {
        liN.filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '2000-12-01 00:00:00'"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      val rollS = time {
        val w = graft.batch.Rolling.timeWindow(col("ts").cast("timestamp"), 300, col("user_id"))
        evN.withColumn("m", avg(col("value")).over(w))
          .write.format("noop").mode("overwrite").save()
      }
      val mhS = time {
        graft.dedup.Dedup.withMinhashSignature(docsN, "doc_id", "text", 3, 16)
          .write.format("noop").mode("overwrite").save()
      }
      val topkS = time {
        graft.operators.TopKByScore.topKPerGroup(
          evN.select(col("user_id").as("g"), col("event_id").as("id"), col("value").as("s")),
          Seq("g"), "s", "id", 5)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"$n,${n * 600000},$aggS%.2f,$rollS%.2f,$mhS%.2f,$topkS%.2f")
    }

    // ---- pair operators, mutated-copy corpus (bounded near-dup density)
    def mutateText(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c
      else array_join(transform(split(c, " "), (w, p) =>
        when(pmod(p * 37 + 11, lit(mutModulus)) < i, concat(w, lit(s"_m$i"))).otherwise(w)), " ")
    // perturbation must be pseudo-random per (VECTOR, copy, dim): a
    // per-copy or per-dim-only offset shifts every vector of a copy by
    // the SAME delta, collapsing the copy into one cluster whose mutual
    // cosines approach 1 (measured: 4.3M pairs at 4x) — murmur3 keyed by
    // vec_id makes offsets independent, so each family's similarity
    // decays with copy index and neighborhoods stay bounded
    def mutateVec(c: org.apache.spark.sql.Column, idc: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c
      else transform(c, (x, j) =>
        x + lit(0.15 * i) * (pmod(hash(idc, lit(i), j), lit(1000)).cast("double") / 500.0 - 1.0))
    // From ~64 copies a single union plan's generated code blows the
    // Janino compiler (InternalCompilerException in the n-branch
    // generate_doConsume; at 64 branches Spark falls back to INTERPRETED
    // execution — silently 2-3× slower derivation — and at 256 the run
    // died outright) — so large factors MATERIALIZE the mutated corpus
    // per copy (n tiny append jobs, each a one-branch plan) and the
    // probe reads a plain scan, which is also the realistic shape: a
    // real corpus is files, not an n-way union.
    val materializeAt = 32
    def materialized(kind: String, n: Int, write: Int => DataFrame): DataFrame = {
      // the input dir is part of the cache key — without it a probe over
      // a different corpus silently reuses another run's materialization
      val dirKey = java.lang.Integer.toHexString(dir.hashCode)
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-probe-$kind-${n}x-m$mutModulus-$dirKey")
      val marker = new java.io.File(base, "_done")
      if (!marker.exists()) {
        graft.streaming.ReplayScaffold.rmTree(base)
        (0 until n).foreach { i =>
          write(i).write.mode(if (i == 0) "overwrite" else "append")
            .parquet(new java.io.File(base, "data").toString)
        }
        marker.createNewFile()
      }
      spark.read.parquet(new java.io.File(base, "data").toString)
    }
    def mutatedDocsCopy(i: Int): DataFrame = docs.select(
      (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
      mutateText(col("text"), i).as("text"))
    def mutatedEmbCopy(i: Int): DataFrame = Tables.embeddings(spark, dir).select(
      (col("vec_id") + lit(i.toLong * 100000000L)).as("id"),
      mutateVec(col("embedding").cast("array<double>"), col("vec_id"), i).as("vec"))
    def repMutatedDocs(n: Int): DataFrame =
      if (n > materializeAt) materialized("docs", n, mutatedDocsCopy)
      else (0 until n).map(mutatedDocsCopy).reduce(_ unionByName _)
    def repMutatedEmb(n: Int): DataFrame =
      if (n > materializeAt) materialized("emb", n, mutatedEmbCopy)
      else (0 until n).map(mutatedEmbCopy).reduce(_ unionByName _)

    // `perceptual [factors-csv] [modulus]` — the media-family probe
    // (VERDICT r11 #8): replicate the q92/q97 fixtures with MUTATED
    // rasters/waveforms (copy i mutates ~i/modulus of the source text's
    // token positions before the ASCII projection, so raster bytes and
    // energy envelopes drift with copy index — bounded near-dup
    // neighborhoods, the same discipline as the text probe) and measure
    // the shared hammingPairs blocking occupancy: pair counts and wall
    // for image dHash and onset-aligned audio. Audio copies additionally
    // carry copy-dependent edge-silence pads ((i·13)%41 front,
    // (i·7)%29 back) — invisible to the aligned fingerprint by design,
    // so the probe also exercises the alignment at scale.
    if (args.headOption.contains("perceptual")) {
      val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(4, 16))
      val pModulus = args.lift(2).map(_.trim.toInt).getOrElse(16)
      def mutateTextP(c: org.apache.spark.sql.Column, i: Int) =
        if (i == 0) c
        else array_join(transform(split(c, " "), (w, p) =>
          when(pmod(p * 37 + 11, lit(pModulus)) < i, concat(w, lit(s"_m$i"))).otherwise(w)), " ")
      def ascii(c: org.apache.spark.sql.Column) = {
        val a = regexp_replace(c, "[^ -~]", "")
        when(length(a) === 0, lit("x")).otherwise(a)
      }
      def imageCopy(i: Int): DataFrame = docs.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("media_id"),
          ascii(mutateTextP(col("text"), i)).as("a"))
        .withColumn("payload",
          expr("substring(repeat(a, int(ceil(264.0d / double(length(a))))), 1, 264)"))
        .select(col("media_id"), lit("image").as("kind"),
          concat(lit("P5\n22 12\n255\n").cast("binary"),
            col("payload").cast("binary")).as("content"))
      val encPad = udf((payload: Array[Byte], front: Int, back: Int) =>
        graft.multimodal.Multimodal.encodePcmWav(8000,
          Array.fill[Byte](front)(0x80.toByte) ++ payload ++
            Array.fill[Byte](back)(0x80.toByte)))
      def audioCopy(i: Int): DataFrame = docs.select(
          (col("doc_id") + lit(i.toLong * 100000000L)).as("media_id"),
          lit("audio").as("kind"),
          encPad(ascii(mutateTextP(col("text"), i)).cast("binary"),
            lit((i * 13) % 41), lit((i * 7) % 29)).as("content"))
      // same janino-cliff rule as the text probe: big factors materialize
      def mediaFor(kind: String, n: Int, copy: Int => DataFrame): DataFrame =
        if (n > materializeAt) materializedMedia(spark, dir, kind, n, pModulus, copy)
        else (0 until n).map(copy).reduce(_ unionByName _)
      // untimed warmup: codegen for all three pair plans. bits = 60
      // pinned (ADVICE r13 #3): the adaptive default would pay a
      // count() job inside the timed region and silently route to the
      // wide path past the cutover factor — this column must keep
      // measuring the NARROW family at every factor (the wide column
      // sits right next to it).
      graft.multimodal.Multimodal.dHashPairs(imageCopy(0), maxHamming = 6, bits = 60).count()
      graft.multimodal.Multimodal.dHashWidePairs(imageCopy(0), maxHamming = 6).count()
      graft.multimodal.Multimodal.audioAlignedPairs(audioCopy(0), maxHamming = 6).count()
      def time2p(f: => Unit): Double = math.min(time(f), time(f))
      println("factor,media,dhash_s,dhash_pairs,dhash_wide_s,dhash_wide_pairs,audio_aligned_s,audio_pairs")
      for (n <- factors) {
        val img = mediaFor("img", n, imageCopy)
        val aud = mediaFor("aud", n, audioCopy)
        var dp = 0L; var wp = 0L; var ap = 0L
        val dS = time2p { dp = graft.multimodal.Multimodal.dHashPairs(img, maxHamming = 6, bits = 60).count() }
        val wS = time2p { wp = graft.multimodal.Multimodal.dHashWidePairs(img, maxHamming = 6).count() }
        val aS = time2p { ap = graft.multimodal.Multimodal.audioAlignedPairs(aud, maxHamming = 6).count() }
        println(f"$n,${n * 5000},$dS%.2f,$dp,$wS%.2f,$wp,$aS%.2f,$ap")
      }
      spark.stop(); return
    }

    def jacc(d: DataFrame) = graft.dedup.Dedup
      .jaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.5, maxShingleFreq = 100)
    def simh(d: DataFrame) = graft.dedup.Dedup
      .simhashPairs(d, "doc_id", "text", bits = 60, maxHamming = 3)
    def simh96(d: DataFrame) = graft.dedup.Dedup
      .simhashPairs(d, "doc_id", "text", bits = 96, maxHamming = 3)

    // `simhash-width [factors-csv]` — the width-scaling probe alone:
    // 60-bit (15-bit blocks) vs 96-bit (24-bit blocks) pair mining on
    // the same mutated corpus, so the r10 256× ceiling (candidates ∝
    // N²/2¹⁵ ⇒ 14.2× wall for 4× data) can be compared against the
    // widened fingerprint without paying for the jaccard/neardup cells.
    if (args.headOption.contains("simhash-width")) {
      val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(16, 64))
      simh(repMutatedDocs(1)).count(); simh96(repMutatedDocs(1)).count() // warm
      println("factor,docs,simhash60_s,simhash60_pairs,simhash96_s,simhash96_pairs")
      def time2w(f: => Unit): Double = math.min(time(f), time(f))
      for (n <- factors) {
        val docsN = repMutatedDocs(n)
        var sp = 0L; var sp96 = 0L
        val sS = time2w { sp = simh(docsN).count() }
        val s96 = time2w { sp96 = simh96(docsN).count() }
        println(f"$n,${n * 5000},$sS%.2f,$sp,$s96%.2f,$sp96")
      }
      spark.stop(); return
    }
    // `containment-dir <documents-dir> [threshold]` — A/B the two
    // containmentPairs paths on an ARBITRARY parquet corpus (the gate
    // dry-run for a real dataset): min-of-2 wall per forced strategy at
    // the q115 config. The `auto` gate's cutover was set from the
    // mutated-replication probe below; this mode checks it against
    // whatever corpus the caller actually has (e.g. /tmp/graft-sf16x).
    if (args.headOption.contains("containment-dir")) {
      val path = args.lift(1).getOrElse("/tmp/graft-sf16x")
      val t = args.lift(2).map(_.toDouble).getOrElse(0.4)
      val d = spark.read.parquet(s"$path/documents.parquet")
        .select("doc_id", "text")
      def run(strategy: String) = graft.dedup.Dedup
        .containmentPairs(d, "doc_id", "text", n = 3, threshold = t,
          maxShingleFreq = 100, strategy = strategy).count()
      run("prefix"); run("postings") // warm
      var pp = 0L; var qp = 0L
      def time2d(f: => Unit): Double = math.min(time(f), time(f))
      val pS = time2d { pp = run("prefix") }
      val qS = time2d { qp = run("postings") }
      println(f"[containment-dir] $path docs=${d.count()} t=$t: " +
        f"prefix ${pS}%.2f s ($pp pairs), postings ${qS}%.2f s ($qp pairs)")
      spark.stop(); return
    }
    // `editverify-dir <documents-dir> [threshold]` — stage split for
    // editVerifiedPairs on an arbitrary corpus at the planner-default
    // geometry: candidate generation alone (the banded LSH join) vs the
    // full operator (length prefilter + text joins + bounded DP), so
    // the top-grower's wall is attributable to a stage, not guessed.
    if (args.headOption.contains("editverify-dir")) {
      val path = args.lift(1).getOrElse("/tmp/graft-sf16x")
      val t = args.lift(2).map(_.toDouble).getOrElse(0.8)
      val d = spark.read.parquet(s"$path/documents.parquet")
        .select("doc_id", "text")
      val (pb, pr) = graft.dedup.Dedup.lshPlanChoose(16, t)
      def cands() = graft.dedup.Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numPerm = 16, bands = pb, threshold = 0.0).count()
      def full() = graft.dedup.Dedup.editVerifiedPairs(d, "doc_id", "text",
        n = 3, numPerm = 16, threshold = t).count()
      cands(); full() // warm
      var nc = 0L; var np = 0L
      def time2e(f: => Unit): Double = math.min(time(f), time(f))
      val cS = time2e { nc = cands() }
      val fS = time2e { np = full() }
      println(f"[editverify-dir] $path docs=${d.count()} t=$t geometry=${pb}x$pr: " +
        f"candidates ${cS}%.2f s ($nc), full ${fS}%.2f s ($np pairs) — " +
        f"verify stage ≈ ${fS - cS}%.2f s")
      spark.stop(); return
    }
    // `jaccard-dir <documents-dir> [threshold]` — the jaccardPairs twin
    // of containment-dir: A/B the two-sided PPJoin prefix path (the
    // threshold > 0 branch) against the blocked postings join filtered
    // post-hoc, on an arbitrary parquet corpus. Checks whether the
    // containment-gate finding (r16: postings linear under the df cap,
    // prefix's exchanges cost more than they save) transfers to the
    // symmetric operator, whose two-sided prefix is more selective.
    if (args.headOption.contains("jaccard-dir")) {
      val path = args.lift(1).getOrElse("/tmp/graft-sf16x")
      val t = args.lift(2).map(_.toDouble).getOrElse(0.5)
      val d = spark.read.parquet(s"$path/documents.parquet")
        .select("doc_id", "text")
      def pref() = graft.dedup.Dedup
        .jaccardPairs(d, "doc_id", "text", n = 3, threshold = t,
          maxShingleFreq = 100, strategy = "prefix").count()
      def post() = graft.dedup.Dedup
        .jaccardPairs(d, "doc_id", "text", n = 3, threshold = t,
          maxShingleFreq = 100, strategy = "postings").count()
      pref(); post() // warm
      var pp = 0L; var qp = 0L
      def time2j(f: => Unit): Double = math.min(time(f), time(f))
      val pS = time2j { pp = pref() }
      val qS = time2j { qp = post() }
      println(f"[jaccard-dir] $path docs=${d.count()} t=$t: " +
        f"prefix ${pS}%.2f s ($pp pairs), postings ${qS}%.2f s ($qp pairs)")
      spark.stop(); return
    }
    // `containment [factors-csv] [modulus]` — the containment-pair probe
    // (VERDICT r12 #2): prefix-filtered containmentPairs (t = 0.4, the
    // q115 config) vs the t=0 postings path filtered post-hoc, on the
    // mutated corpus. The postings cell is capped at ≤16× — its
    // candidate set is every co-occurring pair, the regime the prefix
    // filter exists to escape.
    if (args.headOption.contains("containment")) {
      val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(16, 64))
      // strategies FORCED: this probe measures the two paths against
      // each other, so neither cell may route through the auto gate
      def contPref(d: DataFrame) = graft.dedup.Dedup
        .containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.4,
          maxShingleFreq = 100, strategy = "prefix")
      def contPost(d: DataFrame) = graft.dedup.Dedup
        .containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.0,
          maxShingleFreq = 100, strategy = "postings")
        .filter(greatest(col("cont_a"), col("cont_b")) >= 0.4)
      contPref(repMutatedDocs(1)).count(); contPost(repMutatedDocs(1)).count() // warm
      println("factor,docs,blocked_pairs,prefix_s,prefix_pairs,postings_s,postings_pairs")
      def time2c(f: => Unit): Double = math.min(time(f), time(f))
      for (n <- factors) {
        val docsN = repMutatedDocs(n)
        // the auto gate's routing signal, printed for calibration: the
        // df-capped blocked-join candidate volume Σ C(df,2)
        val vol = graft.dedup.Dedup.containmentBlockedVolume(
          docsN, "doc_id", "text", n = 3, maxShingleFreq = 100)
        var pp = 0L; var qp = 0L
        val pS = time2c { pp = contPref(docsN).count() }
        val qS = if (n <= 64) time2c { qp = contPost(docsN).count() } else Double.NaN
        println(f"$n,${n * 5000},$vol,$pS%.2f,$pp,$qS%.2f,$qp")
      }
      spark.stop(); return
    }

    // `events-skew [factors-csv] [skew-pct]` — the event-analytics skew
    // probe (VERDICT r12 #6): funnel (q111), retention (q112) and
    // session journeys (q114) are user-keyed, so one power user's whole
    // event history lands on one task. Replicate events n× and reassign
    // `skew-pct`% of ALL rows (hash-sampled) to a single user, then
    // measure each operator with and without the skew — the delta IS
    // the single-task tail the shapes must absorb.
    if (args.headOption.contains("events-skew")) {
      val factors = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(4, 16))
      val skewPct = args.lift(2).map(_.trim.toInt).getOrElse(20)
      def skewed(d: DataFrame): DataFrame = d.withColumn("user_id",
        when(pmod(hash(col("event_id")), lit(100)) < skewPct, lit(99999999L))
          .otherwise(col("user_id")))
      def funl(d: DataFrame) = graft.events.Funnels.funnel(
        d, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowSeconds = 3600L)
      def reten(d: DataFrame) = graft.events.Funnels.retentionCohorts(
        d, "user_id", "ts", "2024-01-01 00:00:00")
      def journ(d: DataFrame) = graft.events.Funnels.sessionJourneys(
        d, "user_id", "event_type", "ts", "event_id", k = 20)
      Seq(funl _, reten _, journ _).foreach(f => f(ev).count()) // warm
      println("factor,events,funnel_s,funnel_skew_s,retention_s,retention_skew_s,journeys_s,journeys_skew_s")
      def time2e(f: => Unit): Double = math.min(time(f), time(f))
      for (n <- factors) {
        val evN = rep(ev, n, "event_id")
        val evS = skewed(evN)
        val fS = time2e { funl(evN).count() }
        val fK = time2e { funl(evS).count() }
        val rS = time2e { reten(evN).count() }
        val rK = time2e { reten(evS).count() }
        val jS = time2e { journ(evN).count() }
        val jK = time2e { journ(evS).count() }
        println(f"$n,${n * 600000},$fS%.2f,$fK%.2f,$rS%.2f,$rK%.2f,$jS%.2f,$jK%.2f")
      }
      spark.stop(); return
    }

    // nearDupPairs at a FIXED plane count degrades superlinearly by
    // construction: candidate volume is ~N²/2^bandPlanes per band, so
    // 2^bandPlanes (the bucket count) must track N. Since round 7 the
    // LIBRARY DEFAULT is the cure: adaptiveBandPlanes (one plane per
    // corpus doubling, constant per-bucket occupancy) + adaptiveNumBands
    // (bands restoring the base config's recall at the threshold). The
    // probe measures the fixed legacy config (shows the cliff) and the
    // adaptive default as q51 actually runs it (shows the cure).
    def ndpFixed(d: DataFrame, bp: Int) = graft.similarity.Similarity
      .nearDupPairsFixed(d, threshold = 0.4, bandPlanes = bp, numBands = 8)
    def ndpAdaptive(d: DataFrame, n: Long) = graft.similarity.Similarity
      .nearDupPairs(d, threshold = 0.4, corpusCount = Some(n))
    // untimed warmup: codegen + JIT for all three pair plans
    jacc(repMutatedDocs(1)).count(); simh(repMutatedDocs(1)).count()
    ndpAdaptive(repMutatedEmb(1), 2000).count()
    println("factor,docs,jaccard_s,jaccard_pairs,simhash_s,simhash_pairs," +
      "neardup4_s,neardup4_pairs,adapt_planes,adapt_bands,adapt_s,adapt_pairs")
    // min of two timed runs per cell: a single cold shot folds codegen/
    // JIT/first-shuffle costs into whichever factor runs first and can
    // inflate a 5 s steady-state plan to 50 s (the BENCH_16x q26 rep
    // arrays show the same 3x rep-1 band) — growth RATIOS need
    // steady-state numbers on both sides.
    def time2(f: => Unit): Double = math.min(time(f), time(f))
    for (n <- pairFactors) {
      val docsN = repMutatedDocs(n)
      val embN = repMutatedEmb(n)
      val nVec = n * 2000L
      val bpA = graft.similarity.Similarity.adaptiveBandPlanes(nVec)
      val nbA = graft.similarity.Similarity.adaptiveNumBands(bpA, 0.4)
      var jp = 0L; var sp = 0L; var np = 0L; var npl = 0L
      val jS = time2 { jp = jacc(docsN).count() }
      val sS = time2 { sp = simh(docsN).count() }
      // fixed-config capped at 4x: at 16x its ~N²/16 candidate set (tens
      // of billions of band pairs) exhausts local shuffle-spill disk —
      // the cliff the adaptive default exists to avoid; the 4x row plus
      // the candidate-count arithmetic already demonstrates it.
      val nS = if (n <= 4) time2 { np = ndpFixed(embN, 4).count() } else Double.NaN
      val nlS = time2 { npl = ndpAdaptive(embN, nVec).count() }
      println(f"$n,${n * 5000},$jS%.2f,$jp,$sS%.2f,$sp,$nS%.2f,$np,$bpA,$nbA,$nlS%.2f,$npl")
    }
    spark.stop()
  }

  /** Per-copy materialization for the perceptual probe's large factors —
    * same janino-cliff rule as the text probe's `materialized`: an n-way
    * union plan past ~32 branches blows the generated-code compiler, so
    * big corpora land as n small append jobs and re-read as a plain scan
    * (also the realistic shape: a media corpus is files, not a union). */
  private def materializedMedia(spark: org.apache.spark.sql.SparkSession,
      dir: String, kind: String, n: Int, modulus: Int,
      copy: Int => DataFrame): DataFrame = {
    val dirKey = java.lang.Integer.toHexString(dir.hashCode)
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-probe-media-$kind-${n}x-m$modulus-$dirKey")
    val marker = new java.io.File(base, "_done")
    if (!marker.exists()) {
      graft.streaming.ReplayScaffold.rmTree(base)
      (0 until n).foreach { i =>
        copy(i).write.mode(if (i == 0) "overwrite" else "append")
          .parquet(new java.io.File(base, "data").toString)
      }
      marker.createNewFile()
    }
    spark.read.parquet(new java.io.File(base, "data").toString)
  }

  /** Candidate-dedup order experiment for `nearDupPairsFixed`
    * (`sbt "runMain graft.ScaleProbe verify-order"`): measures
    * distinct-first (dedup the band-collision pair stream before the
    * vector-fetch joins — one candidate-volume shuffle, each pair scored
    * once) against verify-first (pipeline collisions straight into the
    * codegen cosine, dropDuplicates only on the ~sparse PASSING pairs).
    * Both orders return identical rows; the question is purely which
    * exchange is cheaper, and the answer feeds the library default. */
  /** Membership-probe micro-bench: every sf0.1 corpus line probed against
    * a broadcast sorted long array of `setSize` synthetic hashes, once
    * with the linear `array_contains` and once with the codegen binary
    * search `sorted_contains` (identical inputs, noop sink, median of 3).
    * Set sizes bracket real boilerplate sets (10³–10⁵). */
  private def sortedContainsProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val docs = Tables.documents(spark, dir)
    docs.count()
    def probe(setSize: Int, sorted: Boolean): Double = {
      val arr = sequence(lit(0L), lit(setSize.toLong - 1))
        .cast("array<bigint>")
      // synthetic sorted hash set as a 1-row broadcast frame, same shape
      // as removeBoilerplate's __bp (xxhash64 values are ~uniform, so a
      // 0..n-1 ramp probed by real hashes measures pure probe cost:
      // essentially every lookup misses, the common case)
      val bp = spark.range(1).select(arr.as("__bp"))
      val lines = docs.crossJoin(broadcast(bp))
        .withColumn("__lines", split(col("text"), "\\."))
      val kept =
        if (sorted)
          lines.withColumn("__kept", filter(col("__lines"),
            l => !graft.functions.VectorFunctions.sortedContains(col("__bp"), xxhash64(l))))
        else
          lines.withColumn("__kept", filter(col("__lines"),
            l => !array_contains(col("__bp"), xxhash64(l))))
      val reps = (1 to 3).map { _ =>
        val t = System.nanoTime()
        kept.select(col("doc_id"), size(col("__kept")).as("n"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }
      reps.sorted.apply(1)
    }
    println("set_size,array_contains_s,sorted_contains_s")
    for (n <- Seq(1000, 10000, 100000)) {
      val lin = probe(n, sorted = false)
      val bin = probe(n, sorted = true)
      println(f"$n,$lin%.2f,$bin%.2f")
    }
  }

  private def verifyOrder(spark: org.apache.spark.sql.SparkSession, dir: String,
      factors: Seq[Int], which: String): Unit = {
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    def mutateVec(c: org.apache.spark.sql.Column, idc: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c
      else transform(c, (x, j) =>
        x + lit(0.15 * i) * (pmod(hash(idc, lit(i), j), lit(1000)).cast("double") / 500.0 - 1.0))
    def repMutatedEmb(n: Int): DataFrame =
      (0 until n).map(i => Tables.embeddings(spark, dir).select(
        (col("vec_id") + lit(i.toLong * 100000000L)).as("id"),
        mutateVec(col("embedding").cast("array<double>"), col("vec_id"), i).as("vec")))
        .reduce(_ unionByName _)
    def run(d: DataFrame, nVec: Long, dedupFirst: Boolean): (Double, Long) = {
      val bp = graft.similarity.Similarity.adaptiveBandPlanes(nVec)
      val nb = graft.similarity.Similarity.adaptiveNumBands(bp, 0.4)
      var pairs = 0L
      val s = time {
        pairs = graft.similarity.Similarity.nearDupPairsFixed(
          d, threshold = 0.4, bandPlanes = bp, numBands = nb,
          dedupBeforeVerify = dedupFirst,
          // same broadcast-fetch rule the adaptive wrapper derives, so the
          // probe measures the library default's join strategy
          broadcastFetch =
            nVec <= graft.similarity.Similarity.broadcastFetchMaxVectors(64)).count()
      }
      (s, pairs)
    }
    val doDistinct = which == "both" || which == "distinct"
    val doVerify = which == "both" || which == "verify"
    // untimed warmup: codegen for the requested plan shape(s)
    if (doDistinct) run(repMutatedEmb(1), 2000L, dedupFirst = true)
    if (doVerify) run(repMutatedEmb(1), 2000L, dedupFirst = false)
    println("factor,vectors,distinct_first_s,verify_first_s,distinct_pairs,verify_pairs")
    for (n <- factors) {
      val embN = repMutatedEmb(n).cache()
      embN.count()
      val nVec = n * 2000L
      val (dfS, dfP) = if (doDistinct) run(embN, nVec, dedupFirst = true) else (Double.NaN, -1L)
      val (vfS, vfP) = if (doVerify) run(embN, nVec, dedupFirst = false) else (Double.NaN, -1L)
      embN.unpersist()
      println(f"$n,$nVec,$dfS%.2f,$vfS%.2f,$dfP,$vfP")
    }
  }
  /** Round-14 probe: measure the new operator families on mutated-copy
    * corpora (the pairs-probe discipline — copy i mutates ~i/modulus of
    * token positions, so near-dup neighborhoods stay bounded and vocab
    * actually grows with factor, which is what BPE/zipf/KL/winnowing
    * see in a real crawl). ivfMaintain is probed as delta-cost vs the
    * full rebuild it is proven equivalent to: the delta is ~9% of ids
    * (%11==0 leave, %7==0 of those arriving fresh), so the maintain/
    * rebuild wall ratio is the operator's value proposition measured. */
  private def round14Probe(spark: SparkSession, dir: String, factors: Seq[Int]): Unit = {
    import graft.text.{Bpe, CorpusStats, Winnowing}
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    docs.count(); emb.count()
    val modulus = 4 * factors.max
    def mutateText(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c
      else array_join(transform(split(c, " "), (w, p) =>
        when(pmod(p * 37 + 11, lit(modulus)) < i, concat(w, lit(s"_m$i"))).otherwise(w)), " ")
    def docsCopy(i: Int): DataFrame = docs.select(
      (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
      mutateText(col("text"), i).as("text"),
      col("source"))
    def mutateVec(c: org.apache.spark.sql.Column, idc: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c
      else transform(c, (x, j) =>
        x + lit(0.15 * i) * (pmod(hash(idc, lit(i), j), lit(1000)).cast("double") / 500.0 - 1.0))
    def embCopy(i: Int): DataFrame = emb.select(
      (col("vec_id") + lit(i.toLong * 100000000L)).as("cand_id"),
      mutateVec(col("embedding").cast("array<double>"), col("vec_id"), i).as("cand_vec"))
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    println("factor,bpe4_s,winnow_s,winnow_fp,winnow_density,zipf_s,kl_s,editv_s,editv_pairs,ivf_maintain_s,ivf_rebuild_s")
    for (f <- factors) {
      val docsN = (0 until f).map(docsCopy).reduce(_ unionByName _)
        .persist()
      docsN.count()
      val bpeS = time { Bpe.merges(docsN, "text", rounds = 4) }
      var fpCount = 0L
      val winS = time {
        fpCount = Winnowing.fingerprints(docsN, "doc_id", "text", k = 4, w = 8).count()
      }
      val grams = docsN.select(
          sum(greatest(size(split(col("text"), " ")) - 4, lit(0)) + 1).as("g"))
        .collect()(0).getLong(0)
      val zipfS = time {
        CorpusStats.zipfSlope(docsN, "source", "text")
          .write.format("noop").mode("overwrite").save()
      }
      val klS = time {
        CorpusStats.klDrift(docsN, "source", "text")
          .write.format("noop").mode("overwrite").save()
      }
      var evPairs = 0L
      val evS = time {
        evPairs = graft.dedup.Dedup.editVerifiedPairs(docsN, "doc_id", "text",
          n = 3, numPerm = 16, bands = 4, threshold = 0.8).count()
      }
      docsN.unpersist()
      // ivfMaintain: build the old layout untimed, then time the delta
      // maintenance vs the full rebuild of the same new corpus
      val embN = (0 until f).map(embCopy).reduce(_ unionByName _).persist()
      embN.count()
      val oldC = embN.filter(col("cand_id") % 7 =!= 0)
      val (centroids, assignedOld) = graft.similarity.Similarity.ivfIndex(oldC, nlist = 16)
      val layout = java.nio.file.Files.createTempDirectory(s"r14-ivf-$f").toString
      graft.similarity.Similarity.writeIvfLayout(assignedOld, layout)
      val added = embN.filter(col("cand_id") % 7 === 0 && col("cand_id") % 11 =!= 0)
      val removed = embN.filter(col("cand_id") % 11 === 0).select("cand_id")
      val maintS = time {
        graft.similarity.Similarity.ivfMaintain(spark, layout, centroids, added, removed)
      }
      // rebuild writes a full layout too, so the comparison is IO-fair
      val rebuildDir = java.nio.file.Files.createTempDirectory(s"r14-ivf-rb-$f").toString
      val rebuildS = time {
        graft.similarity.Similarity.writeIvfLayout(
          graft.similarity.Similarity.assignToCentroids(
            embN.filter(col("cand_id") % 11 =!= 0), centroids), rebuildDir)
      }
      embN.unpersist()
      val density = if (grams == 0) 0.0 else fpCount.toDouble / grams
      println(f"$f,$bpeS%.2f,$winS%.2f,$fpCount,$density%.4f,$zipfS%.2f,$klS%.2f,$evS%.2f,$evPairs,$maintS%.2f,$rebuildS%.2f")
    }
  }

  /** The q130 band-geometry knob at corpus multiples (VERDICT r14 #7):
    * editVerifiedPairs under the default rows-per-band (numPerm 16 /
    * bands 4 → 4) vs a stricter 8 (numPerm 32 / bands 4) on the same
    * mutated replication. Columns report wall AND verified pair output
    * for both, so the SCALE.md row shows the knob cutting candidate
    * volume (wall) without losing the near-dup families the verify
    * stage exists to keep. */
  private def editBandProbe(spark: SparkSession, dir: String,
      factors: Seq[Int]): Unit = {
    import graft.dedup.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source").persist()
    docs.count()
    val modulus = 4 * factors.max
    def mutateText(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c
      else array_join(transform(split(c, " "), (w, p) =>
        when(pmod(p * 37 + 11, lit(modulus)) < i, concat(w, lit(s"_m$i"))).otherwise(w)), " ")
    def docsCopy(i: Int): DataFrame = docs.select(
      (col("doc_id") + lit(i.toLong * 100000000L)).as("doc_id"),
      mutateText(col("text"), i).as("text"))
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    // candidates = banded-collision pairs BEFORE the verify stage (the
    // volume the geometry actually governs); pairs = verified output
    // (recall at the edit threshold). First factor in the list doubles
    // as the JIT/codegen warmup — pass `1,16` and read the 16 row.
    // plan_* columns (VERDICT r15 #8): the PLANNER-CHOSEN geometry at
    // the operator's own (numPerm 16, t 0.8) — lshPlanChoose resolves
    // (2 bands x 8 rows) — i.e. what q130 now runs by default.
    val (planBands, planRows) = Dedup.lshPlanChoose(16, 0.8)
    println(s"[editband] planner geometry at (16, 0.8): " +
      s"$planBands bands x $planRows rows/band")
    println("factor,rows4_s,rows4_cands,rows4_pairs,rows8_s,rows8_cands,rows8_pairs,plan_s,plan_cands,plan_pairs")
    for (f <- factors) {
      val docsN = (0 until f).map(docsCopy).reduce(_ unionByName _).persist()
      docsN.count()
      var c4 = 0L; var p4 = 0L; var c8 = 0L; var p8 = 0L
      var cp = 0L; var pp = 0L
      val s4 = time {
        c4 = Dedup.minhashLshPairs(docsN, "doc_id", "text",
          n = 3, numPerm = 16, bands = 4, threshold = 0.0).count()
        p4 = Dedup.editVerifiedPairs(docsN, "doc_id", "text",
          n = 3, numPerm = 16, bands = 4, threshold = 0.8).count()
      }
      val s8 = time {
        c8 = Dedup.minhashLshPairs(docsN, "doc_id", "text",
          n = 3, numPerm = 32, bands = 4, threshold = 0.0).count()
        p8 = Dedup.editVerifiedPairs(docsN, "doc_id", "text",
          n = 3, numPerm = 32, bands = 4, threshold = 0.8).count()
      }
      val sp = time {
        cp = Dedup.minhashLshPairs(docsN, "doc_id", "text",
          n = 3, numPerm = 16, bands = planBands, threshold = 0.0).count()
        pp = Dedup.editVerifiedPairs(docsN, "doc_id", "text",
          n = 3, numPerm = 16, threshold = 0.8).count() // bands: planner
      }
      docsN.unpersist()
      println(f"$f,$s4%.2f,$c4,$p4,$s8%.2f,$c8,$p8,$sp%.2f,$cp,$pp")
    }
    docs.unpersist()
  }
}
