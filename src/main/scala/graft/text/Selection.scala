package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, IntegerType}
import graft.dedup.Dedup
import graft.operators.TopKByScore

/** Data-selection operators for training-corpus curation — the steps
  * between raw-quality filtering ([[Quality]]) and shard packing:
  * importance-weighted selection toward a target distribution (DSIR,
  * Xie et al. 2023), cross-document duplicated-span removal (the exact
  * substring dedup of Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"), and subword vocabulary induction +
  * greedy encoding (the WordPiece/BPE apply step that turns char counts
  * into real token budgets).
  *
  * The reference (sdss/cerebro) has no corpus surface at all — these are
  * parity-plus operators in the SURVEY §2.6 sense, built Spark-first.
  */
object Selection {

  import Quality.HeadTokenFanIn

  /** DSIR-style importance weights toward a target distribution
    * (Xie et al. 2023 §3: importance resampling under bag-of-ngram
    * feature LMs). `isTarget` marks the in-domain rows; each document's
    * log importance weight is `Σ_tok c_tok · (ln p̂(tok) − ln q̂(tok))`
    * with add-one-smoothed unigram LMs `p̂` over the target slice and
    * `q̂` over the full corpus (shared vocabulary V, so unseen-in-target
    * tokens get mass 1/(N_t+V)). The top `selectK` documents by
    * (weight desc, id asc) are flagged `selected` — the deterministic
    * argmax form of the paper's Gumbel-noised resample.
    *
    * Output: `(idCol, log_weight, n_tokens, selected)`.
    *
    * Scale shape (the q63 discipline): occurrence rows never shuffle on
    * the bare token — per-(doc,token) counts partial-aggregate map-side,
    * the token-stats join routes Zipf-head keys through the broadcast
    * gate ([[graft.operators.SaltedJoin.headBroadcast]]), corpus scalars
    * are a 1-row broadcast, and the per-token log-ratio scales by exact
    * DECIMAL multiplication so the per-doc sum is bit-stable under any
    * partial-aggregation order. The selection threshold is a bounded-heap
    * [[TopKByScore]] aggregate (k rows per map task cross the wire, never
    * a global sort), broadcast back as one row — the flag fuses into the
    * weight frame's scan. The hashed-feature variant for corpora whose
    * vocabulary outgrows the token join is [[hashedDsirWeights]]. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, selectK: Int): DataFrame =
    dsirWeightsBy(docs, idCol, textCol, isTarget, selectK, identity)

  /** [[dsirWeights]] with hashed n-gram features (the paper's actual
    * feature space): tokens hash into `buckets` via xxhash64, so the
    * feature-stats join key domain is FIXED at `buckets` regardless of
    * corpus vocabulary — the 100 TB shape when the raw vocabulary is
    * itself web-scale. Same math downstream; collisions merge feature
    * counts exactly as in the paper. Not SQL-oracle-replayable (DuckDB
    * has no xxhash64), so correctness is spec-pinned instead: identical
    * output to [[dsirWeights]] on a corpus where the hash is
    * collision-free at the chosen bucket count (SelectionSpec). */
  def hashedDsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, selectK: Int, buckets: Int = 1 << 16): DataFrame =
    dsirWeightsBy(docs, idCol, textCol, isTarget, selectK,
      t => pmod(xxhash64(t), lit(buckets.toLong)))

  private def dsirWeightsBy(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, selectK: Int,
      tokenKey: Column => Column): DataFrame = {
    require(selectK >= 1, s"selectK must be >= 1, got $selectK")
    val toks = docs.select(col(idCol).as("id"),
      isTarget.cast("int").as("tgt"),
      explode(TextStats.tokens(col(textCol))).as("tok"))
      .select(col("id"), col("tgt"), tokenKey(col("tok")).as("token"))
    val perDoc = toks.groupBy("id", "token")
      .agg(count(lit(1)).as("c"), max(col("tgt")).as("tgt"))
    val tf = perDoc.groupBy("token").agg(
      sum(col("c")).as("cr"),
      sum(when(col("tgt") === 1, col("c")).otherwise(0L)).as("ct"))
    val sc = tf.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"),
      count(lit(1)).as("v"))
    val weighted = graft.operators.SaltedJoin
      .headBroadcast(perDoc, tf, "token", "cr", HeadTokenFanIn)
      .crossJoin(broadcast(sc))
      .select(col("id"), col("c"),
        ((log((col("ct") + lit(1.0)) / (col("nt") + col("v"))) -
          log((col("cr") + lit(1.0)) / (col("nr") + col("v"))))
          .cast(DecimalType(27, 12)) *
          col("c").cast(DecimalType(10, 0))).as("dlc"))
      .groupBy("id")
      .agg(sum(col("dlc")).cast("double").as("lw"),
        sum(col("c")).as("n_tokens"))
    // Selection threshold: the k-th best (weight, id) via the bounded
    // heap; when the corpus has fewer than k docs the heap's worst
    // element is the global worst, so the flag is true everywhere.
    val thr = weighted.agg(
      TopKByScore.topK(selectK)(col("lw"), col("id")).as("tk"))
      .select(element_at(col("tk"), least(size(col("tk")), lit(selectK)))
        .as("thr"))
    weighted.crossJoin(broadcast(thr))
      .select(col("id").as(idCol), round(col("lw"), 6).as("log_weight"),
        col("n_tokens"),
        (col("lw") > col("thr.score") ||
          (col("lw") === col("thr.score") && col("id") <= col("thr.id")))
          .as("selected"))
  }

  /** Cross-document duplicated-span statistics and removal — the exact
    * substring dedup of Lee et al. 2022 at word-`k`-gram granularity: a
    * span of `k` consecutive words appearing in ≥ `minDocs` DISTINCT
    * documents is duplicated text (license boilerplate, syndicated
    * paragraphs, mirrored quotes), and every token any such span covers
    * is dropped from the cleaned text. Unlike document-level dedup this
    * removes the REGION, keeping the unique remainder of partially
    * copied documents.
    *
    * Output: `(idCol, n_tokens, n_dup_tokens, dup_ratio, clean_text)`.
    *
    * Scale shape: spans key the duplicate-decision exchange as 60-bit
    * md5 hashes ([[Dedup.h60]] — oracle-replayable), never span text;
    * document frequency partial-aggregates on (hash, doc); the k× span→
    * position fan-out is bounded and collapses by `distinct` on
    * (doc, pos) riding the doc key; the per-doc covered-position set is
    * bounded by document LENGTH, so the rebuild join carries one
    * doc-sized array per dirty doc and clean docs stream through the
    * left join untouched. No stage ever holds pairs of documents. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2): DataFrame = {
    require(k >= 2, s"span width must be >= 2 words, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = docs.select(col(idCol).as("id"), col(textCol).as("t"),
      split(col(textCol), " ").as("ws"))
      .withColumn("n", size(col("ws")))
    // span hashes via the compiled gram_h60 kernel: one md5 per k-gram
    // over byte ranges of the original text — the transform/slice/
    // concat_ws/h60 Column form ran through Catalyst's interpreted HOF
    // path and allocated a slice + joined string + hex string per
    // position (the q134 winnowing finding, same fix; SelectionSpec
    // pins kernel ≡ Column form). n >= k keeps full k-grams only, so
    // the kernel's short-text clamp row is never consumed.
    val grams = base.filter(col("n") >= k)
      .select(col("id"),
        posexplode(call_function("gram_h60", col("t"), lit(k)))
        .as(Seq("start", "gh")))
    val dupg = grams.groupBy("gh").agg(countDistinct(col("id")).as("dfd"))
      .filter(col("dfd") >= minDocs).select("gh")
    val cov = grams.join(dupg, Seq("gh"))
      .select(col("id"),
        explode(sequence(col("start"), col("start") + (k - 1))).as("pos"))
      .distinct()
    val pp = cov.groupBy("id")
      .agg(sort_array(collect_list(col("pos"))).as("poss"))
    val poss = coalesce(col("poss"), lit(Array.empty[Int]))
    base.join(pp, Seq("id"), "left")
      .select(col("id").as(idCol), col("n").cast("long").as("n_tokens"),
        size(poss).cast("long").as("n_dup_tokens"),
        round(size(poss).cast("double") / col("n"), 6).as("dup_ratio"),
        concat_ws(" ",
          filter(col("ws"), (w, i) => !array_contains(poss, i)))
          .as("clean_text"))
  }

  /** Induce a subword piece vocabulary from the corpus: the `topNGrams`
    * most frequent character n-grams (`minN..maxN`, occurrence-weighted
    * by word frequency, ties broken lexicographically) plus every
    * distinct character — so greedy encoding always terminates without
    * UNKs. This is the vocabulary-learning half of subword tokenization
    * (frequency-ranked pieces, the core signal BPE's merge loop also
    * follows); [[subwordStats]] is the apply half.
    *
    * The returned array is a driver-side artifact by design — a
    * tokenizer's piece table ships with the job like a model file; both
    * aggregations that produce it are vocabulary-bounded (char-n-gram
    * key space), and the top-N is a TakeOrdered (no global sort). */
  def subwordVocab(docs: DataFrame, textCol: String,
      topNGrams: Int = 40, minN: Int = 2, maxN: Int = 4): Array[String] = {
    require(minN >= 2 && maxN >= minN, s"need 2 <= minN <= maxN, got $minN..$maxN")
    val wc = docs.select(explode(TextStats.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
    val emptyInts = lit(Array.empty[Int])
    val grams = wc.select(col("c"), explode(flatten(transform(
        sequence(lit(minN), lit(maxN)),
        n => transform(
          when(length(col("word")) >= n,
            sequence(lit(1), length(col("word")) - n + 1))
            .otherwise(emptyInts),
          i => col("word").substr(i, n))))).as("gram"))
      .groupBy("gram").agg(sum(col("c")).as("f"))
      .orderBy(desc("f"), asc("gram")).limit(topNGrams)
      .select("gram").collect().map(_.getString(0))
    val chars = wc.select(col("word")).distinct()
      .select(explode(transform(
        sequence(lit(1), greatest(length(col("word")), lit(1))),
        i => col("word").substr(i, lit(1)))).as("ch"))
      .filter(col("ch") =!= "").distinct()
      .collect().map(_.getString(0))
    (grams ++ chars).distinct
  }

  /** Apply-side of subword tokenization: per-document piece counts under
    * greedy longest-match encoding against `vocab` (the
    * [[org.apache.spark.sql.graft.SubwordEncoder]] contract). The real
    * token budget of a training corpus is piece count, not whitespace
    * count — shard packing and mixture math need this number.
    *
    * Output: `(idCol, n_tokens, n_pieces, pieces_per_token)`.
    *
    * Scale shape: ONE scan-fused codegen expression pass per document —
    * no token explode, no join, zero exchanges beyond the caller's;
    * re-encoding repeated words costs O(word length) each, strictly
    * cheaper than shuffling the token stream to dedup them (the
    * per-distinct-word join the SQL oracle uses). */
  def subwordStats(docs: DataFrame, idCol: String, textCol: String,
      vocab: Array[String]): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    docs.select(col(idCol),
      size(TextStats.tokens(col(textCol))).cast("long").as("n_tokens"),
      call_function("subword_piece_count", col(textCol),
        typedlit(vocab.toSeq)).as("n_pieces"))
      .withColumn("pieces_per_token",
        round(col("n_pieces").cast("double") / col("n_tokens"), 6))
  }

  /** Per-domain keep thresholds for temperature-flattened corpus mixing
    * (the UniMax / multilingual-T5 sampling step, Xue et al. 2021 §3.2:
    * sample domain d with probability ∝ n_d^(1/τ), so high-resource
    * domains are down-weighted and the tail is boosted). Given a domain
    * column and a total budget of `budgetPermille`‰ of the corpus, the
    * per-domain acceptance rate is
    *
    *   rate_d = min(1, budget · (n_d^(1/τ) / Σ_e n_e^(1/τ)) / n_d)
    *
    * materialized as an integer per-mille threshold for the
    * deterministic hash-keep rule ([[Quality.hashKeep]]'s md5-mod-1000
    * discipline), so the sample is reproducible and
    * partitioning-independent.
    *
    * Exactness: at the default τ = 2 the weight is
    * `floor(sqrt(n_d · 10⁶))` — an integer-exact milli-sqrt (IEEE sqrt
    * is correctly rounded, so floor is engine-independent) — and every
    * step after it is integer arithmetic in DECIMAL(38,0), so the
    * thresholds replay bit-for-bit in any SQL engine (q90's oracle).
    * Other temperatures go through `pow`, whose last-ulp behavior is
    * libm-specific — spec-pinned rather than oracle-replayable, same
    * trade as [[hashedDsirWeights]].
    *
    * Scale shape: one map-side-partial COUNT per domain (domains are a
    * vocabulary — languages × sources — not data-scale), a 1-row totals
    * broadcast crossJoin, and pure per-row arithmetic. Output:
    * `(domainCol, n_docs, keep_permille)`. */
  def temperatureMixThresholds(docs: DataFrame, domainCol: String,
      budgetPermille: Int, temperature: Double = 2.0): DataFrame = {
    require(budgetPermille >= 0 && budgetPermille <= 1000,
      s"budgetPermille must be in [0, 1000], got $budgetPermille")
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val counts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
    val wRaw =
      if (temperature == 2.0) sqrt(col("n_docs").cast("double") * lit(1000000.0))
      else pow(col("n_docs").cast("double"), lit(1.0 / temperature)) * lit(1000.0)
    val weighted = counts.withColumn("w", floor(wRaw).cast(DecimalType(38, 0)))
    val totals = weighted.agg(
      sum(col("w")).cast(DecimalType(38, 0)).as("s"),
      sum(col("n_docs")).cast(DecimalType(38, 0)).as("n_total"))
    weighted.crossJoin(broadcast(totals))
      .withColumn("keep_permille",
        least(lit(1000L),
          expr(s"(n_total * $budgetPermille * w) div (s * cast(n_docs as decimal(38,0)))"))
          .cast("bigint"))
      .select(col(domainCol), col("n_docs"), col("keep_permille"))
  }

  /** Apply [[temperatureMixThresholds]]: keep each row iff its key's
    * deterministic hash lands under its domain's per-mille threshold
    * (identical rule to [[Quality.stratifiedSample]], so mixed and
    * stratified samples compose and stay reproducible across runs and
    * partitionings). The thresholds side is domain-cardinality rows —
    * always broadcast — so the corpus never shuffles. Keeps the
    * `keep_permille` column so downstream can reweight if needed. */
  def temperatureSample(docs: DataFrame, domainCol: String, keyCol: String,
      budgetPermille: Int, temperature: Double = 2.0,
      salt: String = "graft"): DataFrame = {
    val thresholds = temperatureMixThresholds(docs, domainCol, budgetPermille,
      temperature).drop("n_docs")
    docs.join(broadcast(thresholds), domainCol)
      .filter(
        Dedup.h32(concat(lit(salt), lit(":"), col(keyCol).cast("string"))) % 1000 <
          col("keep_permille"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir", algorithm A-ES): draw
    * per-row key `−ln(u) / w` with u uniform on (0,1); the k SMALLEST
    * keys are a weighted sample without replacement whose inclusion
    * probabilities track the weights — the standard primitive for
    * quality-weighted corpus subsetting ("sample 1M docs ∝ score").
    *
    * Spark-first determinism: u = (h60(salt:key) + 0.5) / 2^60 replaces
    * the RNG, so the sample is REPRODUCIBLE across runs, partitionings
    * and engines (the property a training pipeline needs for data
    * lineage), and −ln(u) passes through DECIMAL(27,12) — the repo's
    * cross-engine log discipline — so the key, and therefore the whole
    * sample, replays exactly in the DuckDB oracle. Selection is
    * `orderBy(key).limit(k)` which plans as TakeOrderedAndProject:
    * bounded per-partition heaps, k rows to the driver — no global sort
    * shuffle of the corpus, the same bounded-selection shape as the
    * top-k UDAF. `weight` must be strictly positive. Keeps all input
    * columns plus `es_key`. */
  def weightedSample(docs: DataFrame, keyCol: String, weight: Column, k: Int,
      salt: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = Dedup.h60(concat(lit(salt), lit(":"), col(keyCol).cast("string")))
    val u = (h.cast("double") + lit(0.5)) / lit(math.pow(2, 60))
    val nl = (-log(u)).cast(DecimalType(27, 12))
    // enforce the documented strictly-positive weight contract at run
    // time (ADVICE r12 #5): a zero/negative weight would yield an
    // Infinity/negative es_key that sorts first and silently poisons
    // the sample — fail loudly instead, mirroring the require() style
    val w = when(weight.cast("double") > 0.0, weight.cast("double"))
      .otherwise(raise_error(concat(
        lit("weightedSample: weight must be strictly positive, got "),
        weight.cast("string"), lit(" for key "), col(keyCol).cast("string"))))
    docs.withColumn("es_key", nl.cast("double") / w)
      .orderBy(col("es_key"), col(keyCol))
      .limit(k)
  }

  /** LEAKAGE-SAFE train/val/test split: the unit of assignment is the
    * near-duplicate CLUSTER, not the document. A per-document hash split
    * silently leaks test data into training whenever a near-dup of a
    * test doc lands in train — the standard eval-contamination failure
    * every serious corpus pipeline guards against — so documents are
    * first clustered (minhash-LSH candidate pairs → connected
    * components, [[graft.dedup.Dedup.dedupByMinhash]]) and the whole
    * cluster inherits the split of its canonical (minimum) id:
    * `bucket = h60(salt:cluster) % 1000` against cumulative permille
    * ranges. Singleton clusters degrade to the plain hash split.
    * Deterministic across runs, partitionings and engines (the split is
    * corpus lineage, so it must replay bit-for-bit).
    *
    * Output `(id, cluster, split)`, one row per document.
    * `splits` are `(name, permille)` and must sum to 1000.
    *
    * Scale shape: everything is the q44 cluster pipeline (banded
    * signatures, candidate pairs, label propagation — never all-pairs)
    * plus one hash projection; the split assignment itself adds no
    * exchange. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Int)], salt: String = "graft",
      n: Int = 3, numPerm: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000,
      s"split permilles must sum to 1000, got $splits")
    require(splits.forall(_._2 > 0), s"every split needs permille > 0: $splits")
    val clusters = Dedup.dedupByMinhash(docs, idCol, textCol,
        n = n, numPerm = numPerm, bands = bands, threshold = threshold)
      .select(col("id"), col("cluster"))
    val bucket = Dedup.h60(
      concat(lit(salt), lit(":"), col("cluster").cast("string"))) % 1000
    val cum = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val assigned = splits.zip(cum).reverse.tail.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), hi)) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    clusters.select(col("id"), col("cluster"), assigned.as("split"))
  }
  /** Per-group percent-rank calibration of a score column — the mixing
    * prerequisite: a global quality threshold over raw scores lets one
    * source's score DISTRIBUTION dominate the mix, so pipelines
    * calibrate each document's score to its within-source quantile
    * first (pct = fraction of the source's docs STRICTLY below, the SQL
    * percent_rank definition; 0 when the source has one doc).
    *
    * Scale shape — no corpus-sized window: percent_rank over a
    * partition sorts every row of the group, which at 100 TB is a full
    * corpus sort. Scores arriving here are ROUNDED (bounded distinct
    * values), so the CDF is computed on the (group, score) VALUE table
    * instead — counts per value, a running sum over the value-bounded
    * frame, then a join back to rows. The window sorts distinct scores
    * per group, never documents.
    *
    * Emits (group, score, n_below, n_group, pct) joined onto the input
    * rows; pct = n_below/(n_group-1) in one IEEE division, rounded. */
  def calibratePercentRank(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.groupBy(col(groupCol).as("g"), col(scoreCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val byG = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = vals
      .withColumn("cum", sum(col("cnt")).over(byG))
      .withColumn("n_group", sum(col("cnt")).over(Window.partitionBy("g")))
      .select(col("g"), col("v"), (col("cum") - col("cnt")).as("n_below"),
        col("n_group"))
    df.join(cdf, df(groupCol) === cdf("g") && df(scoreCol) === cdf("v"))
      .drop("g", "v")
      .withColumn("pct",
        when(col("n_group") === 1, lit(0.0))
          .otherwise(round(col("n_below").cast("double") /
            (col("n_group") - 1).cast("double"), 6)))
  }
}
