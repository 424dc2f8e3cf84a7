package graft

import org.apache.spark.sql.functions._
import graft.text.Selection

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------------
  // DSIR importance weights
  // -------------------------------------------------------------------

  test("dsirWeights: target-like docs outrank off-target docs; top-k flagged") {
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma", "en"),
      (2L, "alpha beta beta alpha alpha", "en"),
      (3L, "delta epsilon zeta delta eta", "de"),
      (4L, "alpha beta gamma alpha beta", "de"), // target-LIKE but off-target
      (5L, "zeta eta epsilon delta zeta", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Selection.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", selectK = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5)
    // target-vocab docs (1, 2, 4) must outweigh off-target-vocab (3, 5):
    // doc 4 shares the target's tokens even though it isn't target itself
    val w = out.view.mapValues(_.getDouble(1)).toMap
    assert(Seq(1L, 2L, 4L).map(w).min > Seq(3L, 5L).map(w).max)
    // exactly k=3 selected, and they are the 3 largest weights
    val sel = out.values.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(sel == Set(1L, 2L, 4L))
    // n_tokens carried through
    assert(out(1L).getLong(2) == 5L)
  }

  test("dsirWeights: selectK >= corpus size flags every doc") {
    val docs = Seq((1L, "a b", "en"), (2L, "c d", "fr")).toDF("doc_id", "text", "lang")
    val out = Selection.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", selectK = 10).collect()
    assert(out.forall(_.getBoolean(3)))
  }

  test("hashedDsirWeights: identical to token-level when buckets are collision-free") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    // verify the premise: no two distinct tokens share a bucket at 2^20
    val buckets = 1 << 20
    val coll = docs.select(explode(split(col("text"), " ")).as("t")).distinct()
      .select(pmod(xxhash64(col("t")), lit(buckets.toLong)).as("b"))
      .groupBy("b").count().filter(col("count") > 1).count()
    assert(coll == 0, "fixture tokens collide; pick a larger bucket count")
    val a = Selection.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", selectK = 20).orderBy("doc_id").collect()
    val b = Selection.hashedDsirWeights(docs, "doc_id", "text",
      col("lang") === "en", selectK = 20, buckets = buckets)
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  // -------------------------------------------------------------------
  // Duplicated-span removal
  // -------------------------------------------------------------------

  test("gram_h60 kernel ≡ the transform/slice/concat_ws/h60 Column form") {
    // q77's span hashes: the compiled kernel must replay the interpreted
    // HOF form bit-for-bit (same h60 = first 15 md5 hex digits over the
    // identical joined-string bytes), including multi-space/empty-word
    // texts, unicode, and the short-text whole-run clamp.
    import graft.dedup.Dedup
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a  b c d e f g", "short", "", "é ß words here and there λ x",
      (1 to 40).map(i => s"w${i % 5}").mkString(" "))
    val df = texts.toDF("t")
    Seq(2, 6).foreach { k =>
      def old(t: org.apache.spark.sql.Column) = {
        val ws = split(t, " ")
        transform(sequence(lit(0), greatest(size(ws) - k, lit(0))),
          i => Dedup.h60(concat_ws(" ", slice(ws, i + 1, lit(k)))))
      }
      val rows = df.select(call_function("gram_h60", col("t"), lit(k)).as("got"),
        old(col("t")).as("want"), col("t")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"k=$k text='${r.getString(2)}'")
      }
    }
  }

  test("duplicatedSpans: shared 6-gram span removed, unique text kept") {
    val span = "s1 s2 s3 s4 s5 s6"
    val docs = Seq(
      (1L, s"u1 u2 $span u3 u4"),      // span in the middle
      (2L, s"$span v1 v2 v3 v4 v5"),   // span at the front
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8"), // no duplicated span
      (4L, "t1 t2 t3")                 // shorter than k: never spans
    ).toDF("doc_id", "text")
    val out = Selection.duplicatedSpans(docs, "doc_id", "text", k = 6)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(out(1L) == ((10L, 6L, "u1 u2 u3 u4")))
    assert(out(2L) == ((11L, 6L, "v1 v2 v3 v4 v5")))
    assert(out(3L) == ((8L, 0L, "w1 w2 w3 w4 w5 w6 w7 w8")))
    assert(out(4L) == ((3L, 0L, "t1 t2 t3")))
  }

  test("duplicatedSpans: overlapping duplicated spans cover the union of positions") {
    // docs 1/2 share a 7-token run => two overlapping 6-gram spans in each;
    // covered positions are the union (7 tokens), not 12
    val run = "r1 r2 r3 r4 r5 r6 r7"
    val docs = Seq(
      (1L, s"$run x1 x2"),
      (2L, s"y1 $run y2")
    ).toDF("doc_id", "text")
    val out = Selection.duplicatedSpans(docs, "doc_id", "text", k = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(4))).toMap
    assert(out(1L) == ((7L, "x1 x2")))
    assert(out(2L) == ((7L, "y1 y2")))
  }

  test("duplicatedSpans: a span repeated only WITHIN one doc is not cross-doc dup") {
    val docs = Seq(
      (1L, "p1 p2 p3 p4 p5 p6 z p1 p2 p3 p4 p5 p6"),
      (2L, "q1 q2 q3 q4 q5 q6 q7")
    ).toDF("doc_id", "text")
    val out = Selection.duplicatedSpans(docs, "doc_id", "text", k = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L && out(2L) == 0L)
  }

  // -------------------------------------------------------------------
  // Subword vocabulary + greedy encoding
  // -------------------------------------------------------------------

  test("subwordVocab: top n-grams by weighted frequency plus all chars") {
    // "abab" x3, "cd" x1: weighted 2-grams ab=6 (2 per word x3), ba=3, cd=1;
    // 3-grams aba=3, bab=3; 4-gram abab=3
    val docs = Seq((1L, "abab abab abab cd")).toDF("doc_id", "text")
    val vocab = Selection.subwordVocab(docs, "text", topNGrams = 2).toSet
    // top-2 by (f desc, gram asc): ab(6) then aba(3) [aba < abab < ba < bab lexicographically]
    assert(vocab == Set("ab", "aba", "a", "b", "c", "d"))
  }

  test("subwordStats: greedy longest-match piece counts; empty-word safe") {
    val docs = Seq(
      (1L, "abab cd"),   // greedy with {ab,aba,chars}: aba+b = 2, c+d = 2 -> 4
      (2L, "xyz"),       // no vocab chars for x,y,z -> UNK per char -> 3
      (3L, "ab  ab")     // double space: empty middle word contributes 0 -> 2
    ).toDF("doc_id", "text")
    val vocab = Array("ab", "aba", "a", "b", "c", "d")
    val out = Selection.subwordStats(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 4L)))
    assert(out(2L) == ((1L, 3L)))
    assert(out(3L) == ((3L, 2L)))
  }

  test("subwordStats plan is scan-fused: no exchange, stays in codegen") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val vocab = Array("ab", "a", "b")
    val p = Selection.subwordStats(docs, "doc_id", "text", vocab)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"expected no shuffle, got:\n$p")
    // "*(1)" prefixes = every operator inside whole-stage-codegen stage 1
    assert(p.contains("*(1)"), s"expected codegen, got:\n$p")
  }

  test("subword_piece_count matches a reference greedy implementation on the corpus") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val vocab = Selection.subwordVocab(docs, "text")
    // reference greedy re-implementation (independent of SubwordEncoder)
    def refCount(text: String): Long = {
      val byLen = vocab.groupBy(_.length).view.mapValues(_.toSet).toMap
      val maxLen = vocab.map(_.length).max
      text.split(" ", -1).map { w =>
        var p = 0; var c = 0L
        while (p < w.length) {
          val m = (math.min(maxLen, w.length - p) to 1 by -1)
            .find(l => byLen.get(l).exists(_.contains(w.substring(p, p + l))))
          c += 1; p += m.getOrElse(1)
        }
        c
      }.sum
    }
    val rows = docs.select(col("doc_id"), col("text")).collect()
    val got = Selection.subwordStats(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(got(r.getLong(0)) == refCount(r.getString(1)),
        s"doc ${r.getLong(0)} piece count mismatch")
    }
  }

  // -------------------------------------------------------------------
  // Temperature-flattened domain mixing
  // -------------------------------------------------------------------

  private def mixDocs = {
    // skewed domains: 400 "en", 90 "de", 10 "zh"
    val rows = (0 until 400).map(i => (i.toLong, "en")) ++
      (400 until 490).map(i => (i.toLong, "de")) ++
      (490 until 500).map(i => (i.toLong, "zh"))
    rows.toDF("doc_id", "lang")
  }

  test("temperatureMixThresholds: tau=1 reduces to proportional sampling") {
    // w_d = 1000*n_d exactly, so every domain's threshold is the budget
    val thr = Selection.temperatureMixThresholds(mixDocs, "lang",
      budgetPermille = 250, temperature = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thr == Map("en" -> 250L, "de" -> 250L, "zh" -> 250L))
  }

  test("temperatureMixThresholds: tau=2 boosts the tail, damps the head") {
    val thr = Selection.temperatureMixThresholds(mixDocs, "lang",
      budgetPermille = 150)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thr("zh") > thr("de") && thr("de") > thr("en"),
      s"thresholds not flattening-ordered: $thr")
    // replay the integer math exactly
    val n = Map("en" -> 400L, "de" -> 90L, "zh" -> 10L)
    val w = n.view.mapValues(c => math.floor(math.sqrt(c.toDouble * 1e6)).toLong).toMap
    val s0 = w.values.sum; val nTot = n.values.sum
    n.keys.foreach { d =>
      val expect = math.min(1000L, nTot * 150L * w(d) / (s0 * n(d)))
      assert(thr(d) == expect, s"$d: got ${thr(d)}, expect $expect")
    }
    // budget conservation within per-domain floor rounding (no clamps at 150)
    assert(thr.values.forall(_ < 1000))
    val kept = n.map { case (d, c) => c * thr(d) }.sum / 1000.0
    val budget = nTot * 150L / 1000.0
    assert(math.abs(kept - budget) <= n.size,
      s"expected-kept $kept vs budget $budget drifts past rounding slack")
  }

  test("temperatureMixThresholds: extreme flattening clamps rare domains at 1000") {
    val thr = Selection.temperatureMixThresholds(mixDocs, "lang",
      budgetPermille = 900)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(thr("zh") == 1000L, s"rare domain should saturate: $thr")
  }

  test("temperatureSample: membership is exactly the hash rule, repartition-stable") {
    val docs = mixDocs
    val thr = Selection.temperatureMixThresholds(docs, "lang", 300)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = Selection.temperatureSample(docs, "lang", "doc_id", 300)
      .select("doc_id").as[Long].collect().sorted
    val expect = docs.select(col("doc_id"), col("lang"),
        graft.dedup.Dedup.h32(concat(lit("graft:"), col("doc_id").cast("string"))).as("h"))
      .collect()
      .filter(r => r.getLong(2) % 1000 < thr(r.getString(1)))
      .map(_.getLong(0)).sorted
    assert(got.sameElements(expect))
    val again = Selection.temperatureSample(docs.repartition(7), "lang", "doc_id", 300)
      .select("doc_id").as[Long].collect().sorted
    assert(got.sameElements(again), "sample changed under repartition")
  }

  // -------------------------------------------------------------------
  // Weighted sampling without replacement (A-ES)
  // -------------------------------------------------------------------

  test("weightedSample: deterministic, partitioning-invariant, k >= N returns everything") {
    val docs = (1L to 500L).map(i => (i, 1.0 + (i % 7))).toDF("id", "w")
    val run = (d: org.apache.spark.sql.DataFrame) =>
      Selection.weightedSample(d, "id", col("w"), k = 50)
        .select("id").as[Long].collect().toSeq
    val a = run(docs)
    assert(a.size == 50 && a == run(docs.repartition(13)))
    val all = Selection.weightedSample(docs, "id", col("w"), k = 1000).collect()
    assert(all.length == 500)
    assert(all.forall(_.getAs[Double]("es_key") > 0))
  }

  test("weightedSample: inclusion tracks weight (heavy class overrepresented)") {
    // 1000 rows, 500 with w=10 and 500 with w=1; a k=200 A-ES sample
    // should include heavy rows at ~10x the light rate
    val docs = (1L to 1000L).map(i => (i, if (i % 2 == 0) 10.0 else 1.0))
      .toDF("id", "w")
    val sample = Selection.weightedSample(docs, "id", col("w"), k = 200)
      .select("id").as[Long].collect()
    val heavy = sample.count(_ % 2 == 0)
    assert(heavy > 150, s"heavy class got $heavy of 200 — weights not honored")
  }

  test("weightedSample: the k smallest keys are exactly the driver-replayed A-ES order") {
    val docs = (1L to 300L).map(i => (i, (1 + i % 5).toDouble)).toDF("id", "w")
    val got = Selection.weightedSample(docs, "id", col("w"), k = 40)
      .select("id", "es_key").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // independent reference: same hash/log/division replayed in Scala
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString.take(15), 16)
    val keys = (1L to 300L).map { i =>
      val u = (h60(s"graft:$i").toDouble + 0.5) / math.pow(2, 60)
      val nl = BigDecimal(-math.log(u)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      (i, nl.toDouble / (1 + i % 5).toDouble)
    }
    val expect = keys.sortBy { case (i, k) => (k, i) }.take(40)
    assert(got.map(_._1).toSeq == expect.map(_._1),
      "TakeOrdered selection differs from the replayed A-ES ranking")
  }

  test("weightedSample: a non-positive weight fails loudly, not silently first") {
    val docs = Seq((1L, 2.0), (2L, 0.0), (3L, 1.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Selection.weightedSample(docs, "id", col("w"), k = 3).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("strictly positive"),
      s"expected the weight guard, got: ${e.getMessage}")
  }

  test("leakageSafeSplit: clusters never straddle splits; near-dups travel together") {
    val docs001 = Tables.documents(spark, sf())
    val out = Selection.leakageSafeSplit(docs001, "doc_id", "text",
      Seq(("train", 800), ("val", 100), ("test", 100))).collect()
    assert(out.length == docs001.count())
    // the load-bearing invariant: one split per cluster
    val splitsPerCluster = out.groupBy(_.getLong(1)).values
      .map(_.map(_.getString(2)).distinct.length)
    assert(splitsPerCluster.forall(_ == 1),
      "a near-dup cluster was split across train/val/test — leakage")
    // multi-doc clusters exist in the fixture (otherwise the test is vacuous)
    assert(out.groupBy(_.getLong(1)).values.exists(_.length > 1),
      "fixture has no multi-doc cluster; invariant untested")
    // all three splits are populated at this corpus size
    assert(out.map(_.getString(2)).distinct.sorted.toSeq == Seq("test", "train", "val"))
    // permille validation fails fast
    intercept[IllegalArgumentException] {
      Selection.leakageSafeSplit(docs001, "doc_id", "text", Seq(("train", 500)))
    }
  }
}
