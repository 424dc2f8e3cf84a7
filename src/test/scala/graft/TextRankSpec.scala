package graft

import org.apache.spark.sql.functions._
import graft.text.TextRank

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("hub word dominates; scores match an independent JVM power-iteration replay") {
    // "hub" is adjacent to every other content word; spokes only ever
    // touch the hub (star graph) -> hub must out-rank all spokes
    val docs = Seq(
      "hub aa hub bb hub cc",
      "hub aa hub bb hub cc",
      "hub cc hub aa hub bb").toDF("text")
    val got = TextRank.textRank(docs, "text", iterations = 10, k = 10).collect()
    assert(got.head.getString(0) == "hub", s"star center must rank 1st: ${got.toSeq}")

    // independent replay on driver-side doubles with the same
    // DECIMAL(27,12) rounding of each contribution
    val texts = docs.as[String].collect()
    val bigrams = texts.flatMap { t =>
      val a = t.split(" ", -1); a.zip(a.drop(1))
    }.filter { case (x, y) => x != y }
    val sym = bigrams ++ bigrams.map(_.swap)
    val w = sym.groupBy(identity).map { case (e, xs) => e -> xs.size.toLong }
      .filter(_._2 >= 2L)
    val wTot = w.groupBy(_._1._1).map { case (u, es) => u -> es.values.sum }
    val frac = w.map { case ((u, v), c) => (u, v) -> c.toDouble / wTot(u).toDouble }
    val nodes = frac.keySet.map(_._1)
    def dec12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var s = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 10) {
      s = nodes.map { v =>
        val contrib = frac.collect { case ((u, vv), f) if vv == v => dec12(f * s(u)) }.sum
        v -> ((1.0 - 0.85) + 0.85 * contrib.toDouble)
      }.toMap
    }
    got.foreach { r =>
      val want = s(r.getString(0))
      assert(r.getDouble(1) == want, s"${r.getString(0)}: ${r.getDouble(1)} != replay $want")
    }
    // full ordering matches the replay's (score desc, word asc)
    val wantOrder = s.toSeq.sortBy { case (wd, sc) => (-sc, wd) }.map(_._1).take(10)
    assert(got.map(_.getString(0)).toSeq == wantOrder)
  }

  test("minCount prunes symmetrically; pruned-out words vanish from the ranking") {
    // "rare zz" adjacency occurs once -> both directions pruned at
    // minCount=2; zz has no other edges so it leaves the graph entirely
    val docs = Seq("a b a b a b", "rare zz a b").toDF("text")
    val got = TextRank.textRank(docs, "text", iterations = 3, minCount = 2L, k = 10)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b"), s"only the a-b edge survives minCount=2: $got")
  }

  test("plan shape: iterations broadcast the rank vector over leaf-truncated edges; only live leaves stay resident") {
    // Contract since r17 (OPTIMIZATION_r17.md q107): the edge table and
    // every-3rd-iteration rank vector are EAGER plan leaves
    // (Leaf.leaf), so AQE's per-stage re-optimization stays O(1) in
    // iteration depth (the nested plan made driver planning quadratic —
    // 2.8 s of q107's 4.7 s wall). This replaces the r13 "zero resident
    // caches" pin: a checkpoint leaf is NOT an InMemoryRelation cache
    // (no extra materialization pass — the checkpoint IS the one
    // required computation), and superseded rank leaves are freed
    // eagerly inside textRank; only the LIVE leaves the returned plan
    // reads (edges + latest rank) stay resident, GC-cleaned with the
    // result.
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = TextRank.textRank(docs, "text", iterations = 5, k = 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "rank vector must broadcast to the edges — a sort-merge join would reshuffle the edge table every iteration")
    // truncation at i=3 leaves iterations 4..5 in the returned plan,
    // each broadcasting the rank vector onto the edge leaf
    assert("BroadcastHashJoin \\[u#".r.findAllIn(plan).size == 2,
      s"post-truncation iterations join the edge leaf via broadcast:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"edges and the truncated rank vector must be plan leaves:\n$plan")
    df.collect()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 2,
      s"only the live leaves (edge table + latest rank checkpoint) may stay resident, got ${added.size}")
  }

  test("spark.graft.checkpoint.dir routes leaf truncation to reliable checkpoints; results and ordering unchanged") {
    // VERDICT r17 #2/#4: localCheckpoint is executor-local (not
    // fault-tolerant); the conf swaps every Leaf.leaf to a reliable
    // checkpoint() on a durable dir. Fallback (conf unset) is the
    // localCheckpoint path pinned by the plan-shape test above.
    val docs = Seq(
      "hub aa hub bb hub cc",
      "hub aa hub bb hub cc",
      "hub cc hub aa hub bb").toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val base = rows(TextRank.textRank(docs, "text", iterations = 5, k = 10))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(graft.Leaf.DirConf, dir)
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val got = rows(TextRank.textRank(docs, "text", iterations = 5, k = 10))
      assert(got == base, s"reliable-checkpoint run must be bit-identical: $got vs $base")
      assert(spark.sparkContext.getPersistentRDDs.keySet == before,
        "reliable checkpoints hold no resident executor blocks")
      // the leaves actually went through the durable dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files written under $dir")
    } finally {
      spark.conf.unset(graft.Leaf.DirConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
