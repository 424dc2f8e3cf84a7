package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.{ScoredId, TopKByScore}
import graft.sources.Backoff

/** Property-style invariant tests (SURVEY.md §5 #3) over seeded random
  * inputs. DataFrame properties use few, larger random frames (each Spark
  * job costs ~0.5s); pure-Scala properties run hundreds of cases. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def randWords(n: Int): String =
    Seq.fill(n)(s"w${rnd.nextInt(30)}").mkString(" ")

  test("property: TopKByScore == sort.take(k) on random inputs") {
    val agg = new TopKByScore(5)
    (1 to 300).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(40))(ScoredId(
        math.round(rnd.nextDouble() * 10) / 10.0, rnd.nextInt(10).toLong))
      val expected = xs.sortBy(x => (-x.score, x.id)).take(5)
      val viaReduce = xs.foldLeft(agg.zero)(agg.reduce)
      assert(viaReduce == expected)
      val cut = rnd.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      assert(agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)) == expected)
    }
  }

  test("property: backoff is monotone non-decreasing up to the cap") {
    (1 to 20).foreach { _ =>
      val b = Backoff(initialDelayMs = 1 + rnd.nextInt(5000), jitter = 0.0)
      val delays = Seq.fill(15)(b.nextDelayMs())
      delays.sliding(2).foreach { case Seq(a, c) => assert(c >= a || c == 3600000) }
      assert(delays.last <= 3600000)
    }
  }

  test("property: dedup idempotence + group cardinality conservation") {
    (1 to 3).foreach { _ =>
      val docs = (0 until 100).map(i => (i.toLong, randWords(3 + rnd.nextInt(5)))).toDF("doc_id", "text")
      val groups = Dedup.exactGroups(docs, "doc_id", "text")
      // every row lands in exactly one group
      assert(groups.agg(sum("n_dups")).as[Long].head() == 100L)
      // survivor ids are real doc ids
      assert(groups.join(docs, groups("survivor_id") === docs("doc_id"), "left_anti").count() == 0)
      // dedup of the deduped survivors is a no-op
      val survivors = docs.join(groups.select(col("survivor_id").as("doc_id")), Seq("doc_id"), "left_semi")
      assert(Dedup.exactGroups(survivors, "doc_id", "text").count() == survivors.count())
    }
  }

  test("property: minhash est_jaccard is 1.0 for identical texts, in [0,1] always") {
    val docs = (0 until 40).map { i =>
      val base = randWords(8)
      (i.toLong, if (i % 2 == 1) null else base) // odd ids dup the previous even id
    }.map { case (i, t) => (i, Option(t).getOrElse("")) }
      .zipWithIndex.map { case ((i, t), idx) =>
        (i, if (t.nonEmpty) t else randWords(8))
      }.toDF("doc_id", "text")
    val sigs = Dedup.withMinhashSignature(docs, "doc_id", "text", 3, 16)
    assert(sigs.count() == 40)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.0)
      .select("est_jaccard").as[Double].collect()
    assert(pairs.forall(j => j >= 0.0 && j <= 1.0))
    // identical text => identical signature => est 1.0 via any band
    val dup = docs.limit(1).select(col("doc_id") + 1000, col("text"))
      .toDF("doc_id", "text").unionByName(docs)
    val hit = Dedup.minhashLshPairs(dup, "doc_id", "text", 3, 16, 4, 0.0)
      .filter(col("id_b") === col("id_a") + 1000)
    assert(hit.select("est_jaccard").as[Double].collect().forall(_ == 1.0))
  }

  test("property: rolling window bounds (max >= value, count >= 1, mean within [min,max])") {
    val n = 200
    val df = (0 until n).map { i =>
      (i.toLong % 7, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextDouble() * 100)
    }.toDF("k", "ts", "v")
    val w = graft.batch.Rolling
    val out = df.select(col("v"),
        w.rollingMean(col("v"), col("ts"), 60, col("k")).as("m"),
        w.rollingMax(col("v"), col("ts"), 60, col("k")).as("x"),
        w.rollingCount(col("v"), col("ts"), 60, col("k")).as("c"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Double]("x") >= r.getAs[Double]("v") - 1e-9)
      assert(r.getAs[Long]("c") >= 1)
      assert(r.getAs[Double]("m") <= r.getAs[Double]("x") + 1e-9)
    }
  }

  test("property: normalize never leaves a null time and preserves row count of non-empty points") {
    import graft.model.TelemetryPoint
    (1 to 3).foreach { _ =>
      val pts = (0 until 50).map { i =>
        TelemetryPoint(s"m${i % 3}", Map("i" -> i.toString),
          Map("v" -> rnd.nextDouble()), null,
          if (rnd.nextBoolean()) new Timestamp(1700000000000L + i) else null,
          None, None)
      }
      val out = graft.transforms.Transforms.normalize(Map("g" -> "1"))(pts.toDF())
      assert(out.count() == 50)
      assert(out.filter(col("time").isNull).count() == 0)
      assert(out.filter(element_at(col("tags"), "g") =!= "1").count() == 0)
    }
  }
}
