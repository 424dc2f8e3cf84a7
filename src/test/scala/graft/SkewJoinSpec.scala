package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

/** The broadcast-head skew gate (SaltedJoin.headBroadcast) — wired into
  * Quality.unigramCrossEntropy / tfidfKeywords — must be output-identical
  * to the plain join, and must route the Zipf head off the shuffle. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish fixture: "the" lands in every doc (df = nDocs), a mid token
  // in a fifth of them, the rest are unique per doc.
  private def fixture(nDocs: Int) = {
    val rows = (0 until nDocs).flatMap { id =>
      Seq((id.toLong, "the", 5L)) ++
        (if (id % 5 == 0) Seq((id.toLong, "mid", 2L)) else Nil) :+
        ((id.toLong, s"tok$id", 1L))
    }.toDF("id", "token", "c")
    val stats = rows.groupBy("token").agg(count(lit(1)).as("df"))
    (rows, stats)
  }

  test("headBroadcast equals the plain join on a Zipf fixture (threshold crossed)") {
    val (rows, stats) = fixture(200)
    val plain = rows.join(stats, Seq("token"))
    val hybrid = SaltedJoin.headBroadcast(rows, stats, "token", "df", headFanIn = 50)
    assert(hybrid.columns.toSet == plain.columns.toSet)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("token", "id", "c", "df").as[(String, Long, Long, Long)]
      .collect().sorted.toSeq
    assert(key(hybrid) == key(plain))
    // the head key rides the BROADCAST branch: the shuffle-side stats
    // frame carries no key above the fan-in bound, so no reducer ever
    // receives more than headFanIn rows for one key
    val tailStats = stats.filter(col("df") <= 50)
    assert(tailStats.filter(col("token") === "the").isEmpty)
    assert(tailStats.agg(max("df")).head.getLong(0) <= 50)
    val p = hybrid.queryExecution.executedPlan.toString
    assert(p.contains("Union"), "hybrid must union the two branches")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "head branch must broadcast")
  }

  test("headBroadcast composite key (w1,w2) equals the plain join across the gate") {
    // bigram-shaped fixture: one Zipf-head bigram ("of the") in every
    // doc, the rest unique — the shape bigramCrossEntropy gates on.
    val rows = (0 until 100).flatMap { id =>
      Seq((id.toLong, "of", "the", 3L), (id.toLong, s"w$id", s"x$id", 1L))
    }.toDF("id", "w1", "w2", "c")
    val stats = rows.groupBy("w1", "w2").agg(sum("c").as("cbg"))
    val plain = rows.join(stats, Seq("w1", "w2"))
    val hybrid = SaltedJoin.headBroadcast(rows, stats, Seq("w1", "w2"), "cbg", headFanIn = 50)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("w1", "w2", "id", "c", "cbg").as[(String, String, Long, Long, Long)]
      .collect().sorted.toSeq
    assert(key(hybrid) == key(plain))
    // the hot composite key crossed the gate onto the broadcast branch
    assert(stats.filter(col("cbg") > 50).count() == 1)
  }

  test("headBroadcast below threshold: identical output, empty head branch") {
    val (rows, stats) = fixture(40) // max df = 40 < 100
    val plain = rows.join(stats, Seq("token")).count()
    val hybrid = SaltedJoin.headBroadcast(rows, stats, "token", "df", headFanIn = 100)
    assert(hybrid.count() == plain)
    assert(stats.filter(col("df") > 100).isEmpty)
  }

  test("unigramCrossEntropy and tfidfKeywords keep exact results through the gate") {
    // the wired operators at a tiny threshold vs the library default —
    // identical output proves the gate is semantics-free end to end
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ate the bone"),
      (3L, "the bird saw the cat and the dog")).toDF("doc_id", "text")
    def viaThreshold(t: Long) = {
      // temporarily exercise the head path by calling headBroadcast
      // directly with the operator's own frames at threshold t
      val toks = docs.select(col("doc_id").as("id"),
        explode(graft.text.TextStats.tokens(col("text"))).as("token"))
      val perDoc = toks.groupBy("id", "token").agg(count(lit(1)).as("c"))
      val tf = perDoc.groupBy("token").agg(sum(col("c")).as("ctf"))
      SaltedJoin.headBroadcast(perDoc, tf, "token", "ctf", t)
        .select("id", "token", "c", "ctf").as[(Long, String, Long, Long)]
        .collect().sorted.toSeq
    }
    assert(viaThreshold(2) == viaThreshold(1000000),
      "head path (t=2: 'the' broadcasts) must equal pure-tail path")
    // and the public operators still produce sane rows with the default
    assert(graft.text.Quality.unigramCrossEntropy(docs, "doc_id", "text").count() == 3)
    assert(graft.text.Quality.tfidfKeywords(docs, "doc_id", "text").count() > 0)
  }
}
