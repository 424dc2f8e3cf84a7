package graft

import org.apache.spark.sql.functions._
import graft.text.Collocations

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("planted phrase dominates PMI; score matches an independent replay") {
    // "aa bb" always adjacent (6×); filler words re-used everywhere so
    // their pairwise PMI is near zero; common words appear often enough
    // to clear minCount without being collocated with anything specific
    val docs = Seq(
      "aa bb x y z x y z",
      "x aa bb y z x y z",
      "y aa bb z x y z x",
      "z aa bb x y z x y",
      "x y aa bb z x y z",
      "y z aa bb x y z x").toDF("text")
    val got = Collocations.pmiCollocations(docs, "text", minCount = 5L, k = 10)
      .collect()
    assert(got.nonEmpty)
    val top = got.head
    assert((top.getString(0), top.getString(1)) == ("aa", "bb"))
    // independent replay: c12=6, c1=c2=6, T = total tokens, B = total bigrams
    val texts = docs.as[String].collect()
    val toks = texts.flatMap(_.split(" ", -1))
    val bgs = texts.flatMap(t => { val a = t.split(" ", -1); a.zip(a.drop(1)) })
    val tT = toks.length.toDouble
    val bT = bgs.length.toDouble
    val c12 = bgs.count(_ == ("aa", "bb")).toDouble
    val c1 = toks.count(_ == "aa").toDouble
    val c2 = toks.count(_ == "bb").toDouble
    val want = BigDecimal(math.log(((c12 * tT) * tT) / ((bT * c1) * c2)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getDouble(3) == want,
      s"pmi ${top.getDouble(3)} != replay $want")
    // every returned pair clears minCount and scores are non-increasing
    assert(got.forall(_.getLong(2) >= 5L))
    assert(got.map(_.getDouble(3)).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true })
  }

  test("empty and single-token docs contribute no bigrams; minCount prunes") {
    val docs = Seq("", "solo", "p q", "p q", "p q", "p q", "p q", "r s").toDF("text")
    val got = Collocations.pmiCollocations(docs, "text", minCount = 5L, k = 10).collect()
    // only (p,q) reaches 5; (r,s) and anything touching ""/"solo" must not appear
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("p", "q")))
    assert(got.head.getLong(2) == 5L)
  }

  test("plan shape: top-k is TakeOrderedAndProject, no cartesian on data") {
    val docs = Seq("a b c d e").toDF("text")
    val plan = Collocations.pmiCollocations(docs, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // the only cross joins are the two 1-row totals frames
    val cartesians = plan.linesIterator.count(_.contains("CartesianProduct"))
    assert(cartesians == 0, s"unexpected cartesian on data: $plan")
  }
}
