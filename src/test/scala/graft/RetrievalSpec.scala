package graft

import org.apache.spark.sql.functions._
import graft.text.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("planted relevance ordering; score matches an independent BM25 replay") {
    // doc 1: all three query terms, short -> top; doc 2: one term;
    // doc 3: none of the terms; docs 4..9: filler defining df/avgdl
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha x y z x y z x y z"),
      (3L, "u v w u v w"),
      (4L, "x y z alpha x"),
      (5L, "x y z u v"),
      (6L, "y z u v w"),
      (7L, "beta x y z u"),
      (8L, "z u v x y"),
      (9L, "x z v y u")).toDF("doc_id", "text")
    val queries = Seq(1 -> "alpha beta gamma")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", queries, k = 5)
      .orderBy("rank").collect()
    // only docs containing >= 1 query term are candidates: 1, 2, 4, 7
    assert(got.map(_.getLong(2)).toSet == Set(1L, 2L, 4L, 7L))
    assert(got.head.getLong(2) == 1L, s"full-match doc must rank 1st, got ${got.toSeq}")
    assert(got.map(_.getInt(1)).toSeq == (1 to 4))
    // independent JVM replay of doc 1's score
    val texts = docs.as[(Long, String)].collect().toMap
    val tokenized = texts.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val nDocs = texts.size.toDouble
    val sumDl = tokenized.values.map(_.size).sum.toDouble
    val avgdl = sumDl / nDocs
    def dec12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(id: Long, qterms: Seq[String]): Double = {
      val toks = tokenized(id)
      val dl = toks.size.toDouble
      BigDecimal(qterms.distinct.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None else {
          val df = tokenized.values.count(_.contains(t)).toDouble
          val idf = dec12(math.log(((nDocs - df) + 0.5) / (df + 0.5) + 1.0))
          Some(BigDecimal(dec12(idf * ((tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))))
        }
      }.sum.toDouble).toDouble
    }
    val want = score(1L, Seq("alpha", "beta", "gamma"))
    assert(got.head.getDouble(3) == want,
      s"doc 1 score ${got.head.getDouble(3)} != replay $want")
    // scores non-increasing down the ranking
    assert(got.map(_.getDouble(3)).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true })
  }

  test("duplicate query terms are deduplicated; k bounds the output") {
    val docs = Seq((1L, "a a a b"), (2L, "a b c d"), (3L, "c d e f")).toDF("doc_id", "text")
    val dup = Retrieval.bm25TopK(docs, "doc_id", "text", Seq(1 -> "a a b"), k = 2).collect()
    val single = Retrieval.bm25TopK(docs, "doc_id", "text", Seq(1 -> "a b"), k = 2).collect()
    assert(dup.map(r => (r.getLong(2), r.getDouble(3))).toSeq ==
      single.map(r => (r.getLong(2), r.getDouble(3))).toSeq)
    assert(dup.length == 2)
  }

  test("plan shape: no window sort; query/df broadcast; ONE corpus exchange, reused") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = Retrieval.bm25TopK(docs, "doc_id", "text", Queries.Bm25Queries)
    df.collect() // AQE: reuse + join strategy only settle in the final plan
    // the AQE toString prints Final Plan then Initial Plan — keep the final
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"), "per-query top-k must be the bounded-heap UDAF, not a window sort")
    assert(plan.contains("BroadcastHashJoin"), "query table and df must broadcast")
    // corpus-volume rows cross the wire ONCE: the id repartition; every
    // other lineage branch (dl, df, candidates) reads its shuffle files
    // back via ReusedExchange. The only other hash exchanges are the
    // posting-bounded token df and the k-bounded query_id top-k partials.
    val fresh = plan.linesIterator.filter(_.contains("- Exchange hashpartitioning")).toSeq
    val corpus = fresh.filter(_.contains("REPARTITION_BY_COL"))
    assert(corpus.size == 1, s"expected exactly 1 corpus repartition, got:\n${fresh.mkString("\n")}")
    assert(fresh.size <= 3, s"expected <=3 fresh hash exchanges (corpus + token + query_id), got:\n${fresh.mkString("\n")}")
    assert(plan.contains("ReusedExchange"), "tf/dl/df branches must reuse the one corpus exchange")
  }
}
