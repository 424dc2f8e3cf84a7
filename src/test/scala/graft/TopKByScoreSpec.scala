package graft

import org.apache.spark.sql.functions._
import graft.operators.{ScoredId, TopKByScore}

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bounded heap: ordering, ties, truncation") {
    val agg = new TopKByScore(3)
    val all = Seq(ScoredId(0.5, 10), ScoredId(0.9, 2), ScoredId(0.9, 1),
      ScoredId(0.1, 5), ScoredId(0.7, 7))
    val out = all.foldLeft(agg.zero)(agg.reduce)
    assert(out == Seq(ScoredId(0.9, 1), ScoredId(0.9, 2), ScoredId(0.7, 7)))
    // merge from two partitions == reduce over the union
    val (l, r) = all.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == out)
  }

  test("topKPerGroup matches window-based top-k on a DataFrame") {
    val df = Seq(
      (1L, 100L, 0.9), (1L, 101L, 0.8), (1L, 102L, 0.95), (1L, 103L, 0.1),
      (2L, 100L, 0.2), (2L, 101L, 0.3)
    ).toDF("query_id", "cand_id", "cos")
    val out = TopKByScore.topKPerGroup(df, Seq("query_id"), "cos", "cand_id", 2)
      .orderBy("query_id", "rank")
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 102L, 1), (1L, 100L, 2), (2L, 101L, 1), (2L, 100L, 2)))
  }
}
