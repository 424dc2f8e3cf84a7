package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),
    (1L, Seq(0.9, 0.1, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0, 0.0)),
    (3L, Seq(0.0, 0.0, 1.0, 0.0)),
    (4L, Seq(-1.0, 0.0, 0.0, 0.0))
  )

  test("dot / cosine column math") {
    val (dot, cos) = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")),
        Similarity.cosine(col("a"), col("a")))
      .as[(Double, Double)].head()
    assert(dot == 32.0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine, excludes self") {
    val q = vecs.take(1).toDF("query_id", "query_vec")
    val c = vecs.toDF("cand_id", "cand_vec")
    val top = Similarity.bruteForceTopK(q, c, 2)
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L)) // 1 is closest; 2 and 3 tie at 0, id breaks tie
  }

  test("lshTopK returns a subset of brute-force candidates with same scores") {
    val q = vecs.take(2).toDF("query_id", "query_vec")
    val c = vecs.toDF("cand_id", "cand_vec")
    val bf = Similarity.bruteForceTopK(q, c, 5)
      .select("query_id", "cand_id", "cos").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val lsh = Similarity.lshTopK(q, c, 5, numPlanes = 2, dim = 4)
      .select("query_id", "cand_id", "cos").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, b, s) => assert(math.abs(bf((a, b)) - s) < 1e-12) }
  }

  test("nearDupPairs: finds planted near-dups, only pairs >= threshold, subset of exact") {
    // 0/1 are planted near-dups (cos ~0.994); 2/3/4 are orthogonal/opposite
    val v = vecs.toDF("id", "vec")
    val got = Similarity.nearDupPairs(v, threshold = 0.9, bandPlanes = 2,
        numBands = 8, dim = 4)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect().toSeq
    // the planted pair agrees on every plane sign (both mostly +x), so with
    // 8 bands it is found with near-certainty under the fixed seed
    assert(got.map(p => (p._1, p._2)) == Seq((0L, 1L)))
    assert(got.head._3 > 0.9)

    // exact reference: every emitted pair must be in the brute-force set
    // and no candidate below threshold survives
    val lower = Similarity.nearDupPairs(v, threshold = 0.0, bandPlanes = 2,
        numBands = 8, dim = 4)
      .select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
    assert(lower.forall(p => p._3 >= 0.0 && p._1 < p._2))
    assert(lower.map(p => (p._1, p._2)).distinct.length == lower.length) // deduped
  }

  test("ivf assigns every candidate and probes return k results") {
    val c = vecs.toDF("cand_id", "cand_vec")
    val q = vecs.take(1).toDF("query_id", "query_vec")
    val (centroids, assigned) = Similarity.ivfIndex(c, nlist = 2)
    assert(assigned.count() == vecs.length)
    val top = Similarity.ivfTopK(q, centroids, assigned, k = 2, nprobe = 2)
    assert(top.count() <= 2 && top.count() > 0)
  }
}
