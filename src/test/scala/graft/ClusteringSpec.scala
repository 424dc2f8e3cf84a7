package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.SaltedJoin

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chains, triangles, singletons (both paths)") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L)
    // fast path: driver union-find + broadcast
    val fast = Dedup.connectedComponents(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
    // scale path: distributed label propagation (forced)
    val iterative = Dedup.connectedComponents(pairs, nodes, driverMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iterative == want)
    // fault-tolerant mode: reliable per-iteration checkpoints on a dir,
    // identical labels; superseded iterates' files are freed eagerly
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt-")
    val reliable = Dedup.connectedComponents(pairs, nodes, driverMaxEdges = 0,
        checkpointDir = Some(ckptDir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == want)
    def rddDirs(p: java.io.File): Seq[java.io.File] =
      Option(p.listFiles()).getOrElse(Array.empty)
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)).toSeq
        .filter(_.getName.startsWith("rdd-"))
    assert(rddDirs(ckptDir.toFile).size <= 1,
      s"superseded checkpoints must be deleted, found ${rddDirs(ckptDir.toFile)}")
  }

  test("dedupByMinhash: survivors = one per cluster, all docs labeled") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "completely unrelated text about spark streaming engines"),
      (5L, "another standalone document mentioning query optimizers")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupByMinhash(docs, "doc_id", "text",
      n = 3, numPerm = 16, bands = 8, threshold = 0.3)
    assert(out.count() == 5)
    val survivors = out.filter(col("is_survivor")).select("id").as[Long].collect().toSet
    // 1,2 identical (and 3 near) -> one cluster with survivor 1; 4,5 singletons
    assert(survivors.contains(1L) && survivors.contains(4L) && survivors.contains(5L))
    assert(!survivors.contains(2L))
    val c1 = out.filter(col("id").isin(1L, 2L)).select("cluster").distinct().as[Long].collect()
    assert(c1.toSeq == Seq(1L))
  }

  test("saltedJoin matches plain join results") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (500L, "b")).toDF("k", "label")
    val plain = large.join(small, Seq("k")).select("k", "v", "label")
      .collect().map(_.toSeq).toSet
    val salted = SaltedJoin.join(large, small, "k", salts = 8)
      .select("k", "v", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
