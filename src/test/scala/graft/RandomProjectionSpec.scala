package graft

import org.apache.spark.sql.functions._
import graft.similarity.RandomProjection

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix is the deterministic h60 parity; projection matches a JVM replay") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.5f, -0.25f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-1.5f, 0.75f, 0.125f, -0.5f))).toDF("vec_id", "embedding")
    val got = RandomProjection.project(vecs, "vec_id", "embedding", inDims = 4, outDims = 4)
      .orderBy("vec_id", "dim").collect()
    assert(got.length == 12)
    val signs = Array.tabulate(4, 4)((i, j) => RandomProjection.signOf("rp", i, j))
    // replay with the same floor-pinned integer arithmetic
    val x = Map(
      1L -> Array(1.0f, 0.5f, -0.25f, 2.0f),
      2L -> Array(0.0f, 0.0f, 0.0f, 0.0f),
      3L -> Array(-1.5f, 0.75f, 0.125f, -0.5f))
    got.foreach { r =>
      val (id, j, v) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      val sum = (0 until 4).map { i =>
        math.floor((x(id)(i).toDouble * signs(i)(j)) * 1e12 + 0.5).toLong
      }.sum
      val want = 0.5 * (sum.toDouble / 1e12) // 1/sqrt(4)
      assert(v == want, s"($id,$j): $v != $want")
    }
    // zero vector projects to exactly zero everywhere
    assert(got.filter(_.getLong(0) == 2L).forall(_.getDouble(2) == 0.0))
  }

  test("JL property: projected distances approximate original distances on the corpus") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(50)
    val proj = RandomProjection.project(emb, "vec_id", "embedding", inDims = 64, outDims = 32)
      .groupBy("vec_id").agg(sort_array(collect_list(struct(col("dim"), col("value")))).as("p"))
      .select(col("vec_id"), col("p.value").as("y"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum)
    val ids = orig.keys.toSeq.sorted.take(20)
    val ratios = for {
      Seq(a, b) <- ids.combinations(2).toSeq
      d0 = dist(orig(a).map(_.toDouble), orig(b).map(_.toDouble)) if d0 > 0
    } yield dist(proj(a), proj(b)) / d0
    // sign-JL at k=32: distances preserved within a broad band; the
    // MEDIAN ratio must sit near 1 (the estimator is unbiased)
    val sortedR = ratios.sorted
    val median = sortedR(sortedR.size / 2)
    assert(median > 0.75 && median < 1.25, s"median distance ratio $median out of band")
    assert(ratios.forall(r => r > 0.3 && r < 1.7), s"extreme distortion: ${ratios.min}..${ratios.max}")
  }

  test("plan shape: scan-fused — no exchange, no join, whole-stage codegen") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val df = RandomProjection.project(emb, "vec_id", "embedding", inDims = 64, outDims = 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("Join"), "projection must not join")
    // the "*(n)" prefix marks a WholeStageCodegen span: the codegen'd
    // SignProject expression keeps Generate+scan in one span (the HOF
    // zip_with/aggregate form was CodegenFallback and broke it)
    assert(plan.contains("*(1) Generate posexplode(sign_project("),
      s"projection must run inside one codegen span:\n$plan")
  }
}
