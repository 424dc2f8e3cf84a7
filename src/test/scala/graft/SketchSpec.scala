package graft

import org.apache.spark.sql.functions._
import graft.sketch.Sketches

/** HyperLogLog sketch: accuracy, merge algebra, partitioning invariance. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int, tag: String) =
    (1 to n).map(i => (s"$tag$i", if (i % 2 == 0) "a" else "b")).toDF("v", "k")

  test("hllDistinct is within the p=10 error envelope on 10k distinct values") {
    val df = ids(10000, "x")
    val est = Sketches.hllDistinct(df, col("v"), Seq("k"), p = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // stderr at m=1024 is 1.04/sqrt(m) ~ 3.25%; 5k distinct per key,
    // allow 4 sigma.
    for ((k, e) <- est) assert(math.abs(e - 5000) / 5000 < 0.13, s"key $k est $e")
  }

  test("duplicates do not move the estimate") {
    val df = ids(2000, "x")
    val dup = df.union(df).union(df)
    val a = Sketches.hllDistinct(df, col("v"), Seq("k"), p = 10).collect().toSet
    val b = Sketches.hllDistinct(dup, col("v"), Seq("k"), p = 10).collect().toSet
    assert(a == b)
  }

  test("merging per-key register tables equals sketching the union directly") {
    val df = ids(5000, "x")
    val perKey = Sketches.hllRegisters(df, col("v"), Seq("k"), p = 8)
    val merged = Sketches.hllMerge(perKey, Nil)
      .select("reg_idx", "max_rho").collect().toSet
    val direct = Sketches.hllRegisters(df.withColumn("g", lit(1)), col("v"), Seq("g"), p = 8)
      .select("reg_idx", "max_rho").collect().toSet
    assert(merged == direct)
  }

  test("register table is bounded by m and partitioning-invariant") {
    val df = ids(8000, "x")
    val run = (d: org.apache.spark.sql.DataFrame) =>
      Sketches.hllRegisters(d, col("v"), Seq("k"), p = 6)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val base = run(df)
    assert(base.size <= 2 * 64)
    assert(base == run(df.repartition(13)))
  }

  test("linear-counting branch engages on sparse registers") {
    val df = ids(40, "y")
    val out = Sketches.hllDistinct(df, col("v"), Seq("k"), p = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    for ((k, (nZero, e)) <- out) {
      assert(nZero > 900, s"key $k n_zero $nZero")
      assert(math.abs(e - 20) < 2, s"key $k est $e") // LC is near-exact here
    }
  }

  test("inclusion-exclusion over merged registers estimates |A ∩ B| within the union's error envelope") {
    // A = 1..6000, B = 4001..10000 → |A∩B| = 2000, |A∪B| = 10000
    val a = (1 to 6000).map(i => ("A", s"u$i")).toDF("k", "v")
    val b = (4001 to 10000).map(i => ("B", s"u$i")).toDF("k", "v")
    val regs = Sketches.hllRegisters(a.union(b), col("v"), Seq("k"), p = 10)
    val est = Sketches.hllEstimate(regs, Seq("k"), p = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val estU = Sketches.hllEstimate(Sketches.hllMerge(regs, Nil).withColumn("k", lit("*")),
      Seq("k"), p = 10).collect().map(r => r.getDouble(3)).head
    val inter = est("A") + est("B") - estU
    // three ±3.25% sketches compound; |A∪B|=10k so 4σ of the union alone
    // is ~1300 — assert a conservative envelope around 2000
    assert(math.abs(inter - 2000) < 1300, s"est_inter $inter")
  }

  // --- count-min ---

  /** Zipf-ish corpus: token t_i appears ~n/i times. */
  private def zipf(n: Int) =
    (1 to n).flatMap(i => Seq.fill(n / i)(s"t$i")).toDF("token")

  test("cmEstimate never under-counts (one-sided error) and is exact off-collision") {
    val df = zipf(200)
    val exact = df.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val grid = Array.fill(3, 1024)(0L)
    Sketches.cmCounters(df, col("token"), 3, 1024).collect().foreach { r =>
      grid(r.getAs[Int]("j"))(r.getAs[Long]("bucket").toInt) = r.getAs[Long]("cnt")
    }
    val est = df.distinct()
      .withColumn("est", Sketches.cmEstimate(col("token"), grid, 1024))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) => assert(est(t) >= c, s"$t est ${est(t)} < exact $c") }
    // 200 distinct tokens in 1024 buckets: at least the unlucky few collide,
    // but the min over 3 rows recovers exactness for most
    val exactHits = exact.count { case (t, c) => est(t) == c }
    assert(exactHits > 150, s"only $exactHits/200 exact")
  }

  test("cmCounters merge by summing equals a single build (counters are linear)") {
    val df = zipf(100)
    val (a, b) = (df.filter(length(col("token")) <= 2), df.filter(length(col("token")) > 2))
    val merged = Sketches.cmCounters(a, col("token"), 2, 256)
      .unionByName(Sketches.cmCounters(b, col("token"), 2, 256))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Sketches.cmCounters(df, col("token"), 2, 256)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == direct)
  }

  test("cmHeavyHitters returns exactly the exact heavy hitters, with est >= cnt") {
    val df = zipf(500)
    val n = df.count()
    val expected = df.groupBy("token").count()
      .filter(col("count") * 50 >= n).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sketches.cmHeavyHitters(df, col("token"), phiDen = 50, depth = 3, width = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap == expected)
    got.foreach { case (t, c, e) => assert(e >= c, s"$t est $e < cnt $c") }
  }

  test("cmHeavyHitters is partitioning-invariant") {
    val df = zipf(300)
    val run = (d: org.apache.spark.sql.DataFrame) =>
      Sketches.cmHeavyHitters(d, col("token"), phiDen = 100)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(df) == run(df.repartition(17)))
  }

  // --- equi-width histogram quantiles ---

  test("histogramQuantiles bins bracket the exact quantile; merged rows equal a direct global build") {
    val rows = (1 to 1000).map(v => (if (v % 3 == 0) "a" else "b", v.toLong))
      .toDF("src", "v")
    val per = Sketches.histogram(rows, col("v"), Seq("src"), binWidth = 10L)
    val merged = per.groupBy("bin").agg(sum("cnt").as("cnt"))
      .select(lit("*").as("src"), col("bin"), col("cnt"))
    val q = Sketches.histogramQuantiles(per.unionByName(merged),
        Seq("src"), Seq((1, 2), (9, 10)), binWidth = 10L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(5), r.getLong(6))).toMap
    // exact quantile per group: rank ceil(p*n) over the sorted values
    val data = (1 to 1000).map(v => (if (v % 3 == 0) "a" else "b", v.toLong))
    for (src <- Seq("a", "b", "*"); (num, den) <- Seq((1, 2), (9, 10))) {
      val vs = (if (src == "*") data else data.filter(_._1 == src)).map(_._2).sorted
      val rank = (vs.size * num + den - 1) / den // ceil
      val exact = vs(rank - 1)
      val (n, lo, hi) = q((src, num, den))
      assert(n == vs.size)
      assert(exact >= lo && exact < hi, s"$src p=$num/$den exact $exact not in [$lo,$hi)")
    }
  }

  test("histogram quantile extraction is partitioning-invariant") {
    val rows = (1 to 2000).map(v => ("s", (v * 7 % 997).toLong)).toDF("src", "v")
    val run = (d: org.apache.spark.sql.DataFrame) => {
      val h = Sketches.histogram(d, col("v"), Seq("src"), 16L)
      Sketches.histogramQuantiles(h, Seq("src"), Seq((1, 4), (3, 4), (99, 100)), 16L)
        .collect().map(_.toSeq).toSet
    }
    assert(run(rows) == run(rows.repartition(11)))
  }
}
