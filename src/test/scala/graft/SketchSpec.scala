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
}
