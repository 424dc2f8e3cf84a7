package graft

import org.apache.spark.sql.functions._
import graft.sketch.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct within rsd of exact") {
    val o = Tables.orders(spark, sf())
    val exact = o.select(count_distinct(col("o_custkey"))).as[Long].head()
    val approx = o.select(Sketches.approxDistinct(col("o_custkey"), 0.05)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.15)
  }

  test("approx quantiles bracket exact percentiles") {
    val li = Tables.lineitem(spark, sf())
    val Seq(q50, q99) = Sketches.approxQuantiles(li, "l_quantity", Seq(0.5, 0.99), 0.01)
    val exact = li.select(expr("percentile(l_quantity, 0.5)"),
      expr("percentile(l_quantity, 0.99)")).as[(Double, Double)].head()
    assert(math.abs(q50 - exact._1) <= 2.0)
    assert(math.abs(q99 - exact._2) <= 2.0)
  }

  test("count-min over-counts only; bloom has no false negatives") {
    val e = Tables.events(spark, sf())
    val cms = Sketches.countMin(e, "user_id", eps = 0.001)
    val truth = e.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.take(10).foreach { case (k, n) =>
      assert(cms.estimateCount(k) >= n) // CMS never undercounts
    }
    val bf = Sketches.bloom(e.select("user_id").distinct(), "user_id", 1000)
    truth.keys.take(20).foreach(k => assert(bf.mightContainLong(k)))
  }

  test("bloomSemiJoin == plain semi join") {
    val li = Tables.lineitem(spark, sf())
    val hot = Tables.orders(spark, sf()).filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey").as("l_orderkey"))
    val expected = li.join(hot, Seq("l_orderkey"), "left_semi").count()
    val got = Sketches.bloomSemiJoin(li, hot, "l_orderkey").count()
    assert(got == expected)
    // expectedItems hint path: same result, no sizing count() job
    val hinted = Sketches.bloomSemiJoin(li, hot, "l_orderkey", expectedItems = 4096)
    assert(hinted.count() == expected)
    // the probe must be Spark's codegen'd expression, not a boxed UDF
    val plan = hinted.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") && !plan.contains("UDF"),
      s"bloom probe should be the native expression:\n$plan")
  }
}
