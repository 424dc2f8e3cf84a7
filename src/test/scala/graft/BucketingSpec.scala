package graft

import org.apache.spark.sql.functions._
import graft.storage.Bucketing

class BucketingSpec extends SparkSpec {

  test("co-located bucketed join runs with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "li_bucketed", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_bucketed", 8, Seq("l_orderkey"))
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
      assert(Bucketing.isShuffleFree(joined), "bucketed join must not shuffle:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
      // correctness vs the plain join
      val plain = li.join(o, "l_orderkey")
      assert(joined.count() == plain.count())
      // and a follow-up aggregation on the bucket key also avoids the shuffle
      val agg = spark.table("li_bucketed").groupBy("l_orderkey")
        .agg(sum("l_quantity"))
      assert(Bucketing.isShuffleFree(agg), "groupBy on bucket key must not shuffle")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
