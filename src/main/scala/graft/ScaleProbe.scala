package graft
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Scaling probe: replicate sf0.1 inputs N× and measure the heavy
  * operator classes, to verify near-linear scaling (the 100-TB argument
  * made measurable). Run: `sbt "runMain graft.ScaleProbe"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[32]", 32)
    val dir = "/root/testdata/sf0.1"
    def rep(df: DataFrame, n: Int, idCol: String): DataFrame =
      (0 until n).map(i => df.withColumn(idCol, col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ unionByName _)
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val li = Tables.lineitem(spark, dir)
    val docs = Tables.documents(spark, dir)
    val ev = Tables.events(spark, dir)
    li.count(); docs.count(); ev.count() // warm
    println("factor,rows_lineitem,agg_join_s,rolling_s,minhash_s,topk_s")
    for (n <- Seq(1, 4, 16)) {
      val liN = rep(li, n, "l_orderkey")
      val docsN = rep(docs, n, "doc_id")
      val evN = rep(ev, n, "event_id")
      val aggS = time {
        liN.filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '2000-12-01 00:00:00'"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      val rollS = time {
        val w = graft.batch.Rolling.timeWindow(col("ts").cast("timestamp"), 300, col("user_id"))
        evN.withColumn("m", avg(col("value")).over(w))
          .write.format("noop").mode("overwrite").save()
      }
      val mhS = time {
        graft.dedup.Dedup.withMinhashSignature(docsN, "doc_id", "text", 3, 16)
          .write.format("noop").mode("overwrite").save()
      }
      val topkS = time {
        graft.operators.TopKByScore.topKPerGroup(
          evN.select(col("user_id").as("g"), col("event_id").as("id"), col("value").as("s")),
          Seq("g"), "s", "id", 5)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"$n,${n * 600000},$aggS%.2f,$rollS%.2f,$mhS%.2f,$topkS%.2f")
    }
    spark.stop()
  }
}
