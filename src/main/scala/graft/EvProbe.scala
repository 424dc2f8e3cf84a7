package graft

import org.apache.spark.sql.functions._

/** Scratch bisection probe for editVerifiedPairs' stage costs (r17).
  * Times cumulative plan prefixes at 16×. Not part of the library. */
object EvProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft-sf16x")
    val t = 0.8
    val spark = GraftSession.get("local[32]", 32)
    val d = spark.read.parquet(s"$path/documents.parquet").select("doc_id", "text")
    import graft.dedup.Dedup
    val (pb, _) = Dedup.lshPlanChoose(16, t)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[evprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }
    val cands = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 16, pb, 0.0)
      .select("id_a", "id_b")
    val lens = d.select(col("doc_id").as("id"), length(col("text")).as("len"))
    val sized = cands
      .join(lens.select(col("id").as("id_a"), col("len").as("len_a")), Seq("id_a"))
      .join(lens.select(col("id").as("id_b"), col("len").as("len_b")), Seq("id_b"))
      .filter((greatest(col("len_a"), col("len_b")) - least(col("len_a"), col("len_b")))
        .cast("double") <= lit(1.0 - t) * greatest(col("len_a"), col("len_b")))
    val texts = d.select(col("doc_id").as("id"), col("text").as("t"))
    val joined = sized
      .join(texts.select(col("id").as("id_a"), col("t").as("t_a")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("t").as("t_b")), Seq("id_b"))
    // warm
    cands.count(); sized.count(); joined.count()
    time("cands.count")(cands.count())
    time("cands.count again")(cands.count())
    time("sized.count")(sized.count())
    time("joined.count")(joined.count())
    var maxLen = 0
    time("maxLen agg") {
      val row = lens.agg(max(col("len"))).collect()(0)
      maxLen = if (row.isNullAt(0)) 0 else row.getInt(0); 0L
    }
    val cap = math.max(0, math.floor((1.0 - t) * maxLen).toInt)
    val verify = joined
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("lev",
        when(col("t_a") === col("t_b"), lit(0L))
          .otherwise(levenshtein(col("t_a"), col("t_b"), cap).cast("long")))
      .filter(col("lev") >= 0)
      .withColumn("edit_sim",
        when(greatest(col("len_a"), col("len_b")) === 0, lit(1.0))
          .otherwise(lit(1.0) - col("lev").cast("double") /
            greatest(col("len_a"), col("len_b"))))
      .filter(col("edit_sim") >= t)
    verify.count() // warm
    time("verify.count")(verify.count())
    println("[evprobe] FINAL PLAN:\n" +
      verify.queryExecution.executedPlan.toString.take(9000))
    time("verify.count again")(verify.count())
    time("full editVerifiedPairs") {
      Dedup.editVerifiedPairs(d, "doc_id", "text", 3, 16, threshold = t).count()
    }
    time("full again") {
      Dedup.editVerifiedPairs(d, "doc_id", "text", 3, 16, threshold = t).count()
    }
    spark.stop()
  }
}
