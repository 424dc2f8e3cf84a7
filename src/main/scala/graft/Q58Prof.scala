package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for q58_tfidf_keywords (VERDICT r10 #3: name the 16×
  * grower): times each stage of the plan — tf aggregate, document
  * frequency, the head-broadcast join, and the per-doc top-k window —
  * separately at the given sf dir, bench-shaped (noop sink, min of 2
  * timed reps after a warmup). */
object Q58Prof {
  private def time2(label: String)(f: => Unit): Unit = {
    def once: Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    once // warmup
    println(f"[q58prof] $label: ${math.min(once, once)}%.2f s (min of 2)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    val docs = Tables.documents(spark, sfDir)
    println(s"[q58prof] dir=$sfDir docs=${docs.count()}")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val tf = docs
      .select(col("doc_id").as("id"), explode(graft.text.TextStats.tokens(col("text"))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = graft.operators.SaltedJoin
      .headBroadcast(tf, dfreq, "token", "df", graft.text.Quality.HeadTokenFanIn)
      .crossJoin(broadcast(n))
      .select(col("id").as("doc_id"), col("token"),
        (col("tf").cast("double") * (col("n_docs").cast("double") / col("df"))).as("score"))
    val full = graft.text.Quality.tfidfKeywords(docs, "doc_id", "text", k = 3)

    println(f"[q58prof] vocab=${dfreq.count()} termRows=${tf.count()}")
    time2("tf aggregate only")(noop(tf))
    time2("tf + dfreq")(noop(dfreq))
    time2("scored (tf + dfreq + join)")(noop(scored))
    time2("full (scored + window topk)")(noop(full))
    spark.stop()
  }
}
