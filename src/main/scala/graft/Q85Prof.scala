package graft

/** Scratch profiler for q85_stream_join's 16× cell: the replay's
  * 60-day watermark deliberately buffers EVERY row on both join sides
  * (lossless oracle), so its wall is the cost of writing the whole
  * stream into RocksDB join state. This measures the same replay at
  * production-sized delays, where the time-range condition evicts state
  * as the watermark advances — the wall should collapse toward the
  * scan+sink floor, which is the 100 TB deployment story (state ∝
  * delay + range per key, not stream length). */
object Q85Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    println(s"[q85prof] dir=$sfDir")
    def once(delay: String): Double = {
      val t0 = System.nanoTime()
      graft.streaming.JoinReplay.run(spark, sfDir, delay)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("60 days", "2 hours").foreach { d =>
      once(d) // warmup (also builds the spool once)
      val t = math.min(once(d), once(d))
      println(f"[q85prof] delay=$d: $t%.2f s (min of 2)")
    }
    spark.stop()
  }
}
