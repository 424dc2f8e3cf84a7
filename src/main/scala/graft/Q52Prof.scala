package graft

/** Scratch profiler for q52 (not part of the library surface): times the
  * full streaming chain end-to-end, bench-shaped (noop sink), 3 reps. */
object Q52Prof {
  import HotProf.time

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    Tables.events(spark, sfDir).count()
    val q = Queries.all.find(_.name == "q52_actor_stream").get
    (1 to 3).foreach { i =>
      time(s"q52 rep $i") {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      println(s"[prof]   ${HotProf.jvmStats()}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
