package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. Prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Methodology (stability > speed of the harness itself):
  *  1. a table-scan warmup (parquet footers + JVM classloading),
  *  2. one UNTIMED full pass over every query — pays codegen, JIT and
  *     broadcast-build costs outside the measurement window,
  *  3. `SPARK_GRAFT_REPS` (default 3) timed reps per query; the reported
  *     number is the per-query MEDIAN, so one GC pause or JIT
  *     recompilation can't swing a round-over-round comparison.
  *
  * Each rep executes the FULL physical plan via the noop sink (count()
  * would let the optimizer prune projections/sorts and understate the
  * work) and clears the SQL cache afterwards so persisted intermediates
  * (e.g. the dedup self-join guards) are rebuilt per rep, not amortized.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.get(s"local[$cpus]", 32)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    def runOnce(q: Queries.Q): Double = {
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e") }
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // Untimed full pass: codegen + JIT for every query's plan.
    Queries.all.foreach(runOnce)
    val results = Queries.all.map { q =>
      val times = (1 to reps).map(_ => runOnce(q)).sorted
      q.name -> times(times.length / 2)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
