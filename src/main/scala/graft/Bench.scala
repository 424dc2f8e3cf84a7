package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. Prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Methodology (stability > speed of the harness itself):
  *  1. a table-scan warmup (parquet footers + JVM classloading),
  *  2. `SPARK_GRAFT_WARMUP` (default 2) UNTIMED full passes over every
  *     query — pays codegen, JIT and broadcast-build costs outside the
  *     measurement window. TWO passes, not one: the first leaves a C2
  *     compile BACKLOG (60 queries × several generated classes queue
  *     faster than the compiler threads drain), and with one warmup the
  *     first ~25 s of timed reps ran interpreted/stealing cores —
  *     measured as a contiguous band of 2-15x rep-1 outliers across
  *     whichever queries fell in that window. The second untimed pass
  *     absorbs the drain,
  *  3. `SPARK_GRAFT_REPS` (default 5) timed FULL PASSES over all
  *     queries; the reported number is the per-query MEDIAN ACROSS
  *     PASSES. Passes are interleaved (A,B,...,A,B,... rather than
  *     A,A,A,B,B,B) deliberately: transient JVM states — a G1
  *     concurrent-mark phase, a deopt/recompile window — persist for
  *     seconds, so back-to-back reps of one query all land in the same
  *     bad window and the median keeps the outlier; interleaving
  *     decorrelates reps minutes apart and the median sheds it.
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
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    // comma-separated query-name filter for profiling single queries;
    // unset = the full suite (the driver's contract). SKIP removes named
    // queries (used by the 16x run to exclude configs that are 1x-tuned
    // by their oracle and documented as needing retuning at scale —
    // SCALE.md "Pair-operator scaling").
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP").map(_.split(",").toSet).getOrElse(Set.empty)
    val suite = only.fold(Queries.all)(names => Queries.all.filter(q => names(q.name)))
      .filterNot(q => skip(q.name))
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
    // Untimed full passes: codegen + JIT for every query's plan, plus
    // one more pass so the C2 compile backlog drains before timing.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "2").toInt
    (1 to warmup).foreach(_ => suite.foreach(runOnce))
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    // NO System.gc() between passes: a full GC unloads JIT'd codegen
    // classes, so the next pass re-compiles everything and its first
    // heavy query pays 4-5x (measured: q26 31.9s after a forced GC vs
    // ~7s steady-state). G1 self-regulates fine with the pinned heap;
    // the median across interleaved passes sheds any residual outlier.
    (1 to reps).foreach { _ =>
      suite.foreach(q => times(q.name) :+= runOnce(q))
    }
    // per-pass rep times on stderr for harness diagnosis (not part of
    // the one-line JSON contract on stdout)
    suite.foreach { q =>
      System.err.println(s"[bench-reps] ${q.name}: " +
        times(q.name).map(t => f"$t%.2f").mkString(" "))
    }
    val results = suite.map { q =>
      val sorted = times(q.name).sorted
      q.name -> sorted(sorted.length / 2)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
