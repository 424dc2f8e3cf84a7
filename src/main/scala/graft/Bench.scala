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
  // All JSON-bound numbers go through a locale-pinned formatter: the f""
  // interpolator uses the JVM default locale, and a comma-decimal locale
  // (de_DE) would emit "q01":1,061 — invalid JSON, driver parse failure.
  private def j3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

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
    // A rep that throws returns None — it must NEVER be published as a
    // timing. r8 timed 18 analysis exceptions at ~0.06 s each and the
    // bench JSON read as a round of big speedups (VERDICT r8 #2).
    def runOnce(q: Queries.Q): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { q.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} FAILED: $e"); false }
      spark.catalog.clearCache()
      if (ok) Some((System.nanoTime() - t0) / 1e9) else None
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
      suite.foreach(q => runOnce(q).foreach(t => times(q.name) :+= t))
    }
    // Queries with zero successful reps are published under "failed",
    // never under "queries" — absent/None, not a small number.
    val failed = suite.map(_.name).filter(n => times(n).isEmpty)
    // Machine-noise marker: a >3x floor-to-ceiling spread across
    // interleaved reps is contention, not plan variance — flag it so a
    // consumer of the medians knows which round-over-round moves to
    // discount (the r8 lesson: five phantom "regressions" were all in
    // this band). min-of-reps is the contention-robust statistic; both
    // are derivable from the reps arrays, the flag just makes it legible.
    val noisy = suite.map(_.name).filter { n =>
      val ts = times(n)
      ts.length >= 2 && ts.min > 0 && ts.max / ts.min > 3.0
    }
    // per-pass rep times on stderr for harness diagnosis (not part of
    // the one-line JSON contract on stdout)
    suite.foreach { q =>
      System.err.println(s"[bench-reps] ${q.name}: " +
        times(q.name).map(t => String.format(java.util.Locale.ROOT, "%.2f", Double.box(t))).mkString(" "))
    }
    val results = suite.flatMap { q =>
      val sorted = times(q.name).sorted
      if (sorted.isEmpty) None else Some(q.name -> sorted(sorted.length / 2))
    }.toMap
    // Round-over-round movement flags: compare medians against the most
    // recent BENCH_r*.json in the working directory (or an explicit
    // SPARK_GRAFT_BASELINE path). A >1.5x move either way on unchanged
    // code is how a transient-window phantom (the q15 case, VERDICT r6)
    // is told apart from a real regression — the per-rep spreads in the
    // reps file show whether the move is one polluted pass or all of
    // them. Best-effort: no baseline, no flags.
    val moved: Map[String, (Double, Double)] = (try {
      import scala.jdk.CollectionConverters._
      def sfOf(s: String): Option[Double] =
        "sf([0-9][0-9.]*)$".r.findFirstMatchIn(s.stripSuffix("/"))
          .flatMap(m => m.group(1).toDoubleOption)
      val baselinePath = sys.env.get("SPARK_GRAFT_BASELINE").orElse {
        val rx = "BENCH_r(\\d+)\\.json".r
        Option(new java.io.File(".").listFiles()).toSeq.flatten
          .flatMap(f => f.getName match {
            case rx(n) => Some((n.toInt, f.getPath)); case _ => None })
          .sortBy(-_._1).headOption.map(_._2)
      }
      baselinePath.toSeq.flatMap { path =>
        val root = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(path))
        // the driver's BENCH_rN.json wraps the bench line as
        // {sf: 0.1, tail: "<last 2000 chars>", parsed: <json|null>} —
        // accept a raw bench line, the driver wrapper's parsed form,
        // or (parse failed, the pre-r7 truncation) name:value pairs
        // regex-recovered from the tail text
        val baseSf = Option(root.get("sf")).flatMap(n =>
          if (n.isNumber) Some(n.asDouble()) else sfOf(n.asText()))
        if (baseSf != sfOf(sfDir)) Seq.empty
        else {
          val qNode = Option(root.get("queries"))
            .orElse(Option(root.get("parsed")).filter(_.isObject)
              .flatMap(p => Option(p.get("queries"))))
          val prev: Map[String, Double] = qNode match {
            case Some(qs) if qs.isObject =>
              qs.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
            case _ =>
              val tail = Option(root.get("tail")).map(_.asText()).getOrElse("")
              "\"(q[0-9]+_[A-Za-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(tail)
                .flatMap(m => m.group(2).toDoubleOption.map(m.group(1) -> _)).toMap
          }
          results.toSeq.flatMap { case (name, now) =>
            prev.get(name).filter(p =>
              p > 0 && now > 0 && (now / p > 1.5 || p / now > 1.5))
              .map(p => name -> (p, now))
          }
        }
      }.toMap
    } catch { case _: Throwable => Map.empty[String, (Double, Double)] })
    // Per-rep arrays are a standing FILE artifact, not part of the
    // stdout line: the driver's log capture truncates long lines
    // (VERDICT r6 saw the tail cut), so the one-line contract stays
    // compact and the full evidence lands next to it in the repo.
    val repsOut = sys.env.getOrElse("SPARK_GRAFT_REPS_OUT", "BENCH_reps.json")
    // min-of-reps is the contention-robust statistic (a rep can only be
    // SLOWED by machine noise, never sped up) — published as a first-class
    // map next to the medians so a consumer can discount the `noisy`
    // entries without re-deriving from the reps arrays.
    val mins = suite.flatMap { q =>
      val ts = times(q.name)
      if (ts.isEmpty) None else Some(q.name -> ts.min)
    }.toMap
    try {
      val repsJson = suite.map { q =>
        "\"" + q.name + "\":[" + times(q.name).map(t => j3(t)).mkString(",") + "]"
      }.mkString("{", ",", "}")
      val movedJson = moved.map { case (n, (p, c)) =>
        "\"" + n + "\":{\"prev\":" + j3(p) + ",\"now\":" + j3(c) + "}"
      }.mkString("{", ",", "}")
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val noisyJson = noisy.map("\"" + _ + "\"").mkString("[", ",", "]")
      val medianJson = results.map { case (k, v) => "\"" + k + "\":" + j3(v) }
        .mkString("{", ",", "}")
      val minJson = mins.map { case (k, v) => "\"" + k + "\":" + j3(v) }
        .mkString("{", ",", "}")
      val w = new java.io.PrintWriter(repsOut, "UTF-8")
      try w.println(s"""{"sf":"$sfDir","failed":$failedJson,"noisy":$noisyJson,"median":$medianJson,"min":$minJson,"reps":$repsJson,"moved_vs_prev":$movedJson}""")
      finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] reps file: $e") }
    // Medians at 3 decimals. The driver's log capture keeps only the LAST
    // 2000 chars of this line (BENCH_r04-r06 lost their head and failed
    // the driver's parse), so: (a) "queries" is the FINAL key — the tail
    // window then preserves the most per-query medians possible and the
    // driver's regex recovery never mixes in another map's numbers;
    // (b) the per-query MIN map lives in the reps FILE, not inline — a
    // second 78-entry map would push the medians out of the tail window
    // entirely.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + j3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val minTotal = if (mins.nonEmpty) mins.values.sum else 0.0
    val movedInline = moved.map { case (n, (p, c)) =>
      "\"" + n + "\":{\"prev\":" + j3(p) + ",\"now\":" + j3(c) + "}"
    }.mkString("{", ",", "}")
    val totalStr = j3(total)
    val failedStr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$totalStr,"unit":"sec","min_total":${j3(minTotal)},"failed":$failedStr,"moved_vs_prev":$movedInline,"reps_file":"$repsOut","sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
