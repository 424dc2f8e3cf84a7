package graft

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (`plans/rN/<query>_<tag>.txt`).
  * Run: `sbt "runMain graft.PlanDump <outDir> <tag> <sfDir> <name...>"`
  * (names may be prefixes; empty = every declared query). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <sfDir> [namePrefix...]")
    val outDir = new java.io.File(args(0))
    val tag = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSet
    outDir.mkdirs()
    val spark = GraftSession.get("local[4]", 32)
    Queries.all
      .filter(q => names.isEmpty || names.exists(q.name.startsWith))
      .foreach { q =>
        try {
          val df = q.run(spark, sfDir)
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val f = new java.io.File(outDir, s"${q.name}_$tag.txt")
          val w = new java.io.PrintWriter(f, "UTF-8")
          try w.println(formatted) finally w.close()
          System.out.println(s"[plandump] wrote $f (${formatted.length} chars)")
        } catch {
          case e: Throwable => System.err.println(s"[plandump] ${q.name}: $e")
        }
      }
    spark.stop()
  }
}
