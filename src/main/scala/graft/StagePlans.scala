package graft

import org.apache.spark.sql.functions._

/** Scratch evidence dumper (not part of the library surface): q132's
  * outer plan is a LocalTableScan — the merge table is materialized by
  * the driver loop — so `PlanDump` can't show the per-ROUND stages the
  * round-18 kernels changed. This dumps the internal stage plans the
  * optimization claims are about: the adjacent-pair count frame
  * (bpe_pairs vs the arrays_zip/slice form) and the merge-application
  * projection (bpe_merge vs the aggregate HOF fold).
  * Run: `sbt "runMain graft.StagePlans <outDir> <tag> <sfDir>"`. */
object StagePlans {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0))
    val tag = args(1)
    val sfDir = args(2)
    outDir.mkdirs()
    val spark = GraftSession.get("local[4]", 32)
    val docs = Tables.documents(spark, sfDir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$tag.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(s) finally w.close()
      System.out.println(s"[stageplans] wrote $f")
    }
    dump("q132_round_paircount", graft.text.Bpe.round1Pairs(docs, "text"))
    dump("q132_merge_apply",
      graft.text.Bpe.mergeApplyProbe(docs, "text", "a", "b"))
    spark.stop()
  }
}
