package graft

import org.apache.spark.sql.SparkSession

/** Scale audit: prints the physical plan health of every query — whether
  * filters reached the scan, whether small joins broadcast, whether
  * aggregates partial-aggregate, and how wide whole-stage codegen spans
  * are. Run: `sbt "runMain graft.PlanAudit [sfDir] [namePrefix...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = GraftSession.get("local[4]", 4)
    Queries.all
      .filter(q => names.isEmpty || names.exists(q.name.startsWith))
      .foreach { q =>
        try {
          val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
          def count(pat: String): Int = pat.r.findAllIn(plan).length
          val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
          println(f"${q.name}%-24s scans=${count("FileScan")}%d pushedFilterScans=$pushed%d " +
            f"broadcastJoins=${count("BroadcastHashJoin")}%d smj=${count("SortMergeJoin")}%d " +
            f"partialAggs=${count("partial_")}%d exchanges=${count("Exchange")}%d " +
            f"codegenSpans=${count("WholeStageCodegen")}%d")
        } catch { case e: Throwable => println(s"${q.name}: ERROR ${e.getMessage}") }
      }
    spark.stop()
  }
}
