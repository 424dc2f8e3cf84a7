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
    // `stages` arg: attribute the STREAM phase — run the chain truncated
    // after each stage (reassemble / +parse / +process), parquet sink.
    if (args.headOption.contains("stages")) stageAttribution(spark, sfDir)
    spark.stop()
  }

  private def stageAttribution(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.streaming.StatefulOps
    import graft.sources.ActorReplies
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dict = ActorReplies.KeysDictionary("probe", Map(
      "val" -> ActorReplies.KeyDef(Seq(ActorReplies.FloatType("id"), ActorReplies.FloatType("x", "V"))),
      "status" -> ActorReplies.KeyDef(Seq(ActorReplies.StringType())),
      "motion" -> ActorReplies.KeyDef(Seq(ActorReplies.PvtType()))))
    // the q52 spool is already built (content-keyed reuse)
    val conns = sys.env.get("SPARK_GRAFT_Q52_CONNS").map(_.toInt)
      .getOrElse(math.max(32, Runtime.getRuntime.availableProcessors()))
    val spool = graft.streaming.ReplayScaffold.spoolFor(spark, sfDir, "q52",
      "events.parquet", s"conns=$conns;manifest",
      (_, _, _) => throw new IllegalStateException("spool must already exist"))
    val schema = StructType(Seq(StructField("conn", StringType),
      StructField("seq", LongType), StructField("data", StringType)))
    def chunks = graft.streaming.ReplayScaffold.manifestStream(spark, spool, schema)
      .as[StatefulOps.Chunk]
    def runStream(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val rd = java.nio.file.Files.createTempDirectory(s"q52prof-").toString
      time(s"stream: $label") {
        val q = df.writeStream.format("parquet")
          .option("path", s"$rd/out").outputMode("append")
          .option("checkpointLocation", s"$rd/ckpt").start()
        try q.processAllAvailable() finally q.stop()
      }
      graft.streaming.ReplayScaffold.rmTree(new java.io.File(rd))
    }
    runStream("scan only")(chunks.toDF())
    runStream("reassemble")(StatefulOps.reassembleLines(chunks).toDF())
    def replies = StatefulOps.reassembleLines(chunks).map(lo => ActorReplies.ReplyLine(lo.line, t0))
    runStream("reassemble+parse")(ActorReplies.parse(replies, dict).toDF())
    runStream("reassemble+parse+process")(
      graft.transforms.KeywordProcessor.process(
        ActorReplies.parse(replies, dict).toDF(),
        tags = Map("site" -> "lab"),
        keywordTags = Map("probe.val" -> graft.transforms.KeywordProcessor.KeywordTagConf(0, "eid"))))
  }
}
