package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.control.{Engine, EngineConfig}
import graft.model.TelemetryPoint
import graft.sinks.TelemetrySink

class WideSinkSpoolSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("writeWideTables pivots each measurement to a typed wide table") {
    val out = Files.createTempDirectory("graft-wide-").toString
    val batch = Seq(
      TelemetryPoint("weather", Map("site" -> "APO"),
        Map("temp" -> 20.0, "rh" -> 40.0), null, ts("2024-01-01 00:00:00"), None, None),
      TelemetryPoint("weather", Map("site" -> "APO"),
        Map("temp" -> 21.0), null, ts("2024-01-01 00:01:00"), None, None),
      TelemetryPoint("seeing", Map("site" -> "APO"),
        Map("fwhm" -> 1.1), null, ts("2024-01-01 00:00:00"), None, None)).toDF()
    TelemetrySink.writeWideTables(batch, out)
    val weather = spark.read.option("mergeSchema", "true")
      .parquet(s"$out/wide/measurement=weather")
    assert(weather.columns.toSet == Set("time", "tags", "rh", "temp"))
    assert(weather.count() == 2)
    val r0 = weather.orderBy("time").head()
    assert(r0.getAs[Double]("temp") == 20.0 && r0.getAs[Double]("rh") == 40.0)
    val seeing = spark.read.parquet(s"$out/wide/measurement=seeing")
    assert(seeing.select("fwhm").as[Double].head() == 1.1)
    // schema evolution: a later batch introduces a new field
    val batch2 = Seq(TelemetryPoint("weather", Map("site" -> "APO"),
      Map("wind" -> 5.0), null, ts("2024-01-01 00:02:00"), None, None)).toDF()
    TelemetrySink.writeWideTables(batch2, out)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$out/wide/measurement=weather")
    assert(merged.columns.toSet == Set("time", "tags", "rh", "temp", "wind"))
    assert(merged.count() == 3)
  }

  test("config-driven spool source: yaml -> sens4 parser -> memory observer") {
    val spool = Files.createTempDirectory("graft-spool2-").toString
    val work = Files.createTempDirectory("graft-work2-").toString
    Files.write(Paths.get(spool, "replies.txt"),
      "@253ACKQ1.10E-04,2.20E-02,3.30E-03,21.50,x\\\t1704067200000".getBytes("UTF-8"))
    val cfg = EngineConfig.parse(
      s"""
         |tags: {observatory: LCO}
         |sources:
         |  s1: {type: spool, path: $spool, parser: sens4, ccd: r2, bucket: sensors}
         |observers:
         |  mem_spool: {type: memory}
         |""".stripMargin)
    val engine = new Engine(spark)
    engine.start(cfg, work)
    try {
      spark.streams.active.filter(_.name == "mem_spool")
        .foreach(_.processAllAvailable())
      val rows = spark.sql("SELECT * FROM mem_spool").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("measurement") == "pressure")
      val f = rows(0).getAs[Map[String, Double]]("fields")
      assert(f("pz") == 1.1e-4 && f("temp") == 21.5)
      assert(rows(0).getAs[Map[String, String]]("tags") ==
        Map("ccd" -> "r2", "observatory" -> "LCO"))
    } finally engine.stopAll()
  }
}
