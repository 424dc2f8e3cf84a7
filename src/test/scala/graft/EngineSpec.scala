package graft

import java.nio.file.Files
import graft.control.{Engine, EngineConfig}
import graft.sources.Backoff

class EngineSpec extends SparkSpec {

  private val yaml =
    """
      |tags:
      |  observatory: ${GRAFT_TEST_OBS}
      |sources:
      |  s_replay:
      |    type: replay
      |    path: /tmp/replay
      |    bucket: sensors
      |    tags: {spectrograph: sp1}
      |  s_other:
      |    type: replay
      |    path: /tmp/other
      |observers:
      |  o_parquet:
      |    type: parquet
      |    path: /tmp/out
      |profiles:
      |  lvm:
      |    sources: [s_replay]
      |""".stripMargin

  test("config: env interpolation, sections, profile selection") {
    val cfg = EngineConfig.parse(yaml, env = Map("GRAFT_TEST_OBS" -> "LCO"))
    assert(cfg.tags == Map("observatory" -> "LCO"))
    assert(cfg.sources.map(_.name) == Seq("s_other", "s_replay"))
    assert(cfg.sources.find(_.name == "s_replay").get.bucket.contains("sensors"))
    assert(cfg.sources.find(_.name == "s_replay").get.tags == Map("spectrograph" -> "sp1"))
    assert(cfg.observers.map(_.typ) == Seq("parquet"))

    val lvm = EngineConfig.parse(yaml, profile = Some("lvm"))
    assert(lvm.sources.map(_.name) == Seq("s_replay"))
    assert(lvm.tags == Map("observatory" -> "")) // unset env var -> empty
    intercept[IllegalArgumentException] {
      EngineConfig.parse(yaml, profile = Some("nope"))
    }
  }

  test("engine: config -> replay source -> memory observer, end to end") {
    import spark.implicits._
    import graft.model.TelemetryPoint
    val dir = Files.createTempDirectory("graft-replay-").toString
    val work = Files.createTempDirectory("graft-work-").toString
    Seq(TelemetryPoint("temperature", Map("a" -> "1"), Map("value" -> 20.0),
        null, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), None, None))
      .toDF().write.parquet(s"$dir/batch0")
    val cfg = EngineConfig.parse(
      s"""
         |tags: {site: APO}
         |sources:
         |  replay1: {type: replay, path: $dir/batch0, bucket: b1, tags: {src: replay1}}
         |observers:
         |  mem1: {type: memory}
         |""".stripMargin)
    val engine = new Engine(spark)
    engine.start(cfg, work)
    try {
      spark.streams.active.foreach(_.processAllAvailable())
      val out = spark.sql("SELECT * FROM mem1")
      assert(out.count() == 1)
      val row = out.head()
      val tags = row.getAs[Map[String, String]]("tags")
      assert(tags == Map("a" -> "1", "src" -> "replay1", "site" -> "APO"))
      assert(row.getAs[String]("bucket") == "b1")
      assert(engine.status == Map("mem1" -> true))
    } finally engine.stopAll()
  }

  test("backoff: grows by e, caps, resets") {
    val b = Backoff(initialDelayMs = 1000, jitter = 0.0)
    val d1 = b.nextDelayMs(); val d2 = b.nextDelayMs(); val d3 = b.nextDelayMs()
    assert(d1 == 1000)
    assert(math.abs(d2 - math.E * 1000) < 1)
    assert(math.abs(d3 - math.E * math.E * 1000) < 10)
    (1 to 20).foreach(_ => b.nextDelayMs())
    assert(b.nextDelayMs() <= 3600000)
    b.reset()
    assert(b.nextDelayMs() == 1000)
  }
}
