package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.sources.{Parsers, PollingSource}
import graft.sinks.TelemetrySink
import graft.streaming.StreamOps

/** End-to-end ingest path: driver-side poller → file spool → streaming
  * parse (sens4 protocol) → normalize → idempotent parquet sink — the full
  * SURVEY.md §3.1 daemon shape with a fake device instead of a socket. */
class PollingE2ESpec extends SparkSpec {

  test("poller -> spool -> parser -> normalize -> sink, with failure isolation") {
    val spool = Files.createTempDirectory("graft-spool-").toString
    val out = Files.createTempDirectory("graft-out-").toString
    val n = new AtomicInteger(0)
    // fake sens4 device: fails on the 2nd poll (must not kill the poller)
    val poll = () => {
      val i = n.incrementAndGet()
      if (i == 2) throw new RuntimeException("device hiccup")
      Seq(f"@253ACKQ${1.0 + i}%.2fE-04,2.00E-02,3.00E-03,25.40,x\\")
    }
    val src = new PollingSource("sens4-b1", spool, poll, delayMs = 50,
      bucket = Some("sensors"))
    src.start()
    try {
      // wait until a few successful polls have spooled
      val deadline = System.currentTimeMillis() + 15000
      while (n.get() < 5 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(n.get() >= 5, "poller should keep polling after a failure")
      src.stop() // freeze the spool so processAllAvailable can drain

      val points = StreamOps.normalize(Map("observatory" -> "LCO"))(
        Parsers.sens4(src.rawStream(spark), ccd = "b1"))
      val q = TelemetrySink.start(points, s"$out/data", s"$out/ckpt",
        defaultBucket = "sensors", queryName = "e2e-sink")
      try q.processAllAvailable() finally q.stop()

      val result = spark.read.parquet(s"$out/data")
      assert(result.count() >= 4) // >=5 polls, 1 failed, all distinct values
      assert(result.select("measurement").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("pressure"))
      val row = result.orderBy("time").collect().head
      assert(row.getAs[Map[String, String]]("tags") ==
        Map("ccd" -> "b1", "observatory" -> "LCO"))
      val f = row.getAs[Map[String, Double]]("fields")
      assert(f("pir") == 2.0e-2 && f("temp") == 25.40)
      assert(row.getAs[String]("bucket") == "sensors")
    } finally src.stop()
  }
}
