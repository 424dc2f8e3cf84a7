package graft

import java.nio.file.{Files, Paths}

class IncrementalSourceSpec extends SparkSpec {

  private def writeJsonl(dir: String, name: String, rows: Seq[(Long, String, Double)]): Unit =
    Files.write(Paths.get(dir, name),
      rows.map { case (ts, m, v) => s"""{"ts":$ts,"measurement":"$m","value":$v}""" }
        .mkString("\n").getBytes("UTF-8"))

  test("row-level incremental offsets: growing file yields only new rows, no duplicates") {
    val dir = Files.createTempDirectory("graft-inc-").toString
    val ckpt = Files.createTempDirectory("graft-inc-ckpt-").toString
    writeJsonl(dir, "a.jsonl", Seq((1000L, "temp", 1.0), (2000L, "temp", 2.0)))

    val stream = spark.readStream.format("graft.sources.IncrementalSource")
      .option("path", dir).load()
    val q = stream.writeStream.queryName("inc_mem").format("memory")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM inc_mem").head().getLong(0) == 2)

      // the SAME file grows (file-tracking sources would re-read or miss;
      // ts offsets pick up exactly the new rows)
      writeJsonl(dir, "a.jsonl", Seq(
        (1000L, "temp", 1.0), (2000L, "temp", 2.0),
        (3000L, "temp", 3.0), (4000L, "hum", 4.0)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT measurement, value FROM inc_mem ORDER BY value")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(rows == Seq(("temp", 1.0), ("temp", 2.0), ("temp", 3.0), ("hum", 4.0)))

      // a second file appears -> only its rows beyond the offset arrive
      writeJsonl(dir, "b.jsonl", Seq((3500L, "old", 9.0), (5000L, "temp", 5.0)))
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM inc_mem").head().getLong(0)
      // 3500 <= current offset 4000 -> that row is (correctly, per the
      // reference's semantics) skipped; 5000 arrives
      assert(n == 5)
      assert(spark.sql("SELECT count(*) FROM inc_mem WHERE measurement='old'")
        .head().getLong(0) == 0)
    } finally q.stop()
  }

  test("latestOffset caches per-file maxTs: unchanged files perform zero line reads") {
    val dir = Files.createTempDirectory("graft-inc3-").toString
    writeJsonl(dir, "a.jsonl", Seq((1000L, "temp", 1.0), (2000L, "temp", 2.0)))
    writeJsonl(dir, "b.jsonl", Seq((1500L, "hum", 3.0)))

    var linesRead = 0
    val counting: java.io.File => Iterator[String] = f => {
      val it = scala.io.Source.fromFile(f).getLines().toIndexedSeq.iterator
      it.map { l => linesRead += 1; l }
    }
    val tracker = new graft.sources.SpoolTracker(dir, counting)

    assert(tracker.maxTs() == 2000L)
    assert(linesRead == 3) // first trigger reads everything once

    // second trigger, nothing changed -> file-metadata only, ZERO line reads
    assert(tracker.maxTs() == 2000L)
    assert(linesRead == 3)

    // b.jsonl grows -> only b is re-read (its 2 lines), a is untouched
    writeJsonl(dir, "b.jsonl", Seq((1500L, "hum", 3.0), (5000L, "hum", 4.0)))
    assert(tracker.maxTs() == 5000L)
    assert(linesRead == 5)

    // deleted file is evicted and a new one is scanned fresh
    Files.delete(Paths.get(dir, "a.jsonl"))
    writeJsonl(dir, "c.jsonl", Seq((6000L, "temp", 6.0)))
    assert(tracker.maxTs() == 6000L)
    assert(linesRead == 6)
  }

  test("filesNewerThan prunes files whose cached maxTs is at or below the offset") {
    val dir = Files.createTempDirectory("graft-inc4-").toString
    writeJsonl(dir, "a.jsonl", Seq((1000L, "temp", 1.0), (2000L, "temp", 2.0)))
    writeJsonl(dir, "b.jsonl", Seq((1500L, "hum", 3.0)))
    val tracker = new graft.sources.SpoolTracker(dir)

    // cache not yet populated -> conservative: everything included
    assert(tracker.filesNewerThan(10000L).map(_.getName) == Seq("a.jsonl", "b.jsonl"))

    tracker.maxTs() // populate cache: a -> 2000, b -> 1500
    // steady state at offset 2000: no file can contribute -> empty plan
    assert(tracker.filesNewerThan(2000L).isEmpty)
    // offset 1500: only a has rows beyond it
    assert(tracker.filesNewerThan(1500L).map(_.getName) == Seq("a.jsonl"))

    // b grows but maxTs() hasn't run yet -> length mismatch, included
    // conservatively even though its cached ts is stale
    writeJsonl(dir, "b.jsonl", Seq((1500L, "hum", 3.0), (9000L, "hum", 4.0)))
    assert(tracker.filesNewerThan(2000L).map(_.getName) == Seq("b.jsonl"))

    // new file never seen -> included
    writeJsonl(dir, "c.jsonl", Seq((500L, "temp", 0.5)))
    assert(tracker.filesNewerThan(2000L).map(_.getName).toSet == Set("b.jsonl", "c.jsonl"))
  }

  test("timestamps arrive as proper TimestampType") {
    val dir = Files.createTempDirectory("graft-inc2-").toString
    val ckpt = Files.createTempDirectory("graft-inc2-ckpt-").toString
    writeJsonl(dir, "a.jsonl", Seq((1700000000000L, "temp", 1.0)))
    val q = spark.readStream.format("graft.sources.IncrementalSource")
      .option("path", dir).load()
      .writeStream.queryName("inc_mem2").format("memory")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val ts = spark.sql("SELECT ts FROM inc_mem2").head().getTimestamp(0)
      assert(ts.getTime == 1700000000000L)
    } finally q.stop()
  }
}
