package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{EwmaOut, SeriesPoint}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("line reassembly: chunk boundaries and partials survive across batches") {
    import graft.streaming.StatefulOps.{Chunk, LineOut}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val q = StatefulOps.reassembleLines(in.toDS())
      .writeStream.queryName("lines_mem").format("memory")
      .outputMode("append").start()
    try {
      in.addData(Chunk("c1", 0, "ab"), Chunk("c1", 1, "c\nde"), Chunk("c2", 0, "xx\n"))
      q.processAllAvailable()
      // partial "de" carries over; next batch completes it
      in.addData(Chunk("c1", 2, "f\ntail"))
      q.processAllAvailable()
      val got = spark.sql("SELECT conn, line FROM lines_mem ORDER BY conn, line")
        .as[LineOut].collect().toSeq
      assert(got == Seq(LineOut("c1", "abc"), LineOut("c1", "def"), LineOut("c2", "xx")))
    } finally q.stop()
  }

  test("line reassembly holds out-of-order chunks across batches until the gap fills") {
    import graft.streaming.StatefulOps.{Chunk, LineOut}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val q = StatefulOps.reassembleLines(in.toDS())
      .writeStream.queryName("lines_gap_mem").format("memory")
      .outputMode("append").start()
    try {
      // seq 1 missing: seq 2 must wait in state, seq 0 emits its full line
      in.addData(Chunk("c1", 0, "aa\nb"), Chunk("c1", 2, "c\n"))
      q.processAllAvailable()
      val early = spark.sql("SELECT line FROM lines_gap_mem").as[String].collect().toSeq
      assert(early == Seq("aa"), s"gapped chunk must not emit early: $early")
      // the gap arrives in a LATER batch (plus a replay of seq 0, dropped)
      in.addData(Chunk("c1", 1, "X"), Chunk("c1", 0, "aa\nb"))
      q.processAllAvailable()
      val got = spark.sql("SELECT line FROM lines_gap_mem ORDER BY line")
        .as[String].collect().toSeq
      assert(got == Seq("aa", "bXc"))
    } finally q.stop()
  }

  test("line reassembly awaits a delayed FIRST chunk instead of dropping it") {
    import graft.streaming.StatefulOps.{Chunk, LineOut}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val q = StatefulOps.reassembleLines(in.toDS())
      .writeStream.queryName("lines_first_mem").format("memory")
      .outputMode("append").start()
    try {
      // the connection's true first chunk (seq 0) is delayed into the
      // SECOND micro-batch — state must anchor at 0 and wait, not anchor
      // at 1 and later discard seq 0 as a replay
      in.addData(Chunk("c1", 1, "b\nc"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM lines_first_mem").count() == 0)
      in.addData(Chunk("c1", 0, "a"))
      q.processAllAvailable()
      val got = spark.sql("SELECT line FROM lines_first_mem ORDER BY line")
        .as[String].collect().toSeq
      assert(got == Seq("ab"))
    } finally q.stop()
  }

  test("line reassembly skips past a permanently lost chunk at maxPending") {
    import graft.streaming.StatefulOps.{Chunk, LineOut}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val q = StatefulOps.reassembleLines(in.toDS(), maxPending = 2)
      .writeStream.queryName("lines_lost_mem").format("memory")
      .outputMode("append").start()
    try {
      // seq 1 never arrives; three chunks pile up behind the gap (> cap 2)
      // → skip to seq 2. The line spanning the gap is discarded IN FULL:
      // its head "x" (the carried partial) AND its tail "b" (the resumed
      // data up to its first newline) — emitting "b" as a line would hand
      // a silently truncated fragment downstream.
      in.addData(Chunk("c1", 0, "aa\nx"), Chunk("c1", 2, "b\ncc"),
        Chunk("c1", 3, "\ndd"), Chunk("c1", 4, "\n"))
      q.processAllAvailable()
      val got = spark.sql("SELECT line FROM lines_lost_mem ORDER BY line")
        .as[String].collect().toSeq
      // "aa" emitted before the gap; after skipping: "cc", "dd"
      assert(got == Seq("aa", "cc", "dd"))
    } finally q.stop()
  }

  test("line reassembly's post-skip suppression survives micro-batch boundaries") {
    import graft.streaming.StatefulOps.{Chunk, LineOut}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val q = StatefulOps.reassembleLines(in.toDS(), maxPending = 2)
      .writeStream.queryName("lines_skipb_mem").format("memory")
      .outputMode("append").start()
    try {
      // gap at seq 1; resumed data "bb" has NO newline in this batch, so
      // the corrupt tail is still open when the batch ends
      in.addData(Chunk("c1", 0, "aa\nx"), Chunk("c1", 2, "bb"),
        Chunk("c1", 3, "bb"), Chunk("c1", 4, "bb"))
      q.processAllAvailable()
      // next batch closes the corrupt line and starts a clean one — only
      // the clean line may emerge
      in.addData(Chunk("c1", 5, "b\nclean\n"))
      q.processAllAvailable()
      val got = spark.sql("SELECT line FROM lines_skipb_mem ORDER BY line")
        .as[String].collect().toSeq
      assert(got == Seq("aa", "clean"))
    } finally q.stop()
  }

  // With idleTimeoutMs (ProcessingTimeTimeout), Spark runs a state-
  // maintenance batch every trigger — `processAllAvailable` NEVER
  // returns on such a query (noNewData is never set because a next
  // batch is always due), so these tests poll with deadlines instead.
  private def awaitInputRows(q: org.apache.spark.sql.streaming.StreamingQuery,
      n: Long, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (q.recentProgress.map(_.numInputRows).sum < n) {
      assert(System.currentTimeMillis() < deadline,
        s"timed out waiting for $n input rows; got ${q.recentProgress.map(_.numInputRows).sum}")
      Thread.sleep(50)
    }
  }
  private def awaitTableCount(table: String, n: Long, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.sql(s"SELECT count(*) FROM $table").head().getLong(0) < n) {
      assert(System.currentTimeMillis() < deadline,
        s"timed out waiting for $n rows in $table")
      Thread.sleep(50)
    }
  }

  test("line reassembly evicts idle connections; partial is dropped") {
    import graft.streaming.StatefulOps.{Chunk, LineOut}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Chunk]
    val q = StatefulOps.reassembleLines(in.toDS(), idleTimeoutMs = 100L)
      .writeStream.queryName("lines_evict_mem").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .outputMode("append").start()
    try {
      // c1 leaves an open partial "ab", then goes silent
      in.addData(Chunk("c1", 0, "ab"))
      awaitInputRows(q, 1)
      // state-maintenance batches keep firing each trigger; after the
      // idle timeout c1's state is evicted (partial discarded)
      Thread.sleep(1000)
      // c1 "resumes": with state evicted it re-anchors at firstSeq=0, so
      // this seq-0 chunk starts a FRESH buffer — "cd", not "abcd"
      in.addData(Chunk("c1", 0, "cd\n"))
      awaitTableCount("lines_evict_mem", 1)
      val got = spark.sql("SELECT line FROM lines_evict_mem ORDER BY line")
        .as[String].collect().toSeq
      assert(got == Seq("cd"), s"expected evicted state to restart the buffer: $got")
    } finally q.stop()
  }

  test("ewma evicts idle series; a resumed series restarts smoothing") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeriesPoint]
    val q = StatefulOps.ewma(in.toDS(), alpha = 0.5, idleTimeoutMs = 100L)
      .writeStream.queryName("ewma_evict_mem").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .outputMode("append").start()
    try {
      in.addData(SeriesPoint("temp", ts("2024-01-01 00:00:00"), 10.0))
      awaitTableCount("ewma_evict_mem", 1)
      Thread.sleep(1000) // idle past the timeout -> evicted
      // temp resumes AFTER eviction: n restarts at 1, ewma = raw value,
      // gap = 0 (no remembered lastTs)
      in.addData(SeriesPoint("temp", ts("2024-01-01 01:00:00"), 30.0))
      awaitTableCount("ewma_evict_mem", 2)
      val rows = spark.sql("SELECT * FROM ewma_evict_mem WHERE series='temp' ORDER BY ts")
        .as[EwmaOut].collect()
      assert(rows.map(_.ewma).toSeq == Seq(10.0, 30.0))
      assert(rows.map(_.n).toSeq == Seq(1L, 1L))
      assert(rows.map(_.gap_ms).toSeq == Seq(0L, 0L))
    } finally q.stop()
  }

  test("ewma carries state across micro-batches and tracks gaps per series") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SeriesPoint]
    val q = StatefulOps.ewma(in.toDS(), alpha = 0.5)
      .writeStream.queryName("ewma_mem").format("memory")
      .outputMode("append").start()
    try {
      in.addData(
        SeriesPoint("temp", ts("2024-01-01 00:00:00"), 10.0),
        SeriesPoint("temp", ts("2024-01-01 00:00:10"), 20.0),
        SeriesPoint("pressure", ts("2024-01-01 00:00:00"), 1.0))
      q.processAllAvailable()
      // second batch: state must continue from ewma=15.0
      in.addData(SeriesPoint("temp", ts("2024-01-01 00:01:10"), 30.0))
      q.processAllAvailable()

      val rows = spark.sql("SELECT * FROM ewma_mem ORDER BY series, ts")
        .as[EwmaOut].collect()
      val temp = rows.filter(_.series == "temp")
      assert(temp.map(_.ewma).toSeq == Seq(10.0, 15.0, 22.5)) // 0.5*30+0.5*15
      assert(temp.map(_.n).toSeq == Seq(1L, 2L, 3L))
      assert(temp.map(_.gap_ms).toSeq == Seq(0L, 10000L, 60000L))
      val pres = rows.filter(_.series == "pressure")
      assert(pres.map(_.ewma).toSeq == Seq(1.0)) // independent key state
    } finally q.stop()
  }
}
