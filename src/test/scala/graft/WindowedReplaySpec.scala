package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.WindowedReplay

/** Pins the measured append-mode watermark semantics q80 replays (see
  * WindowedReplay's scaladoc: effective watermark lags one batch; late
  * rows are judged by their WINDOW, not raw ts). */
class WindowedReplaySpec extends SparkSpec {

  private lazy val out = WindowedReplay.run(spark, sf()).collect()

  test("emits each (window, type) exactly once, never past the final watermark") {
    assert(out.nonEmpty)
    val keys = out.map(r => (r.getTimestamp(0), r.getString(2)))
    assert(keys.distinct.length == keys.length, "append emitted a window twice")
    val ev = Tables.events(spark, sf()).select(col("ts").cast("timestamp"))
    val maxTs = ev.agg(max("ts")).collect()(0).getTimestamp(0)
    val wmc = new Timestamp(maxTs.getTime - 3600 * 1000)
    out.foreach { r =>
      assert(!r.getTimestamp(1).after(wmc),
        s"window ending ${r.getTimestamp(1)} emitted past final watermark $wmc")
    }
  }

  test("stragglers into watermark-closed windows are dropped; open windows keep them") {
    // full batch counts per (hour, type) over ALL rows
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("event_type"))
    val full = ev.groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .count().collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    // wmA = max(batch-1 ts) - 1h: the watermark active when batch 3
    // (the stragglers) runs
    val wmA = new Timestamp(ev
      .filter(col("ts") < lit("2024-01-16") && col("event_id") % 97 =!= 0)
      .agg(max("ts")).collect()(0).getTimestamp(0).getTime - 3600 * 1000)
    // straggler counts per closed window (what freezing must exclude)
    val closedStragglers = ev
      .filter(col("event_id") % 97 === 0)
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type")).count()
      .filter(unix_micros(col("ws")) + 3600L * 1000000 <= lit(wmA).cast("timestamp").cast("long") * 1000000)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(closedStragglers.nonEmpty, "fixture must have closed-window stragglers")
    var frozenChecked = 0
    out.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(2))
      val end = r.getTimestamp(1)
      closedStragglers.get(key).foreach { s =>
        if (!end.after(wmA)) {
          assert(r.getLong(3) == full(key) - s,
            s"closed window $key must freeze without its $s straggler(s)")
          frozenChecked += 1
        }
      }
      if (end.after(wmA)) assert(r.getLong(3) == full(key),
        s"open window $key must count every row incl. stragglers")
    }
    assert(frozenChecked > 0, "no frozen window was actually checked")
  }
}
