package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.streaming.SessionReplay

/** q84: streaming session_window across parity-split batches equals
  * batch sessionization — and the equality is non-trivial (sessions
  * really span both batches). */
class SessionReplaySpec extends SparkSpec {

  private lazy val streamed = SessionReplay.run(spark, sf()).collect()

  test("streaming sessions equal batch session_window exactly") {
    val batch = Tables.events(spark, sf())
      .groupBy(session_window(col("ts").cast("timestamp"), "30 minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("total"))
      .orderBy("user_id", "session_start")
      .collect()
    assert(streamed.nonEmpty && streamed.length == batch.length,
      s"session counts differ: streamed ${streamed.length} vs batch ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("the hash is earned: sessions span the parity boundary") {
    // a multi-event session must mix odd and even event_ids somewhere —
    // otherwise the replay never exercised cross-batch session merging
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("user_id"))
    val mixed = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(countDistinct(col("event_id") % 2).as("parities"),
        count(lit(1)).as("n"))
      .filter(col("parities") === 2)
      .count()
    assert(mixed > 0, "no session contains both parities — split is vacuous")
  }

  test("emits each session exactly once") {
    val keys = streamed.map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(keys.distinct.length == keys.length, "a session emitted twice")
  }
}
