package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.streaming.JoinReplay

/** q85: watermarked stream-stream interval join equals the batch join,
  * matches genuinely cross micro-batch boundaries, and a tight
  * watermark really evicts buffered state (the 100 TB story). */
class JoinReplaySpec extends SparkSpec {

  private lazy val streamed = JoinReplay.run(spark, sf()).collect()

  private lazy val batchJoin = {
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("value"))
    val a = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id").as("a_id"), col("ts").as("ts_a"),
        col("user_id").as("user_a"), col("value").as("value_a"))
    val b = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id").as("b_id"), col("ts").as("ts_b"),
        col("user_id").as("user_b"), col("value").as("value_b"))
    a.join(b, expr(
      """user_a = user_b AND
         ts_b >= ts_a - INTERVAL 60 MINUTES AND
         ts_b <= ts_a + INTERVAL 60 MINUTES"""))
      .select(col("a_id"), col("b_id"), col("user_a").as("user_id"),
        col("ts_a"), col("ts_b"),
        (col("value_a").cast(DecimalType(12, 2)) +
          col("value_b").cast(DecimalType(12, 2))).cast("double").as("vsum"))
      .orderBy("a_id", "b_id")
      .collect()
  }

  test("streamed join equals the batch interval join exactly") {
    assert(streamed.nonEmpty && streamed.length == batchJoin.length,
      s"match counts differ: streamed ${streamed.length} vs batch ${batchJoin.length}")
    streamed.zip(batchJoin).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("the hash is earned: matches cross the trigger boundary") {
    // B splits by (event_id DIV 2) parity, so a match whose B row is in
    // B's second file but whose A row is in A's first (pre-split) file
    // can only have come from buffered A state — require at least one.
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val crossed = streamed.count { r =>
      val bId = r.getLong(1); val tsA = r.getTimestamp(3)
      (bId / 2) % 2 == 1 && tsA.before(split)
    }
    assert(crossed > 0, "no match crossed a trigger boundary — split is vacuous")
  }

  test("a tight watermark evicts state (and only drops what it promises)") {
    // delay 2h << month span: after trigger 1 the global watermark sits
    // ~2h below A's split instant, so B's trigger-2 rows older than that
    // are dropped/evicted and their cross-batch matches MUST be missing
    // — if the tight run still equals the full join, the watermark did
    // nothing and the eviction claim is unverified. Within-trigger
    // matches survive, so the output stays a dup-free subset.
    val tight = JoinReplay.run(spark, sf(), delay = "2 hours").collect()
    val full = batchJoin.map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = tight.map(r => (r.getLong(0), r.getLong(1)))
    assert(got.distinct.length == got.length, "tight run duplicated a match")
    assert(got.forall(full), "tight run emitted a pair the batch join lacks")
    assert(got.length < full.size,
      s"tight watermark dropped nothing (${got.length} of ${full.size}) — eviction unverified")
  }
}
