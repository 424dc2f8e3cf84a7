package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import graft.streaming.{BootstrapCounters, DistinctMapReplay}

/** VERDICT r13 #4: `runToParquet` pins `spark.sql.shuffle.partitions`
  * for a replay's lifetime; the old bare set/restore raced when two
  * replays overlapped in one session (whichever restored last could
  * leave the session pinned). The refcounted ShufflePin serializes
  * conflicting pins and stacks same-value ones — this spec drives two
  * DIFFERENT replays truly concurrently and checks both results match
  * their sequential runs AND the session conf is restored.
  */
class ConcurrentReplaySpec extends SparkSpec {

  test("two concurrent replays produce their sequential results; conf restored") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")

    def run87() = BootstrapCounters.run(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    def run89() = DistinctMapReplay.run(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))

    // sequential ground truth (also builds the spools, so the
    // concurrent phase exercises the replays, not the generators)
    val seq87 = run87().toSeq
    val seq89 = run89().toSeq

    val f87 = Future(run87().toSeq)
    val f89 = Future(run89().toSeq)
    val con87 = Await.result(f87, 5.minutes)
    val con89 = Await.result(f89, 5.minutes)

    assert(con87 == seq87, "q87 replay diverged under concurrency")
    assert(con89 == seq89, "q89 replay diverged under concurrency")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "shuffle-partitions pin leaked out of the concurrent replays")
  }

  test("same replay kind concurrently: the run-dir sweep spares the live sibling") {
    // two q89 replays in one JVM share a spool base — freshRunDir's
    // sweep must not reclaim the first call's still-streaming
    // checkpoint when the second call starts (keep-newest-own rule)
    def run89() = DistinctMapReplay.run(spark, sf()).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSeq
    val seq = run89()
    val f1 = Future(run89())
    val f2 = Future(run89())
    assert(Await.result(f1, 5.minutes) == seq)
    assert(Await.result(f2, 5.minutes) == seq)
  }
}
