package graft.control

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Ingest observability — the Spark form of the reference's status verbs
  * (`cerebro status`, cerebro/cerebro.py:430-460) with real per-batch
  * metrics: rows/sec, batch duration, watermark position per query.
  * Attach once per session; `snapshot` is the status answer. */
final class Metrics extends StreamingQueryListener {

  final case class QueryStats(
      name: String,
      batches: Long,
      inputRows: Long,
      lastInputRowsPerSec: Double,
      lastBatchMs: Long,
      lastWatermark: String)

  private val stats = mutable.Map[String, QueryStats]()

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    stats.synchronized {
      stats(event.name) = QueryStats(event.name, 0, 0, 0.0, 0, "")
    }

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    stats.synchronized {
      val p = event.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      val prev = stats.getOrElse(name, QueryStats(name, 0, 0, 0.0, 0, ""))
      stats(name) = QueryStats(
        name,
        prev.batches + 1,
        prev.inputRows + p.numInputRows,
        p.inputRowsPerSecond,
        Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L),
        Option(p.eventTime.get("watermark")).getOrElse(""))
    }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def snapshot: Map[String, QueryStats] = stats.synchronized(stats.toMap)
}

object Metrics {
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
