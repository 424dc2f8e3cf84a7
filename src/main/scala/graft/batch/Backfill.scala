package graft.batch

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R1 — the reference's chunked backfill scan (`get_from_lco_api`,
  * cerebro/tools.py:117-169): a long time range is fetched in fixed-size
  * chunks with a small overlap (so boundary records are never missed),
  * then concatenated, sorted and deduped on the event key.
  *
  * In Spark the chunks parallelize instead of looping: the chunk list is
  * computed driver-side, each chunk becomes an independent read (HTTP
  * fetch, JDBC predicate, or parquet range filter), and the
  * overlap-induced duplicates are repaired by one `dropDuplicates`
  * shuffle — the same overlap+dedup idempotence contract the reference
  * relies on InfluxDB for (SURVEY.md §4).
  */
object Backfill {

  final case class Chunk(start: Timestamp, end: Timestamp)

  /** Chunk plan: `[start, end)` split into `chunkSeconds` windows, each
    * extended by `overlapSeconds` on the left (tools.py uses 15-day
    * chunks with a 0.1-day overlap stride). */
  def chunks(start: Timestamp, end: Timestamp,
      chunkSeconds: Long, overlapSeconds: Long): Seq[Chunk] = {
    require(chunkSeconds > overlapSeconds && overlapSeconds >= 0)
    Iterator.iterate(start.getTime)(_ + chunkSeconds * 1000)
      .takeWhile(_ < end.getTime)
      .map { s =>
        Chunk(new Timestamp(math.max(s - overlapSeconds * 1000, start.getTime)),
          new Timestamp(math.min(s + chunkSeconds * 1000, end.getTime)))
      }.toSeq
  }

  /** Run one fetch per chunk (each producing a DataFrame with `tsCol`),
    * union, time-filter to the requested range, dedup on `keyCols`, sort.
    * `fetch` is the per-chunk reader — a ranged parquet filter, a JDBC
    * predicate, or a driver-side HTTP call that parallelizes per chunk. */
  def read(spark: SparkSession,
      start: Timestamp, end: Timestamp,
      chunkSeconds: Long, overlapSeconds: Long,
      tsCol: String, keyCols: Seq[String])(fetch: Chunk => DataFrame): DataFrame = {
    val parts = chunks(start, end, chunkSeconds, overlapSeconds).map(fetch)
    BatchOps.dedupSort(
      BatchOps.timeRange(BatchOps.concat(parts), tsCol, start, end),
      keyCols, Seq(tsCol))
  }
}
