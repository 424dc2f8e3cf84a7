package graft.streaming

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.Tables
import graft.text.TextStats

/** Streaming exact deduplication — the INGESTION-TIME member of the
  * dedup family (exact / MinHash / SimHash / Jaccard / embedding-LSH
  * cover the batch corpus; this one suppresses duplicates as documents
  * ARRIVE, before they ever land in the corpus).
  *
  * Two state regimes, chosen by whether the key domain is bounded:
  *
  *  - [[exactDedup]] (`dropDuplicates`): one state-store entry per
  *    unique fingerprint, FOREVER. At 100 TB that is only viable when
  *    the unique-key count is bounded (e.g. a fixed device/keyword set);
  *    for an open-ended document firehose the state grows with corpus
  *    cardinality — RocksDB-backed state makes it disk-bounded, but the
  *    right tool is usually the TTL variant below.
  *  - [[exactDedupTtl]] (`dropDuplicatesWithinWatermark`): state for a
  *    fingerprint is dropped once the event-time watermark passes its
  *    first-seen timestamp + `delay`, so state size is bounded by the
  *    unique-key ARRIVAL RATE × TTL window, independent of total corpus
  *    size. A duplicate arriving after its key's state expired is
  *    re-emitted — acceptable for ingestion dedup (a periodic batch
  *    `Dedup.exactGroups` pass sweeps long-range dups; this op kills the
  *    short-range storm: re-crawls, retry storms, mirror bursts).
  *
  * Both are thin by design — the semantics ARE Spark's stateful dedup
  * operators; the value is the fingerprint contract (identical
  * normalization to the batch dedup family, [[TextStats.fingerprint]],
  * so streaming and batch passes agree on what "identical" means) and
  * the oracle-checked end-to-end replay ([[run]] = q64), which proves
  * the cross-micro-batch state actually carries: the spool is split so
  * every duplicate family straddles the batch boundary — a dedup that
  * reset state per batch would re-emit all of them and hash-mismatch.
  */
object StreamingDedup {

  /** Fingerprint + key-derived projection shared by the streaming query
    * and the oracle: every output column is a function of the normalized
    * text, so WHICH family member survives cannot affect the result. */
  private def keyed(df: DataFrame, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), " +", " "))
    df.withColumn("fingerprint", TextStats.fingerprint(col(textCol)))
      .withColumn("norm_len", length(norm))
  }

  /** Exact streaming dedup on `keyCols`: emits the first arrival of each
    * key, suppresses every later duplicate. Unbounded state — see class
    * doc for when that is acceptable. */
  def exactDedup(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /** TTL streaming dedup: suppresses duplicates of a key for as long as
    * the watermark has not passed its first arrival's event time +
    * `delay`; afterwards the key's state is evicted and a late duplicate
    * is re-admitted (and re-starts the TTL). State is bounded by
    * rate × TTL. */
  def exactDedupTtl(df: DataFrame, eventTimeCol: String, delay: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  private val SpoolSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def rmTree(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
  }

  /** Spool `documents` as two parquet files so that consecutive members
    * of every duplicate family land in DIFFERENT files: rows are
    * numbered within their fingerprint family and alternate b1/b2, so a
    * family of n ≥ 2 always straddles the micro-batch boundary (and
    * families of n ≥ 3 also test within-batch dedup in b1). The window
    * partitions by fingerprint — no global sort; this is the test
    * harness' data generator, same contract as q52's spool writer. */
  private def writeSpool(spark: SparkSession, dir: String, spool: File): Unit = {
    val docs = keyed(Tables.documents(spark, dir), "text")
    val rn = row_number().over(
      Window.partitionBy(col("fingerprint")).orderBy(col("doc_id")))
    val parts = docs.select(col("doc_id"), col("text"),
      ((rn - 1) % 2).as("part")).persist()
    try {
      parts.filter(col("part") === 0).select("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(spool.toString)
      parts.filter(col("part") === 1).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(spool.toString)
    } finally parts.unpersist()
  }

  /** q64 — streaming exact dedup driven end to end: spool `documents`
    * across two micro-batches (every duplicate family split across
    * them), stream through [[exactDedup]] on the fingerprint into a
    * parquet sink, read the sink back. Output is one row per unique
    * fingerprint with key-derived columns only; the DuckDB oracle is a
    * batch `SELECT DISTINCT` over the same normalization — a hash match
    * proves per-key exactly-once emission ACROSS batch boundaries. */
  def run(spark: SparkSession, dir: String): DataFrame = {
    val base = new File(sys.props("java.io.tmpdir"), "graft-q64")
    rmTree(base)
    val spool = new File(base, "spool"); spool.mkdirs()
    writeSpool(spark, dir, spool)

    val docs = spark.readStream.schema(SpoolSchema)
      .option("maxFilesPerTrigger", 1).parquet(spool.toString)
    val unique = exactDedup(keyed(docs, "text"), Seq("fingerprint"))
      .select("fingerprint", "norm_len")
    val outDir = new File(base, "out")
    val q = unique.writeStream.format("parquet")
      .option("path", outDir.toString)
      .outputMode("append")
      .option("checkpointLocation", new File(base, "ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    spark.read.parquet(outDir.toString).orderBy("fingerprint")
  }
}
