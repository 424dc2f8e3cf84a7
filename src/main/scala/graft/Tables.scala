package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic test tables (TESTDATA.md).
  *
  * Timestamp policy: the driver has shipped `events.ts` in two physical
  * layouts across testdata generations — parquet `timestamp[ns]` (which
  * Spark 4 reads as a LongType of nanoseconds under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, set by [[GraftSession]])
  * and plain `timestamp[us]`. Parquet in the wild is written by many
  * engines, so [[events]] adapts to the SCANNED dtype instead of
  * hard-coding one layout: LongType → ns→µs floor division (identical to
  * DuckDB's ns→µs truncation), timestamp/timestamp_ntz → pass-through
  * cast to `TIMESTAMP_NTZ`. Everything stays timezone-naive so parity
  * with the oracle is bit-exact in both layouts.
  */
object Tables {
  /** Make a session the engine can run on regardless of who built it:
    * ns-timestamp reads, UTC, deterministic map merge, and the custom
    * function registry (a driver-owned session won't have loaded
    * [[graft.functions.GraftExtensions]]). Idempotent and cheap. */
  def harden(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    if (!spark.catalog.functionExists("cosine_sim"))
      graft.functions.VectorFunctions.register(spark)
    spark
  }

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    harden(spark).read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame = read(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = read(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = read(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = read(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = read(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = read(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = read(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = read(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = read(s, dir, "embeddings")

  /** `events` with `ts` normalized to TIMESTAMP_NTZ at µs precision,
    * whatever physical layout the parquet carries (see object scaladoc).
    * The dtype dispatch happens at plan-build time from the scanned
    * schema — zero runtime cost, and a future regeneration in either
    * layout keeps analyzing. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = read(s, dir, "events")
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val ts = raw.schema("ts").dataType match {
      case LongType => // legacy timestamp[ns] read as raw nanos
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
      case TimestampNTZType => col("ts")
      case TimestampType => // tz-aware µs; session is pinned UTC, so this
        col("ts").cast("timestamp_ntz") // is a relabel, not a shift
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
}

/** Session factory with the engine's standard configuration. */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tag-merge semantics: later maps win, like dict.update in the
      // reference (cerebro.py:412)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // codegen'd vector/fingerprint functions (cosine_sim, hamming_dist)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // The generated-class cache defaults to 100 entries — a session
      // running this engine's full query surface (60+ plans, several
      // generated classes each) evicts constantly, and every re-run of
      // an evicted plan recompiles from source (measured as 2-10x
      // single-run latency cliffs, SCALE.md "GC→codegen-recompile").
      // Static conf, so it must be set here at session build.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
