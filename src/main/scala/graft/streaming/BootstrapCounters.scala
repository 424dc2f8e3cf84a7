package graft.streaming

import java.io.File
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** q87 — streaming state BOOTSTRAPPED from a batch corpus via
  * `StatefulProcessorWithInitialState` (the initial-state leg of Spark
  * 4's arbitrary-state API; q86 covers the plain leg). The production
  * pattern: a corpus-accounting job keeps per-(lang, source) running
  * totals — docs and chars — and a streaming ingest CONTINUES those
  * totals from the settled corpus instead of recounting history. Each
  * admitted document emits the updated running totals, so the sink is
  * an exactly-once audit log of corpus growth.
  *
  * `handleInitialState` seeds each key's `ValueState` with the batch
  * aggregate BEFORE the first micro-batch; stream rows then fold in
  * per-key, in doc_id order (time-split batches + per-batch sort give a
  * total order). The DuckDB oracle replays it as corpus aggregates
  * LEFT-JOINed to a cumulative window over the stream — integer-exact,
  * no float discipline needed. A hash match proves three things at
  * once: the bootstrap landed in state (counts start from corpus
  * totals, not zero), per-key state carries across the micro-batch
  * boundary (cumulative counts don't restart at the second batch), and
  * stream keys absent from the corpus start cleanly from zero.
  *
  * Scale shape: state is two longs per live key — corpus history enters
  * as ALREADY-AGGREGATED initial state (one batch aggregation of the
  * corpus, shuffled once by key), so bootstrap cost is O(keys), not
  * O(corpus rows), and the stream never rescans history. */
object BootstrapCounters {

  final case class CorpusStat(lang: String, source: String,
      c_docs: Long, c_chars: Long)
  final case class StreamDoc(doc_id: Long, lang: String, source: String,
      n_chars: Long)
  final case class RunningStat(doc_id: Long, lang: String, source: String,
      run_docs: Long, run_chars: Long)

  final class CounterProcessor
      extends StatefulProcessorWithInitialState[(String, String), StreamDoc, RunningStat, CorpusStat] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInitialState(key: (String, String), s: CorpusStat,
        timers: TimerValues): Unit =
      totals.update((s.c_docs, s.c_chars))

    override def handleInputRows(key: (String, String),
        rows: Iterator[StreamDoc], timers: TimerValues): Iterator[RunningStat] = {
      var (docs, chars) = if (totals.exists()) totals.get() else (0L, 0L)
      val out = rows.toArray.sortBy(_.doc_id).map { r =>
        docs += 1; chars += r.n_chars
        RunningStat(r.doc_id, r.lang, r.source, docs, chars)
      }
      totals.update((docs, chars))
      out.iterator
    }
  }

  /** The operator: continue per-key corpus counters over a stream. */
  def runningCounters(stream: Dataset[StreamDoc],
      corpus: Dataset[CorpusStat]): Dataset[RunningStat] = {
    import stream.sparkSession.implicits._
    stream.groupByKey(d => (d.lang, d.source))
      .transformWithState(new CounterProcessor,
        TimeMode.None(), OutputMode.Append(),
        corpus.groupByKey(c => (c.lang, c.source)))
  }

  private val SpoolSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("n_chars", LongType)))

  /** Corpus/stream split on an md5-derived hash of the id, NOT `doc_id
    * % 4`: the corpus generator strides doc_ids by source (stride ≡ 0
    * mod 4), so a modulus split would put every (lang, source) key
    * wholly on one side and the bootstrap leg would be vacuous — no
    * key would ever continue corpus totals. The hash split gives every
    * key both corpus history and stream arrivals at every sf dir
    * (BootstrapCountersSpec pins it). */
  def isStream(idCol: Column): Column =
    graft.dedup.Dedup.h60(idCol.cast("string")) % 4 === 0

  private def writeSpool(spark: SparkSession, dir: String, spool: File): Unit = {
    val stream = graft.Tables.documents(spark, dir)
      .filter(isStream(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    // guard the aggregate: an empty stream side (tiny corpus) yields a
    // null max — fall back to cut 0 (two empty staged batches) instead
    // of throwing (ADVICE r11 #4)
    val cutRow = stream.agg(max("doc_id")).head()
    val cut = if (cutRow.isNullAt(0)) 0L else cutRow.getLong(0) / 2
    ReplayScaffold.writeManifestBatch(spool, stream.filter(col("doc_id") < cut), 0)
    ReplayScaffold.writeManifestBatch(spool, stream.filter(col("doc_id") >= cut), 1)
  }

  /** Run the replay; returns `(doc_id, lang, source, run_docs, run_chars)`. */
  def run(spark: SparkSession, dir: String): DataFrame = {
    StreamingDedup.configureStateStore(spark)
    val spool = ReplayScaffold.spoolFor(spark, dir, "q87", "documents.parquet",
      "h60mod4;halves;manifest", writeSpool, expectedFiles = 2)
    val runDir = ReplayScaffold.freshRunDir(spool)

    import spark.implicits._
    val corpus = graft.Tables.documents(spark, dir)
      .filter(!isStream(col("doc_id")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("c_docs"), sum(col("n_chars")).as("c_chars"))
      .as[CorpusStat]
    // manifest-ordered arrival: batch i = batch-i.jsonl, by NAME — the
    // running counters are order-sensitive and this order is code-owned
    val in = ReplayScaffold.manifestStream(spark, spool, SpoolSchema)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .as[StreamDoc]
    val out = runningCounters(in, corpus)
    ReplayScaffold.runToParquet(out.toDF(), runDir).orderBy("doc_id")
  }
}
