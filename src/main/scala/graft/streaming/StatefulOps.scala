package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via `flatMapGroupsWithState` — the
  * pattern for telemetry semantics Spark's built-in aggregates can't
  * express: exponentially-weighted moving averages that must carry state
  * across micro-batches, and heartbeat/gap detection (a sensor going
  * silent is itself a signal — the streaming form of the reference's
  * staleness concern, lvm.py:80-82, done with engine-managed state +
  * timeouts instead of wall-clock checks).
  */
object StatefulOps {

  final case class SeriesPoint(series: String, ts: Timestamp, value: Double)
  final case class EwmaState(ewma: Double, n: Long, lastTs: Long)
  final case class EwmaOut(series: String, ts: Timestamp, value: Double,
      ewma: Double, n: Long, gap_ms: Long)

  final case class Chunk(conn: String, seq: Long, data: String)
  final case class LineOut(conn: String, line: String)
  final case class LineBuffer(nextSeq: Long, partial: String,
      pending: Map[Long, String])

  /** S10 — stateful line reassembly (`ActorClientSource`'s hand-rolled
    * buffer, cerebro/sources/tron.py:336-380): TCP delivers byte chunks
    * at arbitrary boundaries; per connection, chunks are applied in
    * `seq` order, complete `\n`-terminated lines are emitted, and the
    * trailing partial line carries over in state to the next micro-batch.
    *
    * Ordering is enforced ACROSS batches, not just within one: a chunk
    * whose `seq` is ahead of the next expected value waits in state
    * (`pending`) until the gap fills, and a replayed chunk (`seq` below
    * the high-water mark) is dropped — so reordering or redelivery at
    * micro-batch boundaries cannot corrupt reassembled lines.
    *
    * A new connection's state anchors at `firstSeq` (default 0 — the
    * reference protocol numbers chunks from 0 per connection,
    * tron.py:336-380), NOT at the min seq of whatever batch happens to
    * arrive first: if chunk 0 is delayed into a later micro-batch than
    * chunk 1, it must still be awaited, not dropped as a replay. Streams
    * that attach mid-connection must pass their attach point as
    * `firstSeq`.
    *
    * `maxPending` bounds per-connection state: if a gap never fills (a
    * chunk is genuinely lost) and `maxPending` chunks pile up behind it,
    * reassembly SKIPS to the earliest buffered seq, discarding the
    * partial line spanning the gap (it is corrupt by construction).
    * One lost chunk therefore costs at most one line plus `maxPending`
    * buffered chunks of memory — it cannot wedge the connection or grow
    * state without bound. */
  def reassembleLines(chunks: Dataset[Chunk], firstSeq: Long = 0L,
      maxPending: Int = 1024): Dataset[LineOut] = {
    implicit val outEnc = Encoders.product[LineOut]
    implicit val stateEnc = Encoders.product[LineBuffer]
    implicit val keyEnc = Encoders.STRING
    chunks.groupByKey(_.conn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (conn: String, rows: Iterator[Chunk], state: GroupState[LineBuffer]) =>
          val batch = rows.toSeq
          val st = state.getOption.getOrElse(LineBuffer(firstSeq, "", Map.empty))
          var pending = st.pending ++
            batch.filter(_.seq >= st.nextSeq).map(c => c.seq -> c.data)
          var nextSeq = st.nextSeq
          var partial = st.partial
          val out = scala.collection.mutable.ArrayBuffer[LineOut]()
          def drain(): Unit = while (pending.contains(nextSeq)) {
            val buf = partial + pending(nextSeq)
            pending -= nextSeq
            val parts = buf.split("\n", -1) // keep trailing empty = no partial
            parts.dropRight(1).foreach(l => out += LineOut(conn, l))
            partial = parts.last
            nextSeq += 1
          }
          drain()
          while (pending.size > maxPending) {
            // gap escape hatch: the chunk at nextSeq is lost — resume at
            // the earliest buffered seq; the line spanning the gap is
            // unrecoverable, so the carried partial is dropped with it.
            nextSeq = pending.keys.min
            partial = ""
            drain()
          }
          state.update(LineBuffer(nextSeq, partial, pending))
          out.iterator
      }
  }

  /** Per-series EWMA with carry-over across micro-batches.
    * `alpha` is the smoothing factor; emits one row per input point with
    * the running EWMA, the count, and the gap to the previous point.
    * Batches are processed in event-time order within each group. */
  def ewma(points: Dataset[SeriesPoint], alpha: Double): Dataset[EwmaOut] = {
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val keyEnc = Encoders.STRING
    points.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (series: String, rows: Iterator[SeriesPoint], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(Double.NaN, 0L, Long.MinValue))
          val out = rows.toSeq.sortBy(_.ts.getTime).map { p =>
            val gap = if (st.lastTs == Long.MinValue) 0L else p.ts.getTime - st.lastTs
            val e = if (st.n == 0) p.value else alpha * p.value + (1 - alpha) * st.ewma
            st = EwmaState(e, st.n + 1, p.ts.getTime)
            EwmaOut(series, p.ts, p.value, e, st.n, gap)
          }
          state.update(st)
          out.iterator
      }
  }
}
