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
  *
  * ==State bounds==
  * Both ops accept `idleTimeoutMs`: a key (connection / series) that
  * receives no data for that long is EVICTED via a processing-time
  * timeout, so dead keys cannot hold state forever and total state is
  * bounded by the live key cardinality. With the default `0` no timeout
  * is registered (callers that know their key set is static can skip the
  * timeout bookkeeping).
  *
  * CAVEAT — pair `idleTimeoutMs` with an explicit
  * `Trigger.ProcessingTime(...)` on the query: `ProcessingTimeTimeout`
  * makes Spark re-check timeouts on EVERY batch
  * (`FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is
  * unconditionally true for it), so the default run-ASAP trigger
  * busy-loops empty micro-batches between data arrivals. Any interval
  * works (eviction latency = interval + timeout); a fraction of the
  * timeout is a sensible default. For the same reason
  * `processAllAvailable()` never returns on such a query (a next batch
  * is always due) — poll the sink with a deadline instead.
  */
object StatefulOps {

  final case class SeriesPoint(series: String, ts: Timestamp, value: Double)
  final case class EwmaState(ewma: Double, n: Long, lastTs: Long)
  final case class EwmaOut(series: String, ts: Timestamp, value: Double,
      ewma: Double, n: Long, gap_ms: Long)

  final case class Chunk(conn: String, seq: Long, data: String)
  final case class LineOut(conn: String, line: String)
  final case class LineBuffer(nextSeq: Long, partial: String,
      pending: Map[Long, String], dropHead: Boolean)

  /** [[Chunk]] with the chunk's receive timestamp — the live push
    * transport's spool record ([[graft.sources.PushSource]]). */
  final case class TsChunk(conn: String, seq: Long, data: String, ts: Timestamp)
  final case class LineTsOut(conn: String, line: String, recv_time: Timestamp)

  private def timeoutConf(idleTimeoutMs: Long): GroupStateTimeout =
    if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  /** S10 — stateful line reassembly (the hand-rolled receive buffer of
    * the reference's actor client, cerebro/sources/tron.py:336-380): TCP
    * delivers byte chunks at arbitrary boundaries; per connection, chunks
    * are applied in `seq` order, complete `\n`-terminated lines are
    * emitted, and the trailing partial line carries over in state to the
    * next micro-batch.
    *
    * Ordering is enforced ACROSS batches, not just within one: a chunk
    * whose `seq` is ahead of the next expected value waits in state
    * (`pending`) until the gap fills, and a replayed chunk (`seq` below
    * the high-water mark) is dropped — so reordering or redelivery at
    * micro-batch boundaries cannot corrupt reassembled lines.
    *
    * ==Sequence anchoring==
    * `seq` is THIS library's framing, not the reference's (the reference
    * reads a plain TCP stream with no sequence numbers — the chunking
    * only exists here because micro-batches may reorder rows). A new
    * connection's state anchors at `firstSeq` (default 0), NOT at the min
    * seq of whatever batch happens to arrive first: if chunk 0 is delayed
    * into a later micro-batch than chunk 1, it must still be awaited, not
    * dropped as a replay. CAVEAT — sources whose sequence numbers do not
    * start at 0 (byte offsets, mid-stream attach) MUST pass their attach
    * point as `firstSeq`, otherwise every connection buffers `maxPending`
    * chunks before the gap-skip engages and one line is lost.
    *
    * `maxPending` bounds per-connection state: if a gap never fills (a
    * chunk is genuinely lost) and `maxPending` chunks pile up behind it,
    * reassembly SKIPS to the earliest buffered seq. The line spanning the
    * gap is corrupt by construction and is discarded IN FULL: both its
    * head (the carried partial) and its tail (the resumed data up to and
    * including its first newline, tracked via `dropHead` so the
    * suppression survives micro-batch boundaries). One lost chunk
    * therefore costs at most one line plus `maxPending` buffered chunks
    * of memory — it cannot wedge the connection or grow state without
    * bound.
    *
    * With `idleTimeoutMs > 0`, a connection idle that long is evicted;
    * its carried partial line is dropped (the reference equivalent: a
    * closed connection's receive buffer is abandoned, tron.py:336-380). */
  def reassembleLines(chunks: Dataset[Chunk], firstSeq: Long = 0L,
      maxPending: Int = 1024, idleTimeoutMs: Long = 0L): Dataset[LineOut] = {
    implicit val outEnc = Encoders.product[LineOut]
    implicit val stateEnc = Encoders.product[LineBuffer]
    implicit val keyEnc = Encoders.STRING
    chunks.groupByKey(_.conn)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(idleTimeoutMs)) {
        (conn: String, rows: Iterator[Chunk], state: GroupState[LineBuffer]) =>
          if (state.hasTimedOut) {
            // dead connection: drop the partial, free the state
            state.remove()
            Iterator.empty
          } else {
            // In-order fast path (the q52 16× audit): chunks arrive
            // overwhelmingly in seq order, and the original
            // put-everything-in-the-Map form built a batch-sized
            // immutable Map per connection per batch (boxed keys, HAMT
            // churn) just to drain it again. Sorting the batch by seq
            // and emitting contiguous chunks DIRECTLY keeps `pending`
            // for genuine gaps only — same gap/maxPending behavior,
            // allocation proportional to disorder instead of volume.
            // Duplicate rule: a re-sent seq within one batch is
            // FIRST-WINS (the first occurrence emits and advances the
            // high-water mark; later copies fall below it and drop) —
            // the old Map-merge form kept the last copy instead. A
            // transport that re-sends a seq with DIFFERENT payload is
            // already corrupt; first-wins matches the cross-batch rule
            // (a duplicate arriving a batch later always drops), so one
            // rule now covers both cases.
            val batch = rows.toArray
            java.util.Arrays.sort(batch, Ordering.by((c: Chunk) => c.seq))
            val st = state.getOption.getOrElse(LineBuffer(firstSeq, "", Map.empty, dropHead = false))
            var pending = st.pending
            var nextSeq = st.nextSeq
            var partial = st.partial
            var dropHead = st.dropHead
            val out = scala.collection.mutable.ArrayBuffer[LineOut]()
            def emit(data: String): Unit = {
              val buf = partial + data
              val parts = buf.split("\n", -1) // keep trailing empty = no partial
              parts.dropRight(1).foreach { l =>
                if (dropHead) dropHead = false // tail of a gap-corrupt line
                else out += LineOut(conn, l)
              }
              partial = parts.last
              nextSeq += 1
            }
            def drain(): Unit = while (pending.contains(nextSeq)) {
              val d = pending(nextSeq)
              pending -= nextSeq
              emit(d)
            }
            batch.foreach { c =>
              if (c.seq == nextSeq) { emit(c.data); if (pending.nonEmpty) drain() }
              else if (c.seq > nextSeq) pending += (c.seq -> c.data)
              // else: replay below the high-water mark — dropped
            }
            drain()
            while (pending.size > maxPending) {
              // gap escape hatch: the chunk at nextSeq is lost — resume at
              // the earliest buffered seq; the line spanning the gap is
              // unrecoverable, so the carried partial is dropped and the
              // resumed data's first completed line (its tail) is
              // suppressed via dropHead.
              nextSeq = pending.keys.min
              partial = ""
              dropHead = true
              drain()
            }
            state.update(LineBuffer(nextSeq, partial, pending, dropHead))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }

  /** [[reassembleLines]] carrying receive timestamps — the live
    * transport's variant: each emitted line is stamped with the receive
    * time of the chunk that COMPLETED it (bore its newline), the
    * closest streaming analogue of the reference's on-receipt
    * processing time (tron.py:382-454 parses inside the data callback).
    * Identical ordering/gap/eviction semantics to [[reassembleLines]]:
    * seq-ordered replies across batches, `maxPending` gap escape with
    * full-line discard, idle eviction dropping the carried partial.
    * Kept as a sibling rather than a generalization so the q52 oracle's
    * state encoding ([[LineBuffer]]) stays untouched. */
  def reassembleTsLines(chunks: Dataset[TsChunk], firstSeq: Long = 0L,
      maxPending: Int = 1024, idleTimeoutMs: Long = 0L): Dataset[LineTsOut] = {
    implicit val outEnc = Encoders.product[LineTsOut]
    implicit val stateEnc = Encoders.product[TsLineBuffer]
    implicit val keyEnc = Encoders.STRING
    chunks.groupByKey(_.conn)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(idleTimeoutMs)) {
        (conn: String, rows: Iterator[TsChunk], state: GroupState[TsLineBuffer]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // same in-order fast path as [[reassembleLines]] (see the
            // comment there)
            val batch = rows.toArray
            java.util.Arrays.sort(batch, Ordering.by((c: TsChunk) => c.seq))
            val st = state.getOption.getOrElse(
              TsLineBuffer(firstSeq, "", Map.empty, dropHead = false))
            var pending = st.pending
            var nextSeq = st.nextSeq
            var partial = st.partial
            var dropHead = st.dropHead
            val out = scala.collection.mutable.ArrayBuffer[LineTsOut]()
            def emit(data: String, ts: Timestamp): Unit = {
              val buf = partial + data
              val parts = buf.split("\n", -1)
              parts.dropRight(1).foreach { l =>
                if (dropHead) dropHead = false
                else out += LineTsOut(conn, l, ts)
              }
              partial = parts.last
              nextSeq += 1
            }
            def drain(): Unit = while (pending.contains(nextSeq)) {
              val (data, ts) = pending(nextSeq)
              pending -= nextSeq
              emit(data, ts)
            }
            batch.foreach { c =>
              if (c.seq == nextSeq) { emit(c.data, c.ts); if (pending.nonEmpty) drain() }
              else if (c.seq > nextSeq) pending += (c.seq -> ((c.data, c.ts)))
            }
            drain()
            while (pending.size > maxPending) {
              nextSeq = pending.keys.min
              partial = ""
              dropHead = true
              drain()
            }
            state.update(TsLineBuffer(nextSeq, partial, pending, dropHead))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }

  final case class TsLineBuffer(nextSeq: Long, partial: String,
      pending: Map[Long, (String, Timestamp)], dropHead: Boolean)

  /** Per-series EWMA with carry-over across micro-batches.
    * `alpha` is the smoothing factor; emits one row per input point with
    * the running EWMA, the count, and the gap to the previous point.
    * Batches are processed in event-time order within each group.
    *
    * With `idleTimeoutMs > 0`, a series idle that long is evicted; if it
    * later resumes, its EWMA restarts from the first new point (n=1,
    * gap=0) — the restart is observable, which is the point: a series
    * silent past the timeout is a NEW series for smoothing purposes. */
  def ewma(points: Dataset[SeriesPoint], alpha: Double,
      idleTimeoutMs: Long = 0L): Dataset[EwmaOut] = {
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val keyEnc = Encoders.STRING
    points.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf(idleTimeoutMs)) {
        (series: String, rows: Iterator[SeriesPoint], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(EwmaState(Double.NaN, 0L, Long.MinValue))
            // total per-batch order (ts is ms-truncated by getTime, so a
            // same-millisecond pair needs the value tie-break): without
            // it the recurrence's result depends on shuffle arrival
            // order and no oracle can replay it
            val out = rows.toSeq.sortBy(p => (p.ts.getTime, p.value)).map { p =>
              val gap = if (st.lastTs == Long.MinValue) 0L else p.ts.getTime - st.lastTs
              val e = if (st.n == 0) p.value else alpha * p.value + (1 - alpha) * st.ewma
              st = EwmaState(e, st.n + 1, p.ts.getTime)
              EwmaOut(series, p.ts, p.value, e, st.n, gap)
            }
            state.update(st)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }
}
