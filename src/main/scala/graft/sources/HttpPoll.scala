package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.{Duration, Instant, LocalDateTime, ZoneOffset}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Live HTTP poller for the incremental sources (S15/S16) — the
  * `java.net.http` half of the reference's LCO environment-API pattern
  * (cerebro/sources/lco.py:25-228 + tools.py `get_from_lco_api`): GET
  * `url?start_ts=<ISO seconds>` on an interval, parse the JSON-array
  * reply, and append the NEW rows to a single growing JSON-lines spool
  * file that [[IncrementalSource]] streams with row-level event-time
  * offsets.
  *
  * ==Resume semantics (lco.py:116-122 replicated)==
  * The next poll's `start_ts` is the last row's timestamp truncated to
  * WHOLE SECONDS (the reference sends `replace(microsecond=0).
  * isoformat()`), so the boundary second is re-fetched every time and
  * servers with inclusive `>=` semantics re-send the last row. The
  * poller filters `ts > lastTsMs` (millisecond-exact) before appending
  * — duplicates never reach the spool, preserving IncrementalSource's
  * monotonic-append contract. Rows inside a poll are sorted by ts
  * before the append for the same reason.
  *
  * Wire shape: `[{"ts": "2024-01-01T00:00:05.123", "measurement":
  * "seeing", "value": 0.82}, ...]` (ISO timestamps, UTC — the
  * reference API's row shape); spool shape: `{"ts": <epochMillis>,
  * "measurement": ..., "value": ...}` ([[IncrementalSource]]'s
  * contract). A `value`-less or malformed row is skipped with a stderr
  * note, never a poller death; failures (HTTP != 200, connect refused,
  * timeout) back off ×e like every other live source and the poller
  * retries from the SAME watermark — an outage loses nothing, it only
  * delays.
  *
  * Scale shape: one daemon thread, O(new rows) work per tick; the spool
  * file grows but [[SpoolTracker]] re-reads only on length change, so
  * driver cost per trigger stays metadata-only between polls. */
final class HttpIncrementalPoller(
    val name: String,
    spoolDir: String,
    url: String,
    startParam: String = "start_ts",
    intervalMs: Long = 60000L,
    backoff: Backoff = Backoff(),
    initialStartTs: Long = 0L,
    requestTimeoutMs: Long = 30000L) {

  private val running = new AtomicBoolean(false)
  private var thread: Thread = _
  @volatile private var _lastTsMs: Long = initialStartTs
  /** The poller's resume watermark (exposed for tests/monitoring). */
  def lastTsMs: Long = _lastTsMs
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(requestTimeoutMs)).build()

  private def spoolFile = Paths.get(spoolDir, s"$name.jsonl")

  /** ISO-8601 seconds (UTC, no zone suffix) — the reference's
    * `%Y-%m-%dT%H:%M:%S` request format (tools.py format_time). */
  private def isoSeconds(ms: Long): String =
    LocalDateTime.ofInstant(Instant.ofEpochMilli(ms), ZoneOffset.UTC)
      .withNano(0).toString.takeWhile(_ != '.') match {
        case s if s.count(_ == ':') == 1 => s + ":00" // LocalDateTime drops :00 seconds
        case s => s
      }

  /** One poll: GET, parse, filter ts > watermark, append, advance. */
  private[sources] def pollOnce(): Int = {
    val sep = if (url.contains("?")) "&" else "?"
    val uri = URI.create(s"$url$sep$startParam=${isoSeconds(_lastTsMs)}")
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofMillis(requestTimeoutMs)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"$name: HTTP ${resp.statusCode()} from $uri")
    val root = mapper.readTree(resp.body())
    if (!root.isArray)
      throw new java.io.IOException(s"$name: expected JSON array from $uri")
    val rows = root.elements().asScala.flatMap { node =>
      try {
        val ts = LocalDateTime.parse(node.get("ts").asText())
          .toInstant(ZoneOffset.UTC).toEpochMilli
        val m = node.get("measurement").asText()
        val v = node.get("value").asDouble()
        Some((ts, m, v))
      } catch {
        case e: Exception =>
          System.err.println(s"[graft-http-$name] skipping malformed row: $e")
          None
      }
    }.filter(_._1 > _lastTsMs).toSeq.sortBy(_._1)
    if (rows.nonEmpty) {
      val lines = rows.map { case (ts, m, v) =>
        val n = mapper.createObjectNode()
        n.put("ts", ts); n.put("measurement", m); n.put("value", v)
        mapper.writeValueAsString(n)
      }
      Files.write(spoolFile, (lines.mkString("\n") + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      _lastTsMs = rows.last._1
    }
    rows.size
  }

  def start(): Unit = {
    Files.createDirectories(Paths.get(spoolDir))
    running.set(true)
    thread = new Thread(() => {
      while (running.get()) {
        val sleepMs =
          try { pollOnce(); backoff.reset(); intervalMs }
          catch {
            case _: InterruptedException => running.set(false); 0L
            case e: Throwable =>
              System.err.println(s"[graft-http-$name] $e")
              backoff.nextDelayMs()
          }
        if (running.get()) {
          try Thread.sleep(sleepMs)
          catch { case _: InterruptedException => running.set(false) }
        }
      }
    }, s"graft-http-$name")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = {
    running.set(false)
    if (thread != null) {
      thread.interrupt()
      if (thread != Thread.currentThread())
        try thread.join(5000) catch { case _: InterruptedException => () }
    }
  }
}
