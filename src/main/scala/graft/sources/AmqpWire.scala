package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{InetSocketAddress, Socket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8

/** S11 live wire — a minimal AMQP 0-9-1 client for the reference's
  * RabbitMQ sources (`cerebro/sources/AMQP.py:85-216`, which delegates
  * the wire to clu's `AMQPClient`: a topic-exchange consumer of actor
  * reply messages plus periodic command publishes). Protocol per the
  * public AMQP 0-9-1 specification (amqp.org / RabbitMQ's published
  * spec): frames `type, channel, size, payload, 0xCE`; the connection
  * handshake (start/start-ok with PLAIN auth, tune/tune-ok, open),
  * channel open, topic exchange declare, server-named exclusive queue
  * bind, no-ack consume, and basic.publish for commands.
  *
  * Scope: one connection, one channel, one consumer — the reference's
  * shape exactly (one `AMQPClient` per source). Heartbeats are
  * negotiated OFF (tune-ok heartbeat=0) so the single daemon thread
  * owns the whole conversation; incoming heartbeat frames are ignored
  * if a broker sends them anyway. Any wire error closes the socket and
  * rethrows — [[AmqpPushSource]]'s thread applies [[Backoff]] and
  * reconnects, the reference's connection-retry isolation.
  */
object AmqpWire {

  /** A received message: the routing key it was published under and its
    * UTF-8 body. */
  final case class Delivery(routingKey: String, body: String)

  final class AmqpConnection(host: String, port: Int, user: String,
      password: String, vhost: String, timeoutMs: Int,
      connectTimeoutMs: Int) extends AutoCloseable {

    private var socket: Socket = null
    private var in: DataInputStream = null
    private var out: DataOutputStream = null

    // ---- value codecs (big-endian, per spec) --------------------------

    private def shortStr(s: String): Array[Byte] = {
      val b = s.getBytes(UTF_8)
      require(b.length < 256, s"short string too long: ${b.length}")
      b.length.toByte +: b
    }
    private def longStr(b: Array[Byte]): Array[Byte] = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(b.length).array()
      len ++ b
    }
    private val emptyTable: Array[Byte] = Array(0, 0, 0, 0)

    private final class Reader(payload: Array[Byte]) {
      private var pos = 0
      def octet(): Int = { val v = payload(pos) & 0xff; pos += 1; v }
      def short(): Int = (octet() << 8) | octet()
      def long(): Long = (0 until 4).foldLeft(0L)((a, _) => (a << 8) | octet())
      def longlong(): Long = (0 until 8).foldLeft(0L)((a, _) => (a << 8) | octet())
      def shortString(): String = {
        val n = octet()
        val s = new String(payload, pos, n, UTF_8); pos += n; s
      }
    }

    // ---- framing -------------------------------------------------------

    private def writeFrame(frameType: Int, channel: Int, payload: Array[Byte]): Unit = {
      out.writeByte(frameType)
      out.writeShort(channel)
      out.writeInt(payload.length)
      out.write(payload)
      out.writeByte(0xce)
      out.flush()
    }

    private def method(classId: Int, methodId: Int, args: Array[Byte]*): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(classId >> 8); b.write(classId & 0xff)
      b.write(methodId >> 8); b.write(methodId & 0xff)
      args.foreach(b.write)
      b.toByteArray
    }

    /** (frameType, channel, payload); validates the 0xCE frame end. */
    private def readFrame(): (Int, Int, Array[Byte]) = {
      val t = in.readUnsignedByte()
      val ch = in.readUnsignedShort()
      val size = in.readInt()
      if (size < 0 || size > (1 << 24))
        throw new IOException(s"$host:$port insane frame size $size")
      val payload = new Array[Byte](size)
      in.readFully(payload)
      if (in.readUnsignedByte() != 0xce)
        throw new IOException(s"$host:$port missing frame-end octet")
      (t, ch, payload)
    }

    /** Next METHOD frame, heartbeats skipped; connection/channel close
      * frames throw with the broker's reply text. */
    private def readMethod(): (Int, Int, Reader) = {
      while (true) {
        val (t, _, payload) = readFrame()
        if (t == 1) {
          val r = new Reader(payload)
          val cls = r.short(); val mth = r.short()
          if ((cls == 10 && mth == 50) || (cls == 20 && mth == 40)) {
            val code = r.short(); val text = r.shortString()
            throw new IOException(s"$host:$port broker closed: $code $text")
          }
          return (cls, mth, r)
        }
        // heartbeat (8) or unexpected content frame between methods: skip
      }
      throw new IllegalStateException("unreachable")
    }

    private def expect(classId: Int, methodId: Int): Reader = {
      val (c, m, r) = readMethod()
      if (c != classId || m != methodId)
        throw new IOException(s"$host:$port expected $classId.$methodId, got $c.$m")
      r
    }

    // ---- conversation ---------------------------------------------------

    /** Full handshake through channel.open; idempotent per connection. */
    def connect(): Unit = {
      if (socket != null && !socket.isClosed) return
      val s = new Socket()
      s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      s.setSoTimeout(timeoutMs)
      socket = s
      in = new DataInputStream(s.getInputStream)
      out = new DataOutputStream(s.getOutputStream)
      try {
        out.write("AMQP".getBytes(UTF_8)); out.write(Array[Byte](0, 0, 9, 1)); out.flush()
        expect(10, 10) // connection.start — server properties not needed
        val plain = longStr(("\u0000" + user + "\u0000" + password).getBytes(UTF_8))
        writeFrame(1, 0, method(10, 11, // start-ok
          emptyTable, shortStr("PLAIN"), plain, shortStr("en_US")))
        val tune = expect(10, 30)
        val channelMax = tune.short(); val frameMax = tune.long()
        writeFrame(1, 0, method(10, 31, // tune-ok: heartbeat 0 = disabled
          Array((channelMax >> 8).toByte, channelMax.toByte),
          java.nio.ByteBuffer.allocate(4).putInt(
            math.min(if (frameMax == 0) 131072L else frameMax, 131072L).toInt).array(),
          Array[Byte](0, 0)))
        writeFrame(1, 0, method(10, 40, // connection.open
          shortStr(vhost), shortStr(""), Array[Byte](0)))
        expect(10, 41)
        writeFrame(1, 1, method(20, 10, shortStr(""))) // channel.open (ch 1)
        expect(20, 11)
      } catch { case e: IOException => close(); throw e }
    }

    /** Declare the topic exchange, a server-named exclusive queue bound
      * to it under `bindingKey`, and start a no-ack consumer. Returns
      * the broker-assigned queue name. */
    def consumeTopic(exchange: String, bindingKey: String): String =
      try {
        writeFrame(1, 1, method(40, 10, // exchange.declare type=topic
          Array[Byte](0, 0), shortStr(exchange), shortStr("topic"),
          Array[Byte](0), emptyTable))
        expect(40, 11)
        writeFrame(1, 1, method(50, 10, // queue.declare: exclusive+auto-delete
          Array[Byte](0, 0), shortStr(""), Array[Byte]((4 | 8).toByte), emptyTable))
        val q = expect(50, 11).shortString()
        writeFrame(1, 1, method(50, 20, // queue.bind
          Array[Byte](0, 0), shortStr(q), shortStr(exchange),
          shortStr(bindingKey), Array[Byte](0), emptyTable))
        expect(50, 21)
        writeFrame(1, 1, method(60, 20, // basic.consume no-ack
          Array[Byte](0, 0), shortStr(q), shortStr(""), Array[Byte](2), emptyTable))
        expect(60, 21)
        q
      } catch { case e: IOException => close(); throw e }

    /** Block up to the socket timeout for one delivery; `None` when the
      * wait idles out (the caller's slot for periodic command sends).
      * Reassembles multi-frame bodies up to the declared body size. */
    def nextDelivery(): Option[Delivery] =
      try {
        val (cls, mth, r) = try readMethod() catch {
          case _: SocketTimeoutException => return None
        }
        if (cls != 60 || mth != 60)
          throw new IOException(s"$host:$port unexpected method $cls.$mth while consuming")
        r.shortString() // consumer tag
        r.longlong() // delivery tag (no-ack: nothing to ack)
        r.octet() // redelivered
        r.shortString() // exchange
        val routingKey = r.shortString()
        val (ht, _, header) = readFrame()
        if (ht != 2) throw new IOException(s"$host:$port expected content header, got type $ht")
        val hr = new Reader(header)
        hr.short(); hr.short() // class id, weight
        val bodySize = hr.longlong()
        val body = new ByteArrayOutputStream(bodySize.toInt)
        while (body.size() < bodySize) {
          val (bt, _, chunk) = readFrame()
          if (bt != 3) throw new IOException(s"$host:$port expected body frame, got type $bt")
          body.write(chunk)
        }
        Some(Delivery(routingKey, new String(body.toByteArray, UTF_8)))
      } catch { case e: IOException => close(); throw e }

    /** basic.publish `body` to `exchange` under `routingKey` (no
      * properties, single body frame) — the command-send half
      * (AMQP.py:182-190 `schedule_command`). */
    def publish(exchange: String, routingKey: String, body: String): Unit =
      try {
        writeFrame(1, 1, method(60, 40,
          Array[Byte](0, 0), shortStr(exchange), shortStr(routingKey), Array[Byte](0)))
        val b = body.getBytes(UTF_8)
        val header = new ByteArrayOutputStream()
        val h = new DataOutputStream(header)
        h.writeShort(60); h.writeShort(0); h.writeLong(b.length.toLong); h.writeShort(0)
        writeFrame(2, 1, header.toByteArray)
        writeFrame(3, 1, b)
      } catch { case e: IOException => close(); throw e }

    def close(): Unit = {
      if (socket != null) {
        try socket.close() catch { case _: IOException => () }
        socket = null; in = null; out = null
      }
    }

    def isConnected: Boolean = socket != null && !socket.isClosed
  }
}
