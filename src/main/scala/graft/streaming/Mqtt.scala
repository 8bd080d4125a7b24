package graft.streaming

import java.io.{Closeable, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1's wire transport, for real: a minimal MQTT 3.1.1 client — pure
  * JVM sockets, no client library (none exists on this classpath) —
  * speaking the public OASIS 3.1.1 frame protocol:
  * CONNECT/CONNACK → SUBSCRIBE/SUBACK → a stream of PUBLISH frames at
  * QoS 0 or 1 (inbound QoS-1 deliveries are PUBACK'd after processing,
  * at-least-once), with client-driven PINGREQ keepalive and
  * DISCONNECT. The publisher side mirrors the reference gateway's
  * QoS-1 contract (esp32/ruuvitag_gateway/main/main.c:462 publishes
  * QoS 1): packet-id management, PUBACK await, DUP retransmit on
  * timeout. (Reference subscriber behavior: the gateway adapter
  * subscribes to one topic and treats every PUBLISH payload as one
  * JSON gateway message —
  * /root/reference/src/data_receiver/ruuvitag_adapter.py:96-160.)
  *
  * Ingest composition: received payloads are SPOOLED — each batch of
  * messages becomes one atomically-renamed file in a spool directory
  * that Spark's file stream source tails (`readMqttStream` =
  * spool + `JsonGateway.parse` over `readStream.text`). The codec and
  * transport live on the driver edge; everything after the spool is
  * the identical schema-checked ingest DAG the socket/file transports
  * feed, so transport remains config-gated and orthogonal to parsing.
  * The spool worker survives broker restarts: a dropped connection is
  * recorded on the handle, then reconnected with a fresh
  * CONNECT + SUBSCRIBE (resubscribe-on-reconnect — clean-session
  * brokers forget subscriptions), so a broker bounce costs at most the
  * in-flight QoS-0 frames, never the subscription.
  *
  * Scale note: one MQTT client is a single TCP subscription — the
  * production-shape fan-in is many gateways → a broker bridge →
  * Kafka (S2/S3), which is why SURVEY §2.1 names Kafka the canonical
  * ingest. This client closes the LAST transport gap: the engine can
  * sit directly on a broker with no external dependency.
  */
object Mqtt {

  private val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  // ---- frame model (3.1.1 control packet types) ----
  sealed trait Frame
  final case class Connect(clientId: String, keepAliveSec: Int = 60) extends Frame
  final case class ConnAck(sessionPresent: Boolean, returnCode: Int) extends Frame
  final case class Subscribe(packetId: Int, topic: String, qos: Int) extends Frame
  final case class SubAck(packetId: Int, grantedQos: Int) extends Frame
  final case class Publish(topic: String, payload: Array[Byte], qos: Int = 0,
      packetId: Int = 0, dup: Boolean = false) extends Frame
  final case class PubAck(packetId: Int) extends Frame
  case object PingReq extends Frame
  case object PingResp extends Frame
  case object Disconnect extends Frame

  // ---- primitive encoders (2-byte big-endian lengths, UTF-8 strings,
  // and the 7-bits-per-byte continuation varint for Remaining Length) ----
  private def utf(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length < 65536, "MQTT string too long")
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }

  private def varint(n0: Int): Array[Byte] = {
    require(n0 >= 0 && n0 <= 268435455, s"remaining length out of range: $n0")
    var n = n0
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var continue = true
    while (continue) {
      val digit = n % 128
      n /= 128
      out += (if (n > 0) (digit | 0x80).toByte else digit.toByte)
      continue = n > 0
    }
    out.toArray
  }

  private def readVarint(in: DataInputStream): Int = {
    var multiplier = 1
    var value = 0
    var digit = 0
    do {
      digit = in.readUnsignedByte()
      value += (digit & 0x7f) * multiplier
      require(multiplier <= 128 * 128 * 128, "malformed remaining length")
      multiplier *= 128
    } while ((digit & 0x80) != 0)
    value
  }

  private def readUtf(in: DataInputStream): String = {
    val len = in.readUnsignedShort()
    val b = new Array[Byte](len)
    in.readFully(b)
    new String(b, UTF_8)
  }

  private def pid2(pid: Int): Array[Byte] =
    Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte)

  /** Encode one frame to wire bytes (fixed header + varint remaining
    * length + variable header/payload).
    */
  def encode(f: Frame): Array[Byte] = f match {
    case Connect(clientId, keepAlive) =>
      // protocol name "MQTT", level 4 (= 3.1.1), clean-session flag,
      // keepalive; payload = client id
      val body = utf("MQTT") ++ Array[Byte](4, 0x02,
        (keepAlive >> 8).toByte, (keepAlive & 0xff).toByte) ++ utf(clientId)
      Array[Byte](0x10) ++ varint(body.length) ++ body
    case ConnAck(sp, rc) =>
      Array[Byte](0x20, 2, if (sp) 1 else 0, rc.toByte)
    case Subscribe(pid, topic, qos) =>
      // fixed-header flags 0x2 are MANDATORY for SUBSCRIBE in 3.1.1
      val body = pid2(pid) ++ utf(topic) ++ Array[Byte](qos.toByte)
      Array[Byte](0x82.toByte) ++ varint(body.length) ++ body
    case SubAck(pid, granted) =>
      Array[Byte](0x90.toByte, 3) ++ pid2(pid) ++ Array[Byte](granted.toByte)
    case Publish(topic, payload, qos, pid, dup) =>
      require(qos >= 0 && qos <= 1, s"unsupported PUBLISH qos: $qos")
      // QoS 1 carries a packet id in the variable header; DUP marks a
      // retransmission (3.1.1 §3.3.1)
      val flags = (if (dup) 0x08 else 0) | (qos << 1)
      val body = utf(topic) ++
        (if (qos == 1) pid2(pid) else Array.empty[Byte]) ++ payload
      Array[Byte]((0x30 | flags).toByte) ++ varint(body.length) ++ body
    case PubAck(pid) => Array[Byte](0x40, 2) ++ pid2(pid)
    case PingReq    => Array[Byte](0xc0.toByte, 0)
    case PingResp   => Array[Byte](0xd0.toByte, 0)
    case Disconnect => Array[Byte](0xe0.toByte, 0)
  }

  /** Decode the next frame off the stream (blocking). Throws
    * EOFException at orderly stream end and IllegalArgumentException on
    * protocol violations — a malformed broker is LOUD, never silently
    * skipped.
    */
  def decode(in: DataInputStream): Frame = {
    val h = in.readUnsignedByte()
    val remaining = readVarint(in)
    val body = new Array[Byte](remaining)
    in.readFully(body)
    val bin = new DataInputStream(new java.io.ByteArrayInputStream(body))
    (h >> 4) match {
      case 1 =>
        val proto = readUtf(bin)
        require(proto == "MQTT", s"unsupported protocol name: $proto")
        val level = bin.readUnsignedByte()
        require(level == 4, s"unsupported protocol level: $level")
        bin.readUnsignedByte() // connect flags (clean session assumed)
        val keepAlive = bin.readUnsignedShort()
        Connect(readUtf(bin), keepAlive)
      case 2 =>
        val sp = bin.readUnsignedByte() == 1
        ConnAck(sp, bin.readUnsignedByte())
      case 3 =>
        val qos = (h >> 1) & 0x03
        require(qos <= 1, "QoS 2 PUBLISH is not supported")
        val dup = (h & 0x08) != 0
        // track the bytes actually consumed off the body (NOT a
        // re-encode of the decoded topic string — invalid UTF-8 decodes
        // to replacement chars whose re-encoded length differs, which
        // would shift the payload boundary)
        val tlen = bin.readUnsignedShort()
        val tb = new Array[Byte](tlen)
        bin.readFully(tb)
        val pid = if (qos == 1) bin.readUnsignedShort() else 0
        val payload =
          new Array[Byte](remaining - 2 - tlen - (if (qos == 1) 2 else 0))
        bin.readFully(payload)
        Publish(new String(tb, UTF_8), payload, qos, pid, dup)
      case 4 =>
        PubAck(bin.readUnsignedShort())
      case 8 =>
        require((h & 0x0f) == 2, "SUBSCRIBE fixed-header flags must be 0x2")
        val pid = bin.readUnsignedShort()
        val topic = readUtf(bin)
        Subscribe(pid, topic, bin.readUnsignedByte())
      case 9 =>
        val pid = bin.readUnsignedShort()
        SubAck(pid, bin.readUnsignedByte())
      case 12 => PingReq
      case 13 => PingResp
      case 14 => Disconnect
      case t  => throw new IllegalArgumentException(s"unsupported packet type: $t")
    }
  }

  /** Blocking MQTT 3.1.1 subscriber: CONNECT → await CONNACK(0) →
    * SUBSCRIBE (QoS 1 by default, granted-QoS decided by the broker) →
    * await SUBACK, then hand every PUBLISH payload to `onMessage`
    * until closed. Inbound QoS-1 deliveries are PUBACK'd AFTER
    * `onMessage` returns (process-then-ack: a crash between loses
    * nothing — the broker redelivers). A daemon timer sends PINGREQ
    * every keepAlive/2 while connected — per 3.1.1 the CLIENT must
    * ping within 1.5× keepalive or a real broker drops the quiet-topic
    * session; peer PINGREQs are still answered.
    */
  final class Client(host: String, port: Int, topic: String,
      clientId: String = "graft-ingest", subQos: Int = 1,
      keepAliveSec: Int = 30) extends Closeable {
    private val socket = new Socket(host, port)
    private val out = new DataOutputStream(socket.getOutputStream)
    private val in = new DataInputStream(socket.getInputStream)
    private val closed = new AtomicBoolean(false)
    private val writeLock = new Object

    private def send(f: Frame): Unit = writeLock.synchronized {
      out.write(encode(f)); out.flush()
    }

    // handshake: connect + subscribe, both acknowledged synchronously
    send(Connect(clientId, keepAliveSec))
    decode(in) match {
      case ConnAck(_, 0) => ()
      case ConnAck(_, rc) =>
        throw new IllegalStateException(s"broker refused connection: rc=$rc")
      case other => throw new IllegalStateException(s"expected CONNACK, got $other")
    }
    send(Subscribe(1, topic, subQos))
    decode(in) match {
      case SubAck(1, q) if q <= 2 => ()
      case other => throw new IllegalStateException(s"expected SUBACK, got $other")
    }

    // client-driven keepalive: PINGREQ at half the advertised interval
    private val pinger = new Thread(() => {
      val intervalMs = math.max(1, keepAliveSec) * 500L
      try {
        while (!closed.get) {
          Thread.sleep(intervalMs)
          if (!closed.get) send(PingReq)
        }
      } catch { case _: Exception => () } // socket gone → reader surfaces it
    }, "mqtt-keepalive")
    pinger.setDaemon(true)
    pinger.start()

    /** Consume PUBLISH frames until the connection closes. */
    def foreachMessage(onMessage: (String, Array[Byte]) => Unit): Unit =
      try {
        var running = true
        while (running && !closed.get) {
          decode(in) match {
            case Publish(t, payload, qos, pid, _) =>
              onMessage(t, payload)
              if (qos == 1) send(PubAck(pid)) // at-least-once: ack after processing
            case PingReq             => send(PingResp)
            case Disconnect          => running = false
            case PingResp            => ()
            case PubAck(_)           => () // subscriber publishes nothing at QoS 1
            case other =>
              throw new IllegalStateException(s"unexpected frame: $other")
          }
        }
      } catch {
        case _: EOFException if closed.get => () // orderly local close
        case _: java.net.SocketException if closed.get => ()
      }

    override def close(): Unit = {
      if (closed.compareAndSet(false, true)) {
        try { send(Disconnect) } catch { case _: Exception => () }
        socket.close()
      }
    }
  }

  /** QoS-1 publisher — the reference GATEWAY's role (main.c:462
    * publishes QoS 1 with retry): per-message packet ids (1..65535,
    * wrapping), synchronous PUBACK await under a socket read timeout,
    * DUP-flagged retransmit on timeout, bounded retries. QoS-0 publish
    * is fire-and-forget. Single-threaded by design: the publish call
    * owns the socket until its PUBACK lands, which is exactly the
    * reference gateway's blocking publish loop.
    */
  final class Publisher(host: String, port: Int,
      clientId: String = "graft-pub", ackTimeoutMs: Int = 2000,
      maxRetries: Int = 3) extends Closeable {
    private val socket = new Socket(host, port)
    socket.setSoTimeout(ackTimeoutMs)
    private val out = new DataOutputStream(socket.getOutputStream)
    private val in = new DataInputStream(socket.getInputStream)
    private val closed = new AtomicBoolean(false)
    private var nextPid = 1

    private def send(f: Frame): Unit = { out.write(encode(f)); out.flush() }

    send(Connect(clientId))
    decode(in) match {
      case ConnAck(_, 0) => ()
      case other => throw new IllegalStateException(s"expected CONNACK(0), got $other")
    }

    /** Fire-and-forget QoS-0 publish. */
    def publish(topic: String, payload: Array[Byte]): Unit =
      send(Publish(topic, payload))

    /** QoS-1 publish: returns the number of transmissions it took
      * (1 = acked first try; >1 = DUP retransmits happened). Throws if
      * the broker never acks within `maxRetries` retransmissions.
      */
    def publishQos1(topic: String, payload: Array[Byte]): Int = {
      val pid = nextPid
      nextPid = if (nextPid == 65535) 1 else nextPid + 1
      var attempts = 0
      var acked = false
      while (!acked) {
        attempts += 1
        send(Publish(topic, payload, qos = 1, packetId = pid, dup = attempts > 1))
        try {
          var waiting = true
          while (waiting) decode(in) match {
            case PubAck(p) if p == pid => acked = true; waiting = false
            case PubAck(_)             => () // stale ack from a superseded retry
            case PingResp              => ()
            case other =>
              throw new IllegalStateException(
                s"unexpected frame while awaiting PUBACK: $other")
          }
        } catch {
          case _: java.net.SocketTimeoutException =>
            if (attempts > maxRetries)
              throw new IllegalStateException(
                s"no PUBACK for pid=$pid after $attempts transmissions")
        }
      }
      attempts
    }

    override def close(): Unit = {
      if (closed.compareAndSet(false, true)) {
        try { send(Disconnect) } catch { case _: Exception => () }
        socket.close()
      }
    }
  }

  /** Spool worker handle: observable connection state (`connects`,
    * `failure`) plus `close()`. A lost connection is never silent —
    * it is logged, recorded here, and reconnected with a fresh
    * CONNECT + SUBSCRIBE after `reconnectDelayMs`.
    */
  final class SpoolHandle private[Mqtt] (host: String, port: Int,
      topic: String, dir: Path, reconnectDelayMs: Long) extends Closeable {
    private val closed = new AtomicBoolean(false)
    private val seq = new AtomicLong(0)
    private val connectCount = new AtomicInteger(0)
    @volatile private var current: Client = _
    @volatile private var lastFailure: Option[Throwable] = None

    private def spoolOne(payload: Array[Byte]): Unit = {
      val n = seq.getAndIncrement()
      val tmp = dir.resolve(s".msg-$n.tmp")
      Files.write(tmp, (new String(payload, UTF_8) + "\n").getBytes(UTF_8))
      // rename-into-place: the file source must never see a half write
      Files.move(tmp, dir.resolve(s"msg-$n.jsonl"),
        StandardCopyOption.ATOMIC_MOVE)
    }

    private val worker = new Thread(() => {
      while (!closed.get) {
        try {
          val client = new Client(host, port, topic)
          current = client
          connectCount.incrementAndGet()
          lastFailure = None
          // close() in finally: whether foreachMessage throws or
          // returns (broker DISCONNECT), the socket and its keepalive
          // pinger thread must be released BEFORE the reconnect sleep —
          // otherwise each reconnect cycle leaks a pinger until its
          // next send fails
          try client.foreachMessage((_, payload) => spoolOne(payload))
          finally {
            current = null
            try client.close() catch { case _: Exception => () }
          }
        } catch {
          case e: Exception if !closed.get =>
            lastFailure = Some(e)
            logger.warn(s"mqtt spool connection lost ($host:$port/$topic): $e" +
              s" — reconnecting in ${reconnectDelayMs}ms")
        }
        if (!closed.get)
          try Thread.sleep(reconnectDelayMs)
          catch { case _: InterruptedException => () }
      }
    }, "mqtt-spool")
    worker.setDaemon(true)
    worker.start()

    /** Completed CONNECT+SUBSCRIBE handshakes so far (≥2 ⇒ reconnected). */
    def connects: Int = connectCount.get
    /** Last connection failure, cleared on successful reconnect. */
    def failure: Option[Throwable] = lastFailure

    override def close(): Unit = {
      if (closed.compareAndSet(false, true)) {
        worker.interrupt()
        val c = current
        if (c != null) c.close()
      }
    }
  }

  /** Subscribe and SPOOL: a daemon worker writes each received payload
    * as one atomically-renamed line file under `spoolDir` — exactly the
    * layout Spark's file stream source tails — reconnecting (with a
    * fresh SUBSCRIBE) whenever the broker connection drops. Returns a
    * handle exposing connection state; close it to end the
    * subscription.
    */
  def startSpool(host: String, port: Int, topic: String, spoolDir: String,
      reconnectDelayMs: Long = 500): SpoolHandle = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    new SpoolHandle(host, port, topic, dir, reconnectDelayMs)
  }

  /** The full S1 source: MQTT subscription spooled into a directory,
    * streamed by Spark's file source, parsed by the SAME schema-checked
    * gateway parser the socket/file transports use. Close the returned
    * handle to end the subscription; the streaming query keeps reading
    * whatever was spooled.
    */
  def readMqttStream(spark: SparkSession, host: String, port: Int,
      topic: String, spoolDir: String): (DataFrame, SpoolHandle) = {
    val handle = startSpool(host, port, topic, spoolDir)
    (JsonGateway.parse(spark.readStream.text(spoolDir)), handle)
  }

  /** Loopback broker for specs: accepts subscribers/publishers ONE AT A
    * TIME (sequential sessions — a closed connection frees the slot for
    * the next CONNECT, which is how the reconnect path is exercised),
    * performs the CONNACK handshake, then serves a frame loop: SUBSCRIBE
    * → SUBACK, inbound PUBLISH recorded (QoS-1 PUBACK'd, optionally
    * dropping the FIRST ack to force a DUP retransmit), PUBACK/PINGREQ
    * from the peer recorded/answered. This is the test twin of a real
    * broker — enough protocol to prove the client's codec, handshake,
    * QoS-1 both ways, keepalive and reconnect against a live socket.
    */
  final class LoopbackBroker(dropFirstPuback: Boolean = false)
      extends Closeable {
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    val port: Int = server.getLocalPort
    private val serverClosed = new AtomicBoolean(false)
    @volatile private var client: Socket = _
    @volatile private var out: DataOutputStream = _
    @volatile private var subscribedTopic: String = _
    private val writeLock = new Object
    private val subscriptions = new java.util.concurrent.Semaphore(0)
    private val droppedOnce = new AtomicBoolean(false)

    /** Inbound PUBLISH frames: (topic, payload, qos, packetId, dup). */
    val received =
      new java.util.concurrent.LinkedBlockingQueue[(String, String, Int, Int, Boolean)]
    /** Inbound PUBACKs (a subscriber acking QoS-1 deliveries). */
    val pubacks = new java.util.concurrent.LinkedBlockingQueue[Integer]
    /** Inbound PINGREQs answered (client keepalive evidence). */
    val pingreqs = new AtomicInteger(0)

    private def sendLocked(f: Frame): Unit = writeLock.synchronized {
      out.write(encode(f)); out.flush()
    }

    private val acceptor = new Thread(() => {
      while (!serverClosed.get) {
        try {
          val sock = server.accept()
          client = sock
          val in = new DataInputStream(sock.getInputStream)
          out = new DataOutputStream(sock.getOutputStream)
          decode(in) match {
            case _: Connect => sendLocked(ConnAck(sessionPresent = false, 0))
            case other =>
              throw new IllegalStateException(s"expected CONNECT, got $other")
          }
          var running = true
          while (running && !serverClosed.get) {
            decode(in) match {
              case Subscribe(pid, topic, qos) =>
                subscribedTopic = topic
                sendLocked(SubAck(pid, qos))
                subscriptions.release()
              case Publish(t, payload, qos, pid, dup) =>
                received.put((t, new String(payload, UTF_8), qos, pid, dup))
                if (qos == 1) {
                  // optionally swallow the FIRST ack ever: the publisher
                  // must retransmit with DUP=1, which IS acked
                  if (!(dropFirstPuback && droppedOnce.compareAndSet(false, true)))
                    sendLocked(PubAck(pid))
                }
              case PubAck(pid) => pubacks.put(pid)
              case PingReq     => pingreqs.incrementAndGet(); sendLocked(PingResp)
              case PingResp    => ()
              case Disconnect  => running = false
              case other =>
                throw new IllegalStateException(s"broker got $other")
            }
          }
          sock.close()
        } catch { case _: Exception => () } // session over → accept the next
      }
    }, "loopback-broker")
    acceptor.setDaemon(true)
    acceptor.start()

    /** Blocks until the NEXT subscriber completes a handshake (each call
      * consumes one subscription — call again after `dropConnection` to
      * await the re-subscribe).
      */
    def awaitSubscriber(timeoutMs: Long = 10000): String = {
      require(subscriptions.tryAcquire(timeoutMs,
        java.util.concurrent.TimeUnit.MILLISECONDS),
        "no subscriber completed the MQTT handshake in time")
      subscribedTopic
    }

    def publish(topic: String, payload: String): Unit =
      sendLocked(Publish(topic, payload.getBytes(UTF_8)))

    /** Deliver a QoS-1 PUBLISH to the connected subscriber. */
    def publishQos1(topic: String, payload: String, pid: Int): Unit =
      sendLocked(Publish(topic, payload.getBytes(UTF_8), qos = 1, packetId = pid))

    def ping(): Unit = sendLocked(PingReq)

    /** Simulate a broker bounce: drop the live connection; the server
      * socket stays up, so a reconnecting client lands a new session.
      */
    def dropConnection(): Unit = {
      val c = client
      if (c != null) c.close()
    }

    override def close(): Unit = {
      serverClosed.set(true)
      dropConnection()
      server.close()
    }
  }
}
