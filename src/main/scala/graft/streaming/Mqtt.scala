package graft.streaming

import java.io.{Closeable, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1's wire transport, for real: a minimal MQTT 3.1.1 client — pure
  * JVM sockets, no client library (none exists on this classpath) —
  * speaking the public OASIS 3.1.1 frame protocol:
  * CONNECT/CONNACK → SUBSCRIBE/SUBACK → a stream of QoS-0 PUBLISH
  * frames, with PINGREQ/PINGRESP keepalive and DISCONNECT. (Reference
  * behavior: the gateway adapter subscribes to one topic and treats
  * every PUBLISH payload as one JSON gateway message —
  * /root/reference/src/data_receiver/ruuvitag_adapter.py:96-160.)
  *
  * Ingest composition: received payloads are SPOOLED — each batch of
  * messages becomes one atomically-renamed file in a spool directory
  * that Spark's file stream source tails (`readMqttStream` =
  * spool + `JsonGateway.parse` over `readStream.text`). The codec and
  * transport live on the driver edge; everything after the spool is
  * the identical schema-checked ingest DAG the socket/file transports
  * feed, so transport remains config-gated and orthogonal to parsing.
  *
  * Scale note: one MQTT client is a single TCP subscription — the
  * production-shape fan-in is many gateways → a broker bridge →
  * Kafka (S2/S3), which is why SURVEY §2.1 names Kafka the canonical
  * ingest. This client closes the LAST transport gap: the engine can
  * sit directly on a broker with no external dependency.
  */
object Mqtt {

  // ---- frame model (3.1.1 control packet types) ----
  sealed trait Frame
  final case class Connect(clientId: String, keepAliveSec: Int = 60) extends Frame
  final case class ConnAck(sessionPresent: Boolean, returnCode: Int) extends Frame
  final case class Subscribe(packetId: Int, topic: String, qos: Int) extends Frame
  final case class SubAck(packetId: Int, grantedQos: Int) extends Frame
  final case class Publish(topic: String, payload: Array[Byte]) extends Frame
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
      val body = Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte) ++
        utf(topic) ++ Array[Byte](qos.toByte)
      Array[Byte](0x82.toByte) ++ varint(body.length) ++ body
    case SubAck(pid, granted) =>
      Array[Byte](0x90.toByte, 3, (pid >> 8).toByte, (pid & 0xff).toByte,
        granted.toByte)
    case Publish(topic, payload) =>
      // QoS 0: no packet id in the variable header
      val body = utf(topic) ++ payload
      Array[Byte](0x30) ++ varint(body.length) ++ body
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
        require((h & 0x06) == 0, "only QoS 0 PUBLISH is supported")
        val topic = readUtf(bin)
        val payload = new Array[Byte](remaining - (topic.getBytes(UTF_8).length + 2))
        bin.readFully(payload)
        Publish(topic, payload)
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
    * SUBSCRIBE → await SUBACK, then hand every PUBLISH payload to
    * `onMessage` until closed. PINGREQ from the peer is answered;
    * anything else unexpected is a protocol error.
    */
  final class Client(host: String, port: Int, topic: String,
      clientId: String = "graft-ingest") extends Closeable {
    private val socket = new Socket(host, port)
    private val out = new DataOutputStream(socket.getOutputStream)
    private val in = new DataInputStream(socket.getInputStream)
    private val closed = new AtomicBoolean(false)

    private def send(f: Frame): Unit = { out.write(encode(f)); out.flush() }

    // handshake: connect + subscribe, both acknowledged synchronously
    send(Connect(clientId))
    decode(in) match {
      case ConnAck(_, 0) => ()
      case ConnAck(_, rc) =>
        throw new IllegalStateException(s"broker refused connection: rc=$rc")
      case other => throw new IllegalStateException(s"expected CONNACK, got $other")
    }
    send(Subscribe(1, topic, 0))
    decode(in) match {
      case SubAck(1, q) if q <= 2 => ()
      case other => throw new IllegalStateException(s"expected SUBACK, got $other")
    }

    /** Consume PUBLISH frames until the connection closes. */
    def foreachMessage(onMessage: (String, Array[Byte]) => Unit): Unit =
      try {
        var running = true
        while (running && !closed.get) {
          decode(in) match {
            case Publish(t, payload) => onMessage(t, payload)
            case PingReq             => send(PingResp)
            case Disconnect          => running = false
            case PingResp            => ()
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

  /** Subscribe and SPOOL: a daemon thread writes each received payload
    * batch as one atomically-renamed line file under `spoolDir` —
    * exactly the layout Spark's file stream source tails. Returns a
    * handle that closes the subscription.
    */
  def startSpool(host: String, port: Int, topic: String, spoolDir: String)
      : Closeable = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    val seq = new AtomicLong(0)
    val client = new Client(host, port, topic)
    val t = new Thread(() =>
      client.foreachMessage { (_, payload) =>
        val n = seq.getAndIncrement()
        val tmp = dir.resolve(s".msg-$n.tmp")
        Files.write(tmp, (new String(payload, UTF_8) + "\n").getBytes(UTF_8))
        // rename-into-place: the file source must never see a half write
        Files.move(tmp, dir.resolve(s"msg-$n.jsonl"),
          StandardCopyOption.ATOMIC_MOVE)
      }, "mqtt-spool")
    t.setDaemon(true)
    t.start()
    client
  }

  /** The full S1 source: MQTT subscription spooled into a directory,
    * streamed by Spark's file source, parsed by the SAME schema-checked
    * gateway parser the socket/file transports use. Close the returned
    * handle to end the subscription; the streaming query keeps reading
    * whatever was spooled.
    */
  def readMqttStream(spark: SparkSession, host: String, port: Int,
      topic: String, spoolDir: String): (DataFrame, Closeable) = {
    val handle = startSpool(host, port, topic, spoolDir)
    (JsonGateway.parse(spark.readStream.text(spoolDir)), handle)
  }

  /** Loopback broker for specs: accepts ONE subscriber, performs the
    * CONNACK/SUBACK handshake, then relays whatever the test publishes.
    * This is the test twin of a real broker — enough protocol to prove
    * the client's codec and handshake against a live socket.
    */
  final class LoopbackBroker extends Closeable {
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    val port: Int = server.getLocalPort
    @volatile private var client: Socket = _
    @volatile private var out: DataOutputStream = _
    @volatile private var subscribedTopic: String = _
    private val ready = new java.util.concurrent.CountDownLatch(1)

    private val acceptor = new Thread(() => {
      try {
        client = server.accept()
        val in = new DataInputStream(client.getInputStream)
        out = new DataOutputStream(client.getOutputStream)
        decode(in) match {
          case _: Connect =>
            out.write(encode(ConnAck(sessionPresent = false, 0))); out.flush()
          case other => throw new IllegalStateException(s"expected CONNECT, got $other")
        }
        decode(in) match {
          case Subscribe(pid, topic, qos) =>
            subscribedTopic = topic
            out.write(encode(SubAck(pid, qos))); out.flush()
          case other => throw new IllegalStateException(s"expected SUBSCRIBE, got $other")
        }
        ready.countDown()
      } catch { case _: Exception => () }
    }, "loopback-broker")
    acceptor.setDaemon(true)
    acceptor.start()

    /** Blocks until a subscriber completed the handshake. */
    def awaitSubscriber(timeoutMs: Long = 10000): String = {
      require(ready.await(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS),
        "no subscriber completed the MQTT handshake in time")
      subscribedTopic
    }

    def publish(topic: String, payload: String): Unit = synchronized {
      out.write(encode(Publish(topic, payload.getBytes(UTF_8)))); out.flush()
    }

    def ping(): Unit = synchronized {
      out.write(encode(PingReq)); out.flush()
    }

    override def close(): Unit = {
      if (client != null) client.close()
      server.close()
    }
  }
}
