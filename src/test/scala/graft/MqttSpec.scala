package graft

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.file.{Files, Paths}

import graft.pipeline.Ingest
import graft.streaming.Mqtt
import org.apache.spark.sql.functions._

/** S1 closure: the pure-JVM MQTT 3.1.1 client — frame codec
  * round-trips, live loopback-broker handshake, and the end-to-end
  * path broker → PUBLISH → spool → file stream → gateway parse →
  * ingest DAG.
  */
class MqttSpec extends SparkSpec {

  private def roundTrip(f: Mqtt.Frame): Mqtt.Frame =
    Mqtt.decode(new DataInputStream(new ByteArrayInputStream(Mqtt.encode(f))))

  test("frame codec round-trips every packet type") {
    assert(roundTrip(Mqtt.Connect("graft-client", 30)) ==
      Mqtt.Connect("graft-client", 30))
    assert(roundTrip(Mqtt.ConnAck(sessionPresent = false, 0)) ==
      Mqtt.ConnAck(sessionPresent = false, 0))
    assert(roundTrip(Mqtt.Subscribe(7, "sensors/ruuvitag", 0)) ==
      Mqtt.Subscribe(7, "sensors/ruuvitag", 0))
    assert(roundTrip(Mqtt.SubAck(7, 0)) == Mqtt.SubAck(7, 0))
    assert(roundTrip(Mqtt.PingReq) == Mqtt.PingReq)
    assert(roundTrip(Mqtt.PingResp) == Mqtt.PingResp)
    assert(roundTrip(Mqtt.Disconnect) == Mqtt.Disconnect)
    assert(roundTrip(Mqtt.PubAck(513)) == Mqtt.PubAck(513))
    val small = Mqtt.Publish("t/x", """{"a":1}""".getBytes("UTF-8"))
    roundTrip(small) match {
      case Mqtt.Publish(t, p, 0, _, false) =>
        assert(t == "t/x" && new String(p, "UTF-8") == """{"a":1}""")
      case other => fail(s"got $other")
    }
    // QoS-1 PUBLISH: qos flag, packet id and DUP all survive the wire
    roundTrip(Mqtt.Publish("t/q", "hi".getBytes("UTF-8"), qos = 1,
        packetId = 777, dup = true)) match {
      case Mqtt.Publish(t, p, 1, 777, true) =>
        assert(t == "t/q" && new String(p, "UTF-8") == "hi")
      case other => fail(s"got $other")
    }
  }

  test("remaining-length varint: multi-byte lengths survive the wire") {
    // 300-byte payload → remaining length 300 + topic → 2-byte varint;
    // 20000 → 3-byte varint. Both must decode to the exact payload.
    for (n <- Seq(300, 20000)) {
      val payload = Array.fill[Byte](n)(((n % 251) + 1).toByte)
      roundTrip(Mqtt.Publish("topic/varint", payload)) match {
        case Mqtt.Publish(t, p, _, _, _) =>
          assert(t == "topic/varint" && p.sameElements(payload), s"n=$n")
        case other => fail(s"got $other")
      }
    }
  }

  test("handshake against a live loopback broker; publish reaches the client") {
    val broker = new Mqtt.LoopbackBroker
    try {
      val got = new java.util.concurrent.LinkedBlockingQueue[(String, String)]
      val client = new Mqtt.Client("127.0.0.1", broker.port, "sensors/gw")
      val t = new Thread(() => client.foreachMessage((topic, payload) =>
        got.put(topic -> new String(payload, "UTF-8"))))
      t.setDaemon(true); t.start()
      try {
        assert(broker.awaitSubscriber() == "sensors/gw")
        broker.publish("sensors/gw", """{"device_id":"aa:bb"}""")
        broker.ping() // client must answer PINGRESP without dropping messages
        broker.publish("sensors/gw", """{"device_id":"cc:dd"}""")
        val m1 = got.poll(10, java.util.concurrent.TimeUnit.SECONDS)
        val m2 = got.poll(10, java.util.concurrent.TimeUnit.SECONDS)
        assert(m1 == ("sensors/gw" -> """{"device_id":"aa:bb"}"""))
        assert(m2 == ("sensors/gw" -> """{"device_id":"cc:dd"}"""))
      } finally client.close()
    } finally broker.close()
  }

  test("QoS-1 publish: dropped PUBACK forces exactly one DUP retransmit") {
    val broker = new Mqtt.LoopbackBroker(dropFirstPuback = true)
    try {
      val pub = new Mqtt.Publisher("127.0.0.1", broker.port, ackTimeoutMs = 300)
      try {
        // the broker swallows the first ack ever → transmission 2 is the
        // DUP retry, which IS acked
        val attempts = pub.publishQos1("sensors/gw", """{"q":1}""".getBytes("UTF-8"))
        assert(attempts == 2, s"expected one retransmit, took $attempts")
        val r1 = broker.received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        val r2 = broker.received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        assert(r1 != null && r2 != null)
        assert(r1._4 == r2._4, "retransmit must reuse the packet id")
        assert(!r1._5 && r2._5, "first transmission DUP=0, retry DUP=1")
        // with acks flowing again, the next publish lands first try and
        // takes a fresh packet id
        assert(pub.publishQos1("sensors/gw", "b".getBytes("UTF-8")) == 1)
        val r3 = broker.received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        assert(r3 != null && r3._4 != r1._4 && !r3._5)
      } finally pub.close()
    } finally broker.close()
  }

  test("QoS-1 delivery to the subscriber is processed THEN PUBACK'd") {
    val broker = new Mqtt.LoopbackBroker
    try {
      val got = new java.util.concurrent.LinkedBlockingQueue[String]
      val client = new Mqtt.Client("127.0.0.1", broker.port, "sensors/gw")
      val t = new Thread(() => client.foreachMessage((_, payload) =>
        got.put(new String(payload, "UTF-8"))))
      t.setDaemon(true); t.start()
      try {
        broker.awaitSubscriber()
        broker.publishQos1("sensors/gw", """{"device_id":"aa"}""", pid = 42)
        assert(got.poll(10, java.util.concurrent.TimeUnit.SECONDS) ==
          """{"device_id":"aa"}""")
        val ack = broker.pubacks.poll(10, java.util.concurrent.TimeUnit.SECONDS)
        assert(ack != null && ack.intValue == 42)
      } finally client.close()
    } finally broker.close()
  }

  test("client keepalive: PINGREQ arrives at the broker unprompted") {
    val broker = new Mqtt.LoopbackBroker
    try {
      // keepAliveSec=1 → the client must ping every ~500ms on its own
      val client = new Mqtt.Client("127.0.0.1", broker.port, "sensors/gw",
        keepAliveSec = 1)
      val t = new Thread(() => client.foreachMessage((_, _) => ()))
      t.setDaemon(true); t.start()
      try {
        broker.awaitSubscriber()
        val deadline = System.currentTimeMillis() + 5000
        while (broker.pingreqs.get == 0 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(broker.pingreqs.get >= 1,
          "client sent no PINGREQ within 5s at keepAlive=1s")
      } finally client.close()
    } finally broker.close()
  }

  test("spool survives a broker bounce: reconnect + resubscribe, no silent death") {
    val spool = Files.createTempDirectory("mqtt_reconnect").toString + "/lines"
    val broker = new Mqtt.LoopbackBroker
    try {
      val handle = Mqtt.startSpool("127.0.0.1", broker.port, "sensors/gw",
        spool, reconnectDelayMs = 100)
      try {
        broker.awaitSubscriber()
        broker.publish("sensors/gw", """{"n":1}""")
        def spooled(): Long = Files.list(Paths.get(spool))
          .filter(_.getFileName.toString.endsWith(".jsonl")).count()
        val d1 = System.currentTimeMillis() + 10000
        while (spooled() < 1 && System.currentTimeMillis() < d1) Thread.sleep(50)
        assert(spooled() == 1)
        // broker bounce: the live session dies; the worker must record
        // it and re-establish CONNECT + SUBSCRIBE on its own
        broker.dropConnection()
        assert(broker.awaitSubscriber(15000) == "sensors/gw")
        // the broker-side SUBACK precedes the client-side handshake
        // completing, so give the worker a beat to record the connect
        val dc = System.currentTimeMillis() + 5000
        while (handle.connects < 2 && System.currentTimeMillis() < dc)
          Thread.sleep(20)
        assert(handle.connects >= 2, "no reconnect happened")
        broker.publish("sensors/gw", """{"n":2}""")
        val d2 = System.currentTimeMillis() + 10000
        while (spooled() < 2 && System.currentTimeMillis() < d2) Thread.sleep(50)
        assert(spooled() == 2, "post-reconnect publish never reached the spool")
      } finally handle.close()
    } finally broker.close()
  }

  test("the reference adapter's full role: MQTT in → keyed Avro Kafka records out") {
    import graft.streaming.KafkaWire
    val spool = Files.createTempDirectory("mqtt_bridge").toString + "/lines"
    val recDir = Files.createTempDirectory("mqtt_records").toString + "/records"
    val ckpt = Files.createTempDirectory("mqtt_ckpt").toString
    val broker = new Mqtt.LoopbackBroker
    try {
      val (stream, handle) =
        Mqtt.readMqttStream(spark, "127.0.0.1", broker.port, "sensors/gw", spool)
      try {
        broker.awaitSubscriber()
        val raw = Ingest.generateRaw(spark, 2, 10)
        val lines = raw.toJSON.collect()
        lines.foreach(broker.publish("sensors/gw", _))
        val deadline = System.currentTimeMillis() + 15000
        while (Files.list(Paths.get(spool)).filter(_.getFileName.toString
            .endsWith(".jsonl")).count() < lines.length &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        // MQTT → ingest → keyed Confluent-framed Avro records (the
        // reference adapter's entire job), landed on the replay
        // transport the Kafka consumer parity tests drive
        val now = lit("2024-01-01 00:02:00").cast("timestamp_ntz")
        val (valid, _) = Ingest.ingest(spark, stream, now)
        val q = KafkaWire.writeRecordStream(KafkaWire.toKafkaRecords(valid),
          KafkaWire.Transport("parquet", topic = recDir), ckpt)
        q.processAllAvailable(); q.stop()
        // decode the wire records and compare against the batch twin
        val decoded = KafkaWire.fromKafkaRecords(spark.read.parquet(recDir))
        val (batchValid, _) = Ingest.ingest(spark, raw, now)
        def proj(df: org.apache.spark.sql.DataFrame) = df
          .select(col("device_id"), col("ts"), col("value"), col("device_type"))
          .collect().map(_.toString).sorted.toSeq
        assert(proj(decoded).nonEmpty)
        assert(proj(decoded) == proj(batchValid))
        // the record key IS the device id (per-device ordering at scale)
        val keys = decoded.select(col("key_device_id") === col("device_id"))
          .collect().map(_.getBoolean(0))
        assert(keys.nonEmpty && keys.forall(identity))
      } finally handle.close()
    } finally broker.close()
  }

  test("end to end: broker publish → spool → file stream → ingest DAG") {
    val spool = Files.createTempDirectory("mqtt_spool").toString + "/lines"
    val broker = new Mqtt.LoopbackBroker
    try {
      val (stream, handle) =
        Mqtt.readMqttStream(spark, "127.0.0.1", broker.port, "sensors/gw", spool)
      try {
        broker.awaitSubscriber()
        // publish real gateway payloads — the same frames the socket and
        // file transports carry
        val raw = Ingest.generateRaw(spark, 2, 10)
        val lines = raw.toJSON.collect()
        lines.foreach(broker.publish("sensors/gw", _))
        // wait for the spool thread to land every message file
        val deadline = System.currentTimeMillis() + 15000
        while (Files.list(Paths.get(spool)).filter(_.getFileName.toString
            .endsWith(".jsonl")).count() < lines.length &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(stream.isStreaming)
        val (valid, _) = Ingest.ingest(spark, stream,
          lit("2024-01-01 00:02:00").cast("timestamp_ntz"))
        val q = valid.writeStream.format("memory").queryName("mqtt_ingest")
          .outputMode("append").start()
        try {
          q.processAllAvailable()
          val got = spark.table("mqtt_ingest")
          val (batchValid, _) = Ingest.ingest(spark, raw,
            lit("2024-01-01 00:02:00").cast("timestamp_ntz"))
          assert(got.count() == batchValid.count())
          assert(got.count() > 0)
        } finally q.stop()
      } finally handle.close()
    } finally broker.close()
  }
}
