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
    val small = Mqtt.Publish("t/x", """{"a":1}""".getBytes("UTF-8"))
    roundTrip(small) match {
      case Mqtt.Publish(t, p) =>
        assert(t == "t/x" && new String(p, "UTF-8") == """{"a":1}""")
      case other => fail(s"got $other")
    }
  }

  test("remaining-length varint: multi-byte lengths survive the wire") {
    // 300-byte payload → remaining length 300 + topic → 2-byte varint;
    // 20000 → 3-byte varint. Both must decode to the exact payload.
    for (n <- Seq(300, 20000)) {
      val payload = Array.fill[Byte](n)(((n % 251) + 1).toByte)
      roundTrip(Mqtt.Publish("topic/varint", payload)) match {
        case Mqtt.Publish(t, p) =>
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
