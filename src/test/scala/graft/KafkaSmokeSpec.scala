package graft

import java.nio.file.Files

import graft.pipeline.Ingest
import graft.streaming.{JsonGateway, KafkaWire}
import org.apache.spark.sql.functions._

/** Live-broker smoke for the config-gated Kafka branch (S2/S3): runs
  * the producer → REAL broker → consumer round-trip when
  * `SPARK_GRAFT_KAFKA=host:port` names a reachable broker AND the
  * spark-sql-kafka connector jar is on the classpath; CANCELS (not
  * fails) otherwise. The sandbox has neither, so the replay-parity
  * specs (KafkaWireSpec, E2EPipelineSpec) carry the wire-format proof
  * there — this spec exists so the day a broker is available, the
  * `format("kafka")` branch is executable with zero new code:
  *
  *   SPARK_GRAFT_KAFKA=localhost:9092 sbt "testOnly graft.KafkaSmokeSpec"
  */
class KafkaSmokeSpec extends SparkSpec {

  private val brokerEnv = sys.env.get("SPARK_GRAFT_KAFKA")

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  test("producer → live broker → consumer: wire parity with the batch DAG (env-gated)") {
    assume(brokerEnv.isDefined,
      "SPARK_GRAFT_KAFKA not set — no live broker; replay-parity specs cover the wire format")
    assume(connectorPresent,
      "spark-sql-kafka connector jar not on the classpath")
    val bootstrap = brokerEnv.get
    // fresh topic per run: broker auto-creation (or pre-created retention
    // topics) keeps runs independent
    val topic = s"graft_smoke_${System.currentTimeMillis()}"
    val jsonDir = Files.createTempDirectory("ks_json").toString + "/lines"
    val ckpt = Files.createTempDirectory("ks_ckpt").toString
    val now = lit("2024-01-01 00:02:00").cast("timestamp_ntz")

    val raw = Ingest.generateRaw(spark, 2, 10)
    raw.toJSON.coalesce(1).write.text(jsonDir)

    // S2: the exact produce path (keyed Confluent-framed Avro) into Kafka
    val gateway = JsonGateway.parse(spark.readStream.text(jsonDir))
    val (valid, _) = Ingest.ingest(spark, gateway, now)
    val qProd = KafkaWire.writeRecordStream(
      KafkaWire.toKafkaRecords(valid),
      KafkaWire.Transport("kafka", bootstrap = bootstrap, topic = topic), ckpt)
    try { qProd.processAllAvailable() } finally qProd.stop()

    // S3: the exact consume path (earliest offsets → frame strip → Avro
    // decode) out of the same topic
    val decoded = KafkaWire.fromKafkaRecords(
      KafkaWire.readRecordStream(spark,
        KafkaWire.Transport("kafka", bootstrap = bootstrap, topic = topic)))
    val qCons = decoded.writeStream.format("memory")
      .queryName("kafka_smoke").outputMode("append").start()
    try { qCons.processAllAvailable() } finally qCons.stop()

    val got = spark.table("kafka_smoke")
    val (batchValid, _) = Ingest.ingest(spark, raw, now)
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .select(col("device_id"), col("ts"), col("value"), col("device_type"))
      .collect().map(_.toString).sorted.toSeq
    assert(proj(got).nonEmpty)
    assert(proj(got) == proj(batchValid))
    // per-device ordering contract: the record key IS the device id
    val keys = got.select(col("key_device_id") === col("device_id"))
      .collect().map(_.getBoolean(0))
    assert(keys.nonEmpty && keys.forall(identity))
  }
}
