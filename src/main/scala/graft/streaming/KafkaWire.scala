package graft.streaming

import graft.serde.{AvroPipeline, AvroWire}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped transport for the ingest pipeline (producer.py:147-214,
  * consumer.py:172-309): records are (key = device_id as UTF-8 bytes —
  * Kafka's key-hash partitioner then guarantees per-device ordering,
  * producer.py:156-158; value = Confluent-framed Avro reading).
  *
  * The record projection (`toKafkaRecords`/`fromKafkaRecords`) is plain
  * binary-column work and is what the parity test exercises; the
  * `format("kafka")` reader/writer wiring is config-gated because the
  * sandbox has neither a broker nor the spark-sql-kafka connector jar —
  * on a real cluster the SAME projections bolt onto the connector's
  * (key, value) frame, which is the point: one DAG definition serves
  * MemoryStream tests, parquet backfills and the Kafka path.
  *
  * Scale: both directions are narrow per-row projections (no shuffle);
  * the key choice preserves the reference's per-device total order
  * through any number of partitions.
  */
object KafkaWire {

  /** Where the stream comes from / goes to. `kafka` requires the
    * connector jar on the classpath at runtime.
    */
  case class Transport(kind: String, // "kafka" | "memory" | "parquet"
      bootstrap: String = "localhost:9092", topic: String = "iot-sensor-readings")

  /** Ingest-readings DataFrame (Ingest.fanout/ingest schema) → sensor
    * struct in Avro schema field order. firmware_version /
    * maintenance_date have no source in the gateway payload → null
    * (their schema defaults); null map values are dropped (Avro map
    * values are non-null strings).
    */
  private def readingStruct() = struct(
    col("device_id"),
    col("device_type"),
    date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"),
    struct(col("value").as("member0"), lit(null).cast(IntegerType).as("member1"))
      .as("value"),
    col("unit"),
    col("location"),
    col("battery_level"),
    col("signal_strength"),
    coalesce(col("is_anomaly"), lit(false)).as("is_anomaly"),
    lit(null).cast(StringType).as("firmware_version"),
    map_filter(col("device_metadata"), (_, v) => v.isNotNull).as("device_metadata"),
    col("status"),
    col("tags"),
    lit(null).cast(StringType).as("maintenance_date"))

  /** readings → Kafka wire records (key: binary, value: binary). */
  def toKafkaRecords(readings: DataFrame,
      schemaId: Int = AvroPipeline.SchemaId): DataFrame =
    readings.select(
      col("device_id").cast(BinaryType).as("key"),
      AvroWire.frame(
        AvroWire.toAvro(readingStruct(), AvroWire.sensorSchemaJson),
        schemaId).as("value"))

  /** Kafka wire records → readings (the consumer's decode path:
    * frame strip, Avro decode, union normalization, ts parse).
    */
  def fromKafkaRecords(records: DataFrame): DataFrame = {
    val r = records.select(
      col("key").cast(StringType).as("key_device_id"),
      AvroWire.fromAvro(AvroWire.unframe(col("value")),
        AvroWire.sensorSchemaJson).as("r"))
    r.select(
      col("key_device_id"),
      col("r.device_id").as("device_id"),
      col("r.device_type").as("device_type"),
      to_timestamp(col("r.timestamp")).cast("timestamp_ntz").as("ts"),
      coalesce(col("r.value.member0"), col("r.value.member1").cast(DoubleType))
        .as("value"),
      col("r.unit").as("unit"),
      col("r.location").as("location"),
      col("r.battery_level").as("battery_level"),
      col("r.signal_strength").as("signal_strength"),
      col("r.is_anomaly").as("is_anomaly"),
      col("r.device_metadata").as("device_metadata"),
      col("r.status").as("status"),
      col("r.tags").as("tags"))
  }

  /** Config-gated streaming source: the Kafka branch builds the real
    * connector plan (spark-sql-kafka jar + broker required); the parquet
    * branch replays an archived record table through the SAME downstream
    * decode, which is how the parity tests drive this without a broker.
    */
  def readRecordStream(spark: SparkSession, t: Transport): DataFrame = t.kind match {
    case "kafka" =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", t.bootstrap)
        .option("subscribe", t.topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(col("key"), col("value"))
    case "parquet" =>
      spark.readStream
        .schema(StructType(Seq(
          StructField("key", BinaryType), StructField("value", BinaryType))))
        .parquet(t.topic) // topic = directory in replay mode
    case other => throw new IllegalArgumentException(s"no such transport: $other")
  }

  /** Config-gated record sink (S2: keyed producer). */
  def writeRecordStream(records: DataFrame, t: Transport,
      checkpointDir: String) = t.kind match {
    case "kafka" =>
      records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", t.bootstrap)
        .option("topic", t.topic)
        .option("checkpointLocation", checkpointDir)
        .start()
    case "parquet" =>
      records.writeStream.format("parquet")
        .option("path", t.topic)
        .option("checkpointLocation", checkpointDir)
        .start()
    case other => throw new IllegalArgumentException(s"no such transport: $other")
  }
}
