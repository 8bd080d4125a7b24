package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1: the network JSON gateway source (reference: MQTT ingestion of
  * RuuviTag gateway payloads, src/mqtt consumer + ruuvitag_adapter).
  *
  * No MQTT client library exists on this classpath, so the network
  * branch is Spark's built-in socket source — the same wire shape
  * (line-delimited JSON messages pushed over TCP); the file branch
  * replays archived payload files deterministically, which is what the
  * spec drives. Whatever the transport, messages decode through ONE
  * schema-checked parser into the raw gateway frame `Ingest.ingest`
  * consumes — transport and parsing are orthogonal, exactly the
  * property that made the Kafka wire config-gatable.
  *
  * Scale: `from_json` with an explicit schema is a narrow codegen'd
  * per-row parse (no inference pass, no shuffle); malformed lines
  * surface as all-null rows routed to the dead-letter side of the
  * ingest validation split rather than killing the stream.
  */
object JsonGateway {

  /** The raw gateway payload schema (ruuvitag_adapter.py:272-331 field
    * surface; Ingest.generateRaw emits exactly this shape).
    */
  val gatewaySchema: StructType = StructType(Seq(
    StructField("device_id", StringType),
    StructField("device_type", StringType),
    StructField("timestamp", StringType),
    StructField("temperature", DoubleType),
    StructField("humidity", DoubleType),
    StructField("pressure", DoubleType),
    StructField("acceleration_x", DoubleType),
    StructField("acceleration_y", DoubleType),
    StructField("acceleration_z", DoubleType),
    StructField("battery_voltage", DoubleType),
    StructField("tx_power", IntegerType),
    StructField("movement_counter", IntegerType),
    StructField("measurement_sequence", IntegerType)))

  /** One JSON message line → one raw gateway row. */
  def parse(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value").cast(StringType), gatewaySchema).as("m"))
      .select(col("m.*"))

  /** Config-gated streaming source: socket (network push), or file
    * replay of archived payload lines. Both feed `parse` → the ingest
    * DAG unchanged.
    */
  def readJsonStream(spark: SparkSession, t: KafkaWire.Transport): DataFrame = t.kind match {
    case "socket" =>
      val Array(host, port) = t.bootstrap.split(":")
      parse(spark.readStream.format("socket")
        .option("host", host).option("port", port.toInt).load())
    case "file" =>
      parse(spark.readStream.text(t.topic).withColumnRenamed("value", "value"))
    case other => throw new IllegalArgumentException(s"no such transport: $other")
  }
}
