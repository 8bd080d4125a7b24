package graft.schema

import org.apache.spark.sql.types._

/** The canonical data model (SURVEY.md §1): schemas are DECLARED, never
  * inferred — at 100 TB an inference pass is a full scan, and the
  * reference's registry-managed Avro schema is likewise explicit
  * (src/schemas/iot_sensor_reading.avsc:1-163, "Version 2" with
  * BACKWARD-compatible additive evolution).
  */
object SensorSchema {

  /** Raw gateway payload (FIXTURES.md F1; esp32 main.c:416-455): flat
    * JSON, every measurement optional (adapter treats each field as
    * maybe-absent, ruuvitag_adapter.py:334-337).
    */
  val raw: StructType = StructType(Seq(
    StructField("device_id", StringType, nullable = false),
    StructField("device_type", StringType),
    StructField("timestamp", StringType), // epoch-str | uptime | ISO (T5)
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

  /** Location record (avsc:37-88), kept nested; flatten at the sink
    * (T12) with `select("location.*")`.
    */
  val location: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("building", StringType),
    StructField("floor", IntegerType),
    StructField("zone", StringType),
    StructField("room", StringType)))

  /** Canonical sensor reading (avsc:1-163 ≡ init.sql:31-70): the flat
    * relational row the analytics layer queries.
    */
  val reading: StructType = StructType(Seq(
    StructField("device_id", StringType, nullable = false),
    StructField("device_type", StringType, nullable = false),
    StructField("ts", TimestampNTZType, nullable = false),
    StructField("value", DoubleType),
    StructField("unit", StringType),
    StructField("location", location),
    StructField("battery_level", DoubleType),
    StructField("signal_strength", DoubleType),
    StructField("is_anomaly", BooleanType, nullable = false),
    StructField("firmware_version", StringType),
    StructField("device_metadata", MapType(StringType, StringType)),
    StructField("status", StringType),     // ACTIVE|IDLE|MAINTENANCE|ERROR|UNKNOWN
    StructField("tags", ArrayType(StringType)),
    StructField("maintenance_date", TimestampNTZType)))

  val statuses: Seq[String] =
    Seq("ACTIVE", "IDLE", "MAINTENANCE", "ERROR", "UNKNOWN")
}
