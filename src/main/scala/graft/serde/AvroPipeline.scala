package graft.serde

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Avro wire path end-to-end, as the registered `avro_roundtrip`
  * query: derive a full v2 sensor reading from each events row
  * (exercising every schema type: 3-branch value union, nested location
  * record with nullable fields, map, enum, array, nullable scalars) →
  * `to_avro` → Confluent frame → frame strip (`substring(value, 6, …)`)
  * → `from_avro` → union normalization via struct coalesce → flat
  * projection.
  *
  * Because encode∘decode is the identity on the wire (proven against a
  * raw Avro reader in AvroSpec), the DuckDB oracle is the SAME flat
  * projection computed directly from events — a full hash match
  * certifies every field of every row survived serialization.
  *
  * Scale: one narrow codegen'd derivation + two per-row codec evals, no
  * shuffle, no driver state — the plan is a single scan stage.
  */
object AvroPipeline {

  val SchemaId = 42 // registry id the frame carries (schema_registry.py:191)

  /** events row → sensor-reading struct in schema field order
    * (catalystType(sensorSchema) shape).
    */
  def sensorFromEvents(): Column = {
    val uid = col("user_id")
    val eid = col("event_id")
    struct(
      concat(lit("dev-"), uid.cast(StringType)).as("device_id"),
      col("event_type").as("device_type"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"),
      // 3-branch union ["double","int","null"]: memberN struct, null
      // struct = null branch
      when(eid % 3 === 0,
          struct(col("value").as("member0"), lit(null).cast(IntegerType).as("member1")))
        .when(eid % 3 === 1,
          struct(lit(null).cast(DoubleType).as("member0"),
            col("value").cast(IntegerType).as("member1")))
        .otherwise(lit(null).cast("struct<member0:double,member1:int>"))
        .as("value"),
      when(col("event_type") === "click", "count")
        .when(col("event_type") === "view", "ms")
        .when(col("event_type") === "purchase", "eur")
        .when(col("event_type") === "signup", "count")
        .otherwise("code").as("unit"),
      struct(
        (lit(60.0) + (uid % 100).cast(DoubleType) * 0.001).as("latitude"),
        (lit(24.0) + (uid % 100).cast(DoubleType) * 0.002).as("longitude"),
        when(uid % 5 === 0, lit(null).cast(StringType))
          .otherwise(concat(lit("B"), (uid % 3).cast(StringType))).as("building"),
        when(uid % 4 === 0, lit(null).cast(IntegerType))
          .otherwise((uid % 4).cast(IntegerType)).as("floor"),
        when(uid % 2 === 0, lit("Z1")).otherwise(lit(null).cast(StringType)).as("zone"),
        lit(null).cast(StringType).as("room")).as("location"),
      when(eid % 5 === 0, lit(null).cast(DoubleType))
        .otherwise(col("value") * 0.1).as("battery_level"),
      when(eid % 2 === 0, lit(-40.0) - (uid % 30).cast(DoubleType))
        .otherwise(lit(null).cast(DoubleType)).as("signal_strength"),
      (col("event_type") === "error").as("is_anomaly"),
      when(uid % 6 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("fw-1."), (uid % 4).cast(StringType)))
        .as("firmware_version"),
      when(eid % 7 === 0, lit(null).cast(MapType(StringType, StringType)))
        .otherwise(map(
          lit("parent"), concat(lit("gw-"), (uid % 5).cast(StringType)),
          lit("seq"), eid.cast(StringType))).as("device_metadata"),
      element_at(
        array(lit("ACTIVE"), lit("IDLE"), lit("MAINTENANCE"), lit("ERROR"), lit("UNKNOWN")),
        (eid % 5).cast(IntegerType) + 1).as("status"),
      array(lit("iot"), col("event_type")).as("tags"),
      when(uid % 7 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("2024-0"), ((uid % 9) + 1).cast(StringType), lit("-01")))
        .as("maintenance_date"))
  }

  /** Registered query: derive → encode → frame → unframe → decode →
    * normalize → flatten. Hash-checked field-by-field against the
    * direct projection oracle.
    */
  def avroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
    // the codec is CPU-bound, narrow, per-row work: make sure it runs at
    // session parallelism even when the local scan yields one split (the
    // driver fixtures are single-row-group parquet; a production table's
    // many splits make this a no-op)
    val e =
      if (base.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
        base.repartition(s.sparkContext.defaultParallelism)
      else base
    val framed = e.select(col("event_id"),
      AvroWire.frame(
        AvroWire.toAvro(sensorFromEvents(), AvroWire.sensorSchemaJson),
        SchemaId).as("wire"))
    val decoded = framed.select(col("event_id"),
      AvroWire.frameMagicOk(col("wire")).as("magic_ok"),
      AvroWire.frameSchemaId(col("wire")).as("schema_id"),
      AvroWire.fromAvro(AvroWire.unframe(col("wire")),
        AvroWire.sensorSchemaJson).as("r"))
    decoded.select(
      col("event_id"),
      col("r.device_id").as("device_id"),
      col("r.device_type").as("device_type"),
      col("r.timestamp").as("ts_str"),
      // union normalization: branch tag + coalesced numeric view
      when(col("r.value.member0").isNotNull, "double")
        .when(col("r.value.member1").isNotNull, "int")
        .otherwise("null").as("value_kind"),
      coalesce(col("r.value.member0"), col("r.value.member1").cast(DoubleType))
        .as("value_num"),
      col("r.unit").as("unit"),
      col("r.location.latitude").as("latitude"),
      col("r.location.longitude").as("longitude"),
      col("r.location.building").as("building"),
      col("r.location.floor").cast(DoubleType).as("floor_d"),
      col("r.location.zone").as("zone"),
      col("r.location.room").as("room"),
      col("r.battery_level").as("battery_level"),
      col("r.signal_strength").as("signal_strength"),
      col("r.is_anomaly").as("is_anomaly"),
      col("r.firmware_version").as("firmware_version"),
      element_at(col("r.device_metadata"), "parent").as("meta_parent"),
      // size(NULL) is -1 under legacy sizeOfNull (non-ANSI session) —
      // guard so the null map stays null
      when(col("r.device_metadata").isNotNull,
        size(col("r.device_metadata")).cast(LongType)).as("n_meta"),
      col("r.status").as("status"),
      size(col("r.tags")).cast(LongType).as("n_tags"),
      element_at(col("r.tags"), 2).as("tag2"),
      col("r.maintenance_date").as("maintenance_date"),
      col("schema_id"),
      col("magic_ok"))
      .orderBy(col("event_id"))
  }
}
