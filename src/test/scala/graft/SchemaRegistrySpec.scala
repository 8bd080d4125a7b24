package graft

import graft.serde.{AvroWire, SchemaCompat, SchemaRegistry}
import org.apache.avro.{Schema, SchemaValidationException}
import org.scalatest.funsuite.AnyFunSuite

/** Registry protocol surface: compat predicates over the real v1→v2
  * sensor evolution, gated registration, versions, levels, deletion.
  */
class SchemaRegistrySpec extends AnyFunSuite {

  // v2 minus the defaulted additions — the payload AvroSpec proves
  // decodes under the v2 reader; here we prove the registry's gate
  // agrees that the evolution is legal
  private val v1Json = """{
    "namespace": "com.iotdatapipeline.avro",
    "type": "record", "name": "IoTSensorReading", "fields": [
      {"name": "device_id", "type": "string"},
      {"name": "device_type", "type": "string"},
      {"name": "timestamp", "type": "string"},
      {"name": "value", "type": ["double", "int", "null"]},
      {"name": "unit", "type": "string"},
      {"name": "location", "type": {"type": "record", "name": "Location", "fields": [
        {"name": "latitude", "type": "double"},
        {"name": "longitude", "type": "double"},
        {"name": "building", "type": ["string", "null"]},
        {"name": "floor", "type": ["int", "null"]},
        {"name": "zone", "type": ["string", "null"], "default": null}
      ]}},
      {"name": "battery_level", "type": ["double", "null"]},
      {"name": "signal_strength", "type": ["double", "null"], "default": null},
      {"name": "is_anomaly", "type": "boolean", "default": false},
      {"name": "firmware_version", "type": ["string", "null"], "default": null},
      {"name": "device_metadata",
       "type": [{"type": "map", "values": "string"}, "null"], "default": null}
    ]}"""

  // removes `unit` (no default) and retypes device_id — cannot read v2 data
  private val badJson = """{
    "namespace": "com.iotdatapipeline.avro",
    "type": "record", "name": "IoTSensorReading", "fields": [
      {"name": "device_id", "type": "long"},
      {"name": "timestamp", "type": "string"}
    ]}"""

  private def parse(j: String) = new Schema.Parser().parse(j)

  test("v1 -> v2 is BACKWARD compatible; the reverse direction is FORWARD") {
    val v1 = parse(v1Json)
    val v2 = parse(AvroWire.sensorSchemaJson)
    // v2 reader reads v1 data (all added fields carry defaults)
    assert(SchemaCompat.isBackwardCompatible(v2, v1))
    assert(SchemaCompat.incompatibilities(v2, v1).isEmpty)
    // v1 reader also reads v2 data here (v1 has no non-defaulted field
    // missing from v2), so the pair is FULL-compatible
    assert(SchemaCompat.isForwardCompatible(v2, v1))
    assert(SchemaCompat.isFullyCompatible(v2, v1))
  }

  test("incompatible change is rejected with named violations") {
    val v2 = parse(AvroWire.sensorSchemaJson)
    val bad = parse(badJson)
    assert(!SchemaCompat.isBackwardCompatible(bad, v2))
    val why = SchemaCompat.incompatibilities(bad, v2)
    assert(why.nonEmpty)
    assert(why.mkString.contains("TYPE_MISMATCH") || why.mkString.contains("device_id"))
  }

  test("registration is gated, idempotent, and versioned") {
    val reg = new SchemaRegistry
    val r1 = reg.register("sensor-value", v1Json)
    assert(r1.version == 1)
    // byte-identical re-registration returns the same entry (cache path,
    // schema_registry.py:171-185)
    assert(reg.register("sensor-value", v1Json) == r1)
    val r2 = reg.register("sensor-value", AvroWire.sensorSchemaJson)
    assert(r2.version == 2 && r2.id != r1.id)
    assert(reg.versions("sensor-value") == Seq(1, 2))
    assert(reg.latest("sensor-value").contains(r2))
    assert(reg.version("sensor-value", 1).contains(r1))
    assert(reg.schemaById(r1.id).contains(r1))
    // the incompatible writer is refused under BACKWARD...
    assert(!reg.checkCompatibility("sensor-value", badJson))
    intercept[SchemaValidationException](reg.register("sensor-value", badJson))
    assert(reg.versions("sensor-value") == Seq(1, 2)) // nothing half-registered
    // ...and admitted under NONE (per-subject override)
    reg.setCompatibility("NONE", Some("sensor-value"))
    assert(reg.register("sensor-value", badJson).version == 3)
  }

  test("subjects, global level, deletion") {
    val reg = new SchemaRegistry
    reg.register("a-value", v1Json)
    reg.register("b-value", v1Json)
    assert(reg.subjects == Seq("a-value", "b-value"))
    assert(reg.compatibilityLevel("a-value") == "BACKWARD")
    reg.setCompatibility("FULL")
    assert(reg.compatibilityLevel("a-value") == "FULL")
    intercept[IllegalArgumentException](reg.setCompatibility("SIDEWAYS"))
    val id = reg.latest("a-value").get.id
    assert(reg.delete("a-value"))
    assert(reg.subjects == Seq("b-value"))
    assert(reg.schemaById(id).isEmpty)
    assert(!reg.delete("a-value"))
    assert(reg.delete("b-value", Some(1)))
    assert(reg.latest("b-value").isEmpty)
  }
}
