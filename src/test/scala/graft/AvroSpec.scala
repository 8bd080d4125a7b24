package graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import graft.serde.{AvroPipeline, AvroWire}
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Wire-format compatibility of the serde expressions: the proof is
  * cross-decoding — bytes produced by AvroWire.toAvro must be readable
  * by Avro's own GenericDatumReader (what the reference's consumer
  * effectively runs, schema_registry.py:337-357), and bytes produced by
  * Avro's own GenericDatumWriter must decode through AvroWire.fromAvro.
  * Self-inverse round-trips can't prove that; cross-decoding can.
  */
class AvroSpec extends SparkSpec {

  private val schema = new Schema.Parser().parse(AvroWire.sensorSchemaJson)

  /** A reading touching every schema type, built with the raw Avro API. */
  private def referenceRecord(): GenericRecord = {
    val loc = new GenericData.Record(schema.getField("location").schema)
    loc.put("latitude", 60.1699)
    loc.put("longitude", 24.9384)
    loc.put("building", new Utf8("B1"))
    loc.put("floor", Int.box(3))
    loc.put("zone", null)
    loc.put("room", new Utf8("r-12"))
    val rec = new GenericData.Record(schema)
    rec.put("device_id", new Utf8("dev-7"))
    rec.put("device_type", new Utf8("temperature"))
    rec.put("timestamp", new Utf8("2024-01-15T10:30:00"))
    rec.put("value", Double.box(21.5)) // double branch of the union
    rec.put("unit", new Utf8("°C"))
    rec.put("location", loc)
    rec.put("battery_level", Double.box(87.5))
    rec.put("signal_strength", null)
    rec.put("is_anomaly", Boolean.box(false))
    rec.put("firmware_version", new Utf8("fw-1.2"))
    val meta = new java.util.HashMap[Utf8, Utf8]()
    meta.put(new Utf8("parent"), new Utf8("gw-1"))
    rec.put("device_metadata", meta)
    rec.put("status", new GenericData.EnumSymbol(
      schema.getField("status").schema, "ACTIVE"))
    rec.put("tags", java.util.List.of(new Utf8("iot"), new Utf8("ble")).asInstanceOf[AnyRef])
    rec.put("maintenance_date", null)
    rec
  }

  private def rawEncode(rec: GenericRecord): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get.binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  private def rawDecode(bytes: Array[Byte]): GenericRecord =
    new GenericDatumReader[GenericRecord](schema)
      .read(null, DecoderFactory.get.binaryDecoder(bytes, null))

  test("raw Avro writer → AvroWire.fromAvro decodes every field") {
    import spark.implicits._
    val body = rawEncode(referenceRecord())
    val row = Seq(body).toDF("body")
      .select(AvroWire.fromAvro(col("body"), AvroWire.sensorSchemaJson).as("r"))
      .select("r.*").head()
    assert(row.getAs[String]("device_id") == "dev-7")
    assert(row.getAs[String]("timestamp") == "2024-01-15T10:30:00")
    val v = row.getAs[Row]("value")
    assert(v.getAs[java.lang.Double]("member0") == 21.5 && v.isNullAt(1))
    assert(row.getAs[String]("unit") == "°C")
    val loc = row.getAs[Row]("location")
    assert(loc.getAs[Double]("latitude") == 60.1699)
    assert(loc.getAs[Integer]("floor") == 3)
    assert(loc.isNullAt(loc.fieldIndex("zone")))
    assert(loc.getAs[String]("room") == "r-12")
    assert(row.getAs[java.lang.Double]("battery_level") == 87.5)
    assert(row.isNullAt(row.fieldIndex("signal_strength")))
    assert(!row.getAs[Boolean]("is_anomaly"))
    assert(row.getMap[String, String](row.fieldIndex("device_metadata")).toMap ==
      Map("parent" -> "gw-1"))
    assert(row.getAs[String]("status") == "ACTIVE")
    assert(row.getSeq[String](row.fieldIndex("tags")).toList == List("iot", "ble"))
    assert(row.isNullAt(row.fieldIndex("maintenance_date")))
  }

  test("AvroWire.toAvro → raw Avro reader sees identical bytes semantics") {
    // encode via the expression from an events-derived struct...
    val wire = Tables.events(spark, Sf001).limit(50)
      .select(col("event_id"),
        AvroWire.toAvro(AvroPipeline.sensorFromEvents(), AvroWire.sensorSchemaJson)
          .as("body"))
      .orderBy("event_id")
      .collect()
    assert(wire.length == 50)
    // ...then decode each body with Avro's own reader and spot-check
    wire.foreach { r =>
      val rec = rawDecode(r.getAs[Array[Byte]]("body"))
      assert(rec.get("device_id").toString.startsWith("dev-"))
      val status = rec.get("status").toString
      assert(Set("ACTIVE", "IDLE", "MAINTENANCE", "ERROR", "UNKNOWN")(status))
      val tags = rec.get("tags").asInstanceOf[java.util.List[AnyRef]]
      assert(tags.size == 2 && tags.get(0).toString == "iot")
      val loc = rec.get("location").asInstanceOf[GenericRecord]
      assert(loc.get("latitude").asInstanceOf[Double] >= 60.0)
      // the value union decodes to Double / Integer / null per branch
      val v = rec.get("value")
      assert(v == null || v.isInstanceOf[java.lang.Double] || v.isInstanceOf[java.lang.Integer])
    }
  }

  test("Confluent frame: magic byte, big-endian schema id, strip round-trip") {
    import spark.implicits._
    val body = rawEncode(referenceRecord())
    val framed = Seq(body).toDF("body")
      .select(AvroWire.frame(col("body"), 1234567).as("wire"))
    val row = framed.select(
      AvroWire.frameMagicOk(col("wire")).as("ok"),
      AvroWire.frameSchemaId(col("wire")).as("id"),
      AvroWire.unframe(col("wire")).as("stripped")).head()
    assert(row.getAs[Boolean]("ok"))
    assert(row.getAs[Int]("id") == 1234567)
    assert(row.getAs[Array[Byte]]("stripped").sameElements(body))
    // byte-level: magic 0x00 then 4-byte BE int
    val bytes = AvroWire.frameBytes(1234567)
    assert(bytes(0) == 0x00)
    assert(java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt == 1234567)
  }

  test("schema evolution: v1 payload decodes under the v2 reader with defaults") {
    import spark.implicits._
    // v1 = v2 minus the "new in v2" fields (status/tags/maintenance_date/
    // location.room) — all carry defaults in v2, which is the registry's
    // BACKWARD-compatibility contract
    val v1Json = """{
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
    val v1 = new Schema.Parser().parse(v1Json)
    val loc = new GenericData.Record(v1.getField("location").schema)
    loc.put("latitude", 60.17); loc.put("longitude", 24.94)
    loc.put("building", new Utf8("B2")); loc.put("floor", Int.box(1)); loc.put("zone", null)
    val rec = new GenericData.Record(v1)
    rec.put("device_id", new Utf8("dev-v1"))
    rec.put("device_type", new Utf8("humidity"))
    rec.put("timestamp", new Utf8("2023-06-01T00:00:00"))
    rec.put("value", Double.box(55.0))
    rec.put("unit", new Utf8("%"))
    rec.put("location", loc)
    rec.put("battery_level", null)
    rec.put("signal_strength", null)
    rec.put("is_anomaly", Boolean.box(true))
    rec.put("firmware_version", null)
    rec.put("device_metadata", null)
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get.binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](v1).write(rec, enc)
    enc.flush()
    val row = Seq(bos.toByteArray).toDF("body")
      .select(AvroWire.fromAvroEvolved(col("body"),
        AvroWire.sensorSchemaJson, v1Json).as("r"))
      .select("r.*").head()
    // v1 data carried through
    assert(row.getAs[String]("device_id") == "dev-v1")
    assert(row.getAs[Boolean]("is_anomaly"))
    // v2-only fields filled from reader-schema defaults
    assert(row.getAs[String]("status") == "ACTIVE")
    assert(row.getSeq[String](row.fieldIndex("tags")).isEmpty)
    assert(row.isNullAt(row.fieldIndex("maintenance_date")))
    val locRow = row.getAs[Row]("location")
    assert(locRow.isNullAt(locRow.fieldIndex("room")))
    assert(locRow.getAs[String]("building") == "B2")
  }

  test("multi-branch union with ENUM/BYTES/FIXED branches decodes") {
    import spark.implicits._
    val uJson = """{
      "type": "record", "name": "U", "fields": [
        {"name": "payload", "type": [
          "bytes",
          {"type": "enum", "name": "Kind", "symbols": ["A", "B"]},
          {"type": "fixed", "name": "F4", "size": 4}
        ]}
      ]}"""
    val uSchema = new Schema.Parser().parse(uJson)
    def enc(put: GenericData.Record => Unit): Array[Byte] = {
      val r = new GenericData.Record(uSchema); put(r)
      val bos = new ByteArrayOutputStream()
      val e = EncoderFactory.get.binaryEncoder(bos, null)
      new GenericDatumWriter[GenericRecord](uSchema).write(r, e)
      e.flush(); bos.toByteArray
    }
    val bytesRec = enc(_.put("payload", java.nio.ByteBuffer.wrap(Array[Byte](1, 2))))
    val enumRec = enc(_.put("payload",
      new GenericData.EnumSymbol(uSchema.getField("payload").schema.getTypes.get(1), "B")))
    val fixedRec = enc(_.put("payload",
      new GenericData.Fixed(uSchema.getField("payload").schema.getTypes.get(2),
        Array[Byte](9, 9, 9, 9))))
    val rows = Seq(bytesRec, enumRec, fixedRec).toDF("body")
      .select(AvroWire.fromAvro(col("body"), uJson).as("r"))
      .select(col("r.payload").as("p"))
      .collect()
    // member0 = bytes, member1 = enum string, member2 = fixed binary
    assert(rows(0).getAs[Row]("p").getAs[Array[Byte]]("member0").toSeq == Seq[Byte](1, 2))
    assert(rows(1).getAs[Row]("p").getAs[String]("member1") == "B")
    assert(rows(2).getAs[Row]("p").getAs[Array[Byte]]("member2").toSeq == Seq[Byte](9, 9, 9, 9))

    // encode direction: plain enum/fixed/bytes fields through toAvro →
    // Avro's own reader
    val peJson = """{"type": "record", "name": "E2", "fields": [
      {"name": "kind", "type": {"type": "enum", "name": "Kind2", "symbols": ["X", "Y"]}},
      {"name": "tag", "type": {"type": "fixed", "name": "F2", "size": 2}},
      {"name": "blob", "type": "bytes"}]}"""
    val body = Seq(("Y", Array[Byte](7, 8), Array[Byte](1)))
      .toDF("kind", "tag", "blob")
      .select(AvroWire.toAvro(
        struct(col("kind"), col("tag"), col("blob")), peJson).as("body"))
      .head().getAs[Array[Byte]]("body")
    val peSchema = new Schema.Parser().parse(peJson)
    val dec = DecoderFactory.get.binaryDecoder(body, null)
    val got = new GenericDatumReader[GenericRecord](peSchema).read(null, dec)
    assert(got.get("kind").toString == "Y")
    assert(got.get("tag").asInstanceOf[GenericData.Fixed].bytes.toSeq == Seq[Byte](7, 8))
    val bb = got.get("blob").asInstanceOf[java.nio.ByteBuffer]
    val blob = new Array[Byte](bb.remaining); bb.get(blob)
    assert(blob.toSeq == Seq[Byte](1))
  }

  test("union int/null branches cross-decode through the memberN struct") {
    import spark.implicits._
    val intRec = referenceRecord()
    intRec.put("value", Int.box(42)) // int branch via raw writer
    val nullRec = referenceRecord()
    nullRec.put("value", null) // null branch
    val rows = Seq(rawEncode(intRec), rawEncode(nullRec)).toDF("body")
      .select(AvroWire.fromAvro(col("body"), AvroWire.sensorSchemaJson).as("r"))
      .select(col("r.value").as("v"))
      .collect()
    val intV = rows(0).getAs[Row]("v")
    assert(intV.isNullAt(0) && intV.getAs[Integer]("member1") == 42)
    assert(rows(1).isNullAt(0)) // null branch → null struct
  }
}
