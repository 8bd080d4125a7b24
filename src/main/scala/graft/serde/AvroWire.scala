package graft.serde

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro wire format — the reference's canonical serialization
  * (src/utils/schema_registry.py:311-357: Confluent AvroSerializer /
  * AvroDeserializer over the v2 sensor schema).
  *
  * The sandbox classpath has avro-1.12.1 (the Java codec) but not the
  * spark-avro connector, so `to_avro`/`from_avro` are provided here as
  * two schema-driven Catalyst expressions over the SAME Java codec the
  * Avro spec defines — wire-compatible with any Avro reader (the spec
  * proves this by cross-decoding with a raw GenericDatumReader/Writer).
  *
  * Framing follows the Confluent wire format the reference's registry
  * client speaks (schema_registry.py:73-77 via confluent_kafka): byte 0 =
  * magic 0x00, bytes 1-4 = schema id (big-endian int32), bytes 5.. = the
  * Avro binary body. Frame strip/prepend is plain Column arithmetic
  * (`substring(value, 6, …)` — SURVEY.md §7.4#1), not part of the codec.
  *
  * Scale notes: both expressions are per-row, no shuffle, no driver
  * state; the parsed Schema and datum reader/writer are @transient lazy,
  * built once per task after plan deserialization. They are
  * CodegenFallback (like the connector's own AvroDataToCatalyst) — the
  * object codec can't be inlined into generated Java, but stays inside
  * the stage as a narrow eval.
  */
object AvroWire {

  /** The reference's v2 reading schema, mirrored verbatim from
    * src/schemas/iot_sensor_reading.avsc (field order matters on the
    * wire).
    */
  val sensorSchemaJson: String = """{
    "namespace": "com.iotdatapipeline.avro",
    "type": "record",
    "name": "IoTSensorReading",
    "fields": [
      {"name": "device_id", "type": "string"},
      {"name": "device_type", "type": "string"},
      {"name": "timestamp", "type": "string"},
      {"name": "value", "type": ["double", "int", "null"]},
      {"name": "unit", "type": "string"},
      {"name": "location", "type": {
        "type": "record", "name": "Location", "fields": [
          {"name": "latitude", "type": "double"},
          {"name": "longitude", "type": "double"},
          {"name": "building", "type": ["string", "null"]},
          {"name": "floor", "type": ["int", "null"]},
          {"name": "zone", "type": ["string", "null"], "default": null},
          {"name": "room", "type": ["string", "null"], "default": null}
        ]}},
      {"name": "battery_level", "type": ["double", "null"]},
      {"name": "signal_strength", "type": ["double", "null"], "default": null},
      {"name": "is_anomaly", "type": "boolean", "default": false},
      {"name": "firmware_version", "type": ["string", "null"], "default": null},
      {"name": "device_metadata",
       "type": [{"type": "map", "values": "string"}, "null"], "default": null},
      {"name": "status", "type": {
        "type": "enum", "name": "DeviceStatus",
        "symbols": ["ACTIVE", "IDLE", "MAINTENANCE", "ERROR", "UNKNOWN"]},
       "default": "ACTIVE"},
      {"name": "tags", "type": {"type": "array", "items": "string"}, "default": []},
      {"name": "maintenance_date", "type": ["string", "null"], "default": null}
    ]
  }"""

  // ---------------------------------------------------------------- types

  private def isNull(s: Schema): Boolean = s.getType == Schema.Type.NULL

  /** Avro schema → Catalyst type. Unions: [X, null] in any order →
    * nullable X; a union with 2+ non-null branches → struct of one field
    * per branch named member0..memberN (the public spark-avro
    * convention), normalized downstream with a struct coalesce.
    */
  def catalystType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, catalystType(f.schema), nullable = nullableOf(f.schema))
      })
    case Schema.Type.MAP =>
      MapType(StringType, catalystType(s.getValueType),
        valueContainsNull = nullableOf(s.getValueType))
    case Schema.Type.ARRAY =>
      ArrayType(catalystType(s.getElementType),
        containsNull = nullableOf(s.getElementType))
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(isNull).toSeq
      branches match {
        case Seq(one) => catalystType(one)
        case many => StructType(many.zipWithIndex.map { case (b, i) =>
          StructField(s"member$i", catalystType(b), nullable = true)
        })
      }
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def nullableOf(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(isNull)

  def sensorCatalystType: StructType =
    catalystType(new Schema.Parser().parse(sensorSchemaJson)).asInstanceOf[StructType]

  // ------------------------------------------- catalyst <-> avro generic
  //
  // Converters are COMPILED ONCE per expression instance into a closure
  // tree (one closure per schema node, with field schemas/types captured
  // in arrays) — the per-row hot path never walks the Schema object or
  // allocates asScala wrappers, which dominates a naive schema-driven
  // recursion at 100k+ rows/task.

  private[serde] type ToAvro = Any => AnyRef
  private[serde] type FromAvro = Any => Any

  /** Build the Catalyst→Avro converter for (schema, catalyst type). */
  private[serde] def toAvroConverter(s: Schema, dt: DataType): ToAvro = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(isNull).toSeq
      if (branches.size == 1) {
        val conv = toAvroConverter(branches.head, dt)
        v => if (v == null) null else conv(v)
      } else {
        // multi-branch union: v is a memberN struct; first non-null
        // member picks the wire branch, all-null / null struct → null
        val st = dt.asInstanceOf[StructType]
        val types = st.fields.map(_.dataType)
        val convs = branches.indices.map(i => toAvroConverter(branches(i), types(i))).toArray
        v => {
          if (v == null) null
          else {
            val row = v.asInstanceOf[InternalRow]
            var i = 0; var out: AnyRef = null
            while (i < convs.length && out == null) {
              if (!row.isNullAt(i)) out = convs(i)(row.get(i, types(i)))
              i += 1
            }
            out
          }
        }
      }
    case Schema.Type.STRING => v => if (v == null) null else new Utf8(v.toString)
    case Schema.Type.ENUM =>
      val symbols = s.getEnumSymbols
      v => if (v == null) null else {
        val sym = v.toString
        if (!symbols.contains(sym))
          throw new IllegalArgumentException(
            s"'$sym' is not a symbol of enum ${s.getFullName}")
        new GenericData.EnumSymbol(s, sym)
      }
    case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
         Schema.Type.DOUBLE | Schema.Type.BOOLEAN =>
      v => v.asInstanceOf[AnyRef]
    case Schema.Type.BYTES =>
      v => if (v == null) null else java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case Schema.Type.FIXED =>
      // the datum writer requires GenericFixed (and exactly size bytes)
      v => if (v == null) null else {
        val arr = v.asInstanceOf[Array[Byte]]
        if (arr.length != s.getFixedSize)
          throw new IllegalArgumentException(
            s"fixed ${s.getFullName} needs ${s.getFixedSize} bytes, got ${arr.length}")
        new GenericData.Fixed(s, arr)
      }
    case Schema.Type.RECORD =>
      val st = dt.asInstanceOf[StructType]
      val types = st.fields.map(_.dataType)
      val convs = s.getFields.asScala.toArray.zipWithIndex.map { case (f, i) =>
        toAvroConverter(f.schema, types(i)) }
      v => if (v == null) null else {
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < convs.length) {
          rec.put(i, if (row.isNullAt(i)) convs(i)(null) else convs(i)(row.get(i, types(i))))
          i += 1
        }
        rec
      }
    case Schema.Type.MAP =>
      val mt = dt.asInstanceOf[MapType]
      val valConv = toAvroConverter(s.getValueType, mt.valueType)
      v => if (v == null) null else {
        val md = v.asInstanceOf[MapData]
        val out = new java.util.HashMap[Utf8, AnyRef](md.numElements)
        val keys = md.keyArray; val vals = md.valueArray
        var i = 0
        while (i < md.numElements) {
          out.put(new Utf8(keys.getUTF8String(i).toString),
            if (vals.isNullAt(i)) valConv(null) else valConv(vals.get(i, mt.valueType)))
          i += 1
        }
        out
      }
    case Schema.Type.ARRAY =>
      val at = dt.asInstanceOf[ArrayType]
      val elemConv = toAvroConverter(s.getElementType, at.elementType)
      v => if (v == null) null else {
        val ad = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[AnyRef](ad.numElements)
        var i = 0
        while (i < ad.numElements) {
          out.add(if (ad.isNullAt(i)) elemConv(null) else elemConv(ad.get(i, at.elementType)))
          i += 1
        }
        out
      }
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  /** Build the Avro→Catalyst converter for (schema, catalyst type). */
  private[serde] def fromAvroConverter(s: Schema, dt: DataType): FromAvro = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(isNull).toSeq
      if (branches.size == 1) {
        val conv = fromAvroConverter(branches.head, dt)
        v => if (v == null) null else conv(v)
      } else {
        // multi-branch union → memberN struct; the runtime class of the
        // decoded datum identifies the wire branch
        val st = dt.asInstanceOf[StructType]
        val matchers = branches.map(b => (v: Any) => matchesBranch(b, v)).toArray
        val convs = branches.indices.map(i =>
          fromAvroConverter(branches(i), st(i).dataType)).toArray
        v => {
          if (v == null) null
          else {
            val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(convs.length)
            var i = 0; var done = false
            while (i < convs.length && !done) {
              if (matchers(i)(v)) { row.update(i, convs(i)(v)); done = true }
              i += 1
            }
            if (!done) throw new IllegalArgumentException(
              s"datum ${v.getClass} matches no branch of $s")
            row
          }
        }
      }
    case Schema.Type.STRING | Schema.Type.ENUM =>
      v => if (v == null) null else UTF8String.fromString(v.toString)
    case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
         Schema.Type.DOUBLE | Schema.Type.BOOLEAN =>
      v => v
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      // BYTES arrives as a ByteBuffer; FIXED as GenericFixed (clone its
      // backing array — Avro reuses it across records)
      v => v match {
        case null => null
        case bb: java.nio.ByteBuffer =>
          val arr = new Array[Byte](bb.remaining); bb.duplicate.get(arr); arr
        case gf: org.apache.avro.generic.GenericFixed => gf.bytes.clone()
        case other => throw new IllegalArgumentException(
          s"unexpected datum ${other.getClass} for $s")
      }
    case Schema.Type.RECORD =>
      val st = dt.asInstanceOf[StructType]
      val convs = s.getFields.asScala.toArray.zipWithIndex.map { case (f, i) =>
        fromAvroConverter(f.schema, st(i).dataType) }
      v => if (v == null) null else {
        val rec = v.asInstanceOf[GenericRecord]
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(convs.length)
        var i = 0
        while (i < convs.length) { row.update(i, convs(i)(rec.get(i))); i += 1 }
        row
      }
    case Schema.Type.MAP =>
      val mt = dt.asInstanceOf[MapType]
      val valConv = fromAvroConverter(s.getValueType, mt.valueType)
      v => if (v == null) null else {
        val m = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
        // deterministic key order so downstream hashing is stable
        val entries = m.asScala.toSeq.sortBy(_._1.toString)
        new ArrayBasedMapData(
          new GenericArrayData(entries.map(e => UTF8String.fromString(e._1.toString)).toArray[Any]),
          new GenericArrayData(entries.map(e => valConv(e._2)).toArray[Any]))
      }
    case Schema.Type.ARRAY =>
      val at = dt.asInstanceOf[ArrayType]
      val elemConv = fromAvroConverter(s.getElementType, at.elementType)
      v => if (v == null) null else {
        val l = v.asInstanceOf[java.util.List[AnyRef]]
        val out = new Array[Any](l.size)
        var i = 0
        while (i < out.length) { out(i) = elemConv(l.get(i)); i += 1 }
        new GenericArrayData(out)
      }
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def matchesBranch(s: Schema, v: Any): Boolean = s.getType match {
    case Schema.Type.DOUBLE  => v.isInstanceOf[java.lang.Double]
    case Schema.Type.FLOAT   => v.isInstanceOf[java.lang.Float]
    case Schema.Type.INT     => v.isInstanceOf[java.lang.Integer]
    case Schema.Type.LONG    => v.isInstanceOf[java.lang.Long]
    case Schema.Type.BOOLEAN => v.isInstanceOf[java.lang.Boolean]
    case Schema.Type.STRING  => v.isInstanceOf[Utf8] || v.isInstanceOf[String]
    case Schema.Type.RECORD  =>
      v.isInstanceOf[GenericRecord] &&
        v.asInstanceOf[GenericRecord].getSchema.getFullName == s.getFullName
    case Schema.Type.MAP     => v.isInstanceOf[java.util.Map[_, _]]
    case Schema.Type.ARRAY   => v.isInstanceOf[java.util.List[_]]
    case Schema.Type.ENUM    =>
      v.isInstanceOf[org.apache.avro.generic.GenericEnumSymbol[_]] ||
        v.isInstanceOf[org.apache.avro.generic.GenericData.EnumSymbol]
    case Schema.Type.BYTES   => v.isInstanceOf[java.nio.ByteBuffer]
    case Schema.Type.FIXED   =>
      v.isInstanceOf[org.apache.avro.generic.GenericFixed]
    case Schema.Type.NULL    => v == null
    case _ => false
  }

  // ---------------------------------------------------------- expressions

  /** `to_avro(struct)` → Avro binary body (UNframed). The input struct
    * must have the catalystType(schema) shape in schema field order.
    */
  case class AvroEncodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
    @transient private lazy val inType = catalystType(schema)
    @transient private lazy val writer = new GenericDatumWriter[AnyRef](schema)
    @transient private lazy val conv = toAvroConverter(schema, inType)
    // per-thread stream + encoder reuse: binaryEncoder(out, reuse)
    // re-targets the cached encoder instead of allocating per row
    @transient private lazy val perThread =
      ThreadLocal.withInitial[(ByteArrayOutputStream, Array[org.apache.avro.io.BinaryEncoder])](
        () => (new ByteArrayOutputStream(512), new Array[org.apache.avro.io.BinaryEncoder](1)))
    override protected def nullSafeEval(input: Any): Any = {
      val datum = conv(input)
      val (bos, encHolder) = perThread.get()
      bos.reset()
      encHolder(0) = EncoderFactory.get.binaryEncoder(bos, encHolder(0))
      writer.write(datum, encHolder(0))
      encHolder(0).flush()
      bos.toByteArray
    }
    override protected def withNewChildInternal(newChild: Expression): AvroEncodeExpr =
      copy(child = newChild)
  }

  /** `from_avro(binary)` → struct (input = UNframed Avro body).
    *
    * `writerSchemaJson` enables schema RESOLUTION (the registry's
    * BACKWARD compatibility contract, schema_registry.py:244-268): data
    * written with an older schema decodes under the reader schema with
    * field defaults filled in — exactly how the reference's v2 schema
    * ("new in v2" fields, iot_sensor_reading.avsc) reads v1 payloads.
    */
  case class AvroDecodeExpr(child: Expression, schemaJson: String,
      writerSchemaJson: Option[String] = None)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
    @transient private lazy val outType = catalystType(schema)
    @transient private lazy val reader = new GenericDatumReader[AnyRef](
      writerSchemaJson.map(new Schema.Parser().parse(_)).getOrElse(schema), schema)
    @transient private lazy val conv = fromAvroConverter(schema, outType)
    @transient private lazy val perThread =
      ThreadLocal.withInitial[Array[org.apache.avro.io.BinaryDecoder]](
        () => new Array[org.apache.avro.io.BinaryDecoder](1))
    override def dataType: DataType = outType
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val decHolder = perThread.get()
      decHolder(0) = DecoderFactory.get.binaryDecoder(bytes, decHolder(0))
      conv(reader.read(null, decHolder(0)))
    }
    override protected def withNewChildInternal(newChild: Expression): AvroDecodeExpr =
      copy(child = newChild)
  }

  // ------------------------------------------------------------- columns

  def toAvro(c: Column, schemaJson: String): Column =
    ColumnBridge.column(AvroEncodeExpr(ColumnBridge.expression(c), schemaJson))

  def fromAvro(c: Column, schemaJson: String): Column =
    ColumnBridge.column(AvroDecodeExpr(ColumnBridge.expression(c), schemaJson))

  /** from_avro with schema resolution: bytes written under
    * `writerSchemaJson` decode into the `readerSchemaJson` shape,
    * missing fields taking their reader-schema defaults.
    */
  def fromAvroEvolved(c: Column, readerSchemaJson: String,
      writerSchemaJson: String): Column =
    ColumnBridge.column(AvroDecodeExpr(ColumnBridge.expression(c),
      readerSchemaJson, Some(writerSchemaJson)))

  /** Confluent frame bytes for a schema id: magic 0x00 + int32 BE. */
  def frameBytes(schemaId: Int): Array[Byte] =
    Array[Byte](0,
      (schemaId >>> 24).toByte, (schemaId >>> 16).toByte,
      (schemaId >>> 8).toByte, schemaId.toByte)

  /** Prepend the 5-byte Confluent frame (pure Column concat). */
  def frame(body: Column, schemaId: Int): Column =
    concat(lit(frameBytes(schemaId)), body)

  /** Strip the 5-byte frame: the reference mapping's
    * `substring($"value", 6, …)` (SURVEY.md §7.4#1 / schema_registry.py:73-77).
    */
  def unframe(value: Column): Column =
    substring(value, 6, Int.MaxValue - 5)

  /** Schema id from bytes 2-5 (big-endian int32), as an INT column. */
  def frameSchemaId(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast(IntegerType)

  /** Magic-byte check: byte 1 must be 0x00. */
  def frameMagicOk(value: Column): Column =
    substring(value, 1, 1) === lit(Array[Byte](0))
}
