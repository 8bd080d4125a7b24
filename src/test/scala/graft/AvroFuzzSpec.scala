package graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._
import scala.util.Random

import graft.serde.AvroWire
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Seeded randomized round-trips for the Avro wire in BOTH directions
  * against Avro's own codec — beyond the hand-picked AvroSpec cases,
  * this sweeps string/unicode content, null-branch choices, map/array
  * sizes and enum symbols. Seeds are fixed: failures reproduce.
  */
class AvroFuzzSpec extends SparkSpec {

  private val schema = new Schema.Parser().parse(AvroWire.sensorSchemaJson)
  private val locSchema = schema.getField("location").schema
  private val statusSchema = schema.getField("status").schema
  private val symbols = Seq("ACTIVE", "IDLE", "MAINTENANCE", "ERROR", "UNKNOWN")

  private def randString(rnd: Random): Utf8 = {
    val pool = "abc XYZ09_°µü❄€"
    new Utf8((0 until rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
  }

  private def randRecord(rnd: Random): GenericRecord = {
    val loc = new GenericData.Record(locSchema)
    loc.put("latitude", rnd.nextDouble() * 180 - 90)
    loc.put("longitude", rnd.nextDouble() * 360 - 180)
    loc.put("building", if (rnd.nextBoolean()) randString(rnd) else null)
    loc.put("floor", if (rnd.nextBoolean()) Int.box(rnd.nextInt(50) - 2) else null)
    loc.put("zone", if (rnd.nextBoolean()) randString(rnd) else null)
    loc.put("room", if (rnd.nextBoolean()) randString(rnd) else null)
    val rec = new GenericData.Record(schema)
    rec.put("device_id", randString(rnd))
    rec.put("device_type", randString(rnd))
    rec.put("timestamp", randString(rnd))
    rec.put("value", rnd.nextInt(3) match {
      case 0 => Double.box(rnd.nextDouble() * 1e6 - 5e5)
      case 1 => Int.box(rnd.nextInt())
      case _ => null
    })
    rec.put("unit", randString(rnd))
    rec.put("location", loc)
    rec.put("battery_level", if (rnd.nextBoolean()) Double.box(rnd.nextDouble() * 100) else null)
    rec.put("signal_strength", if (rnd.nextBoolean()) Double.box(-rnd.nextDouble() * 120) else null)
    rec.put("is_anomaly", Boolean.box(rnd.nextBoolean()))
    rec.put("firmware_version", if (rnd.nextBoolean()) randString(rnd) else null)
    rec.put("device_metadata",
      if (rnd.nextBoolean()) {
        val m = new java.util.HashMap[Utf8, Utf8]()
        (0 until rnd.nextInt(4)).foreach(i => m.put(new Utf8(s"k$i"), randString(rnd)))
        m
      } else null)
    rec.put("status", new GenericData.EnumSymbol(statusSchema, symbols(rnd.nextInt(symbols.length))))
    val tags = new java.util.ArrayList[AnyRef]()
    (0 until rnd.nextInt(5)).foreach(_ => tags.add(randString(rnd)))
    rec.put("tags", tags)
    rec.put("maintenance_date", if (rnd.nextBoolean()) randString(rnd) else null)
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

  private def records = (1 to 100).map(seed => randRecord(new Random(seed)))

  /** expected field views used to compare a decoded Row to the record */
  private def str(v: AnyRef): String = if (v == null) null else v.toString

  test("raw encode → expression decode: 100 seeded random records match field-wise") {
    import spark.implicits._
    val recs = records
    val rows = recs.map(rawEncode).toDF("body")
      .select(AvroWire.fromAvro(col("body"), AvroWire.sensorSchemaJson).as("r"))
      .select("r.*").collect()
    recs.zip(rows).foreach { case (rec, row) =>
      assert(row.getAs[String]("device_id") == str(rec.get("device_id")))
      assert(row.getAs[String]("timestamp") == str(rec.get("timestamp")))
      rec.get("value") match {
        case null => assert(row.isNullAt(row.fieldIndex("value")))
        case d: java.lang.Double =>
          assert(row.getAs[Row]("value").getAs[java.lang.Double]("member0") == d)
        case i: java.lang.Integer =>
          assert(row.getAs[Row]("value").getAs[java.lang.Integer]("member1") == i)
      }
      val loc = row.getAs[Row]("location")
      val recLoc = rec.get("location").asInstanceOf[GenericRecord]
      assert(loc.getAs[java.lang.Double]("latitude") == recLoc.get("latitude"))
      assert(loc.getAs[String]("room") == str(recLoc.get("room")))
      rec.get("device_metadata") match {
        case null => assert(row.isNullAt(row.fieldIndex("device_metadata")))
        case m: java.util.Map[_, _] =>
          val got = row.getMap[String, String](row.fieldIndex("device_metadata")).toMap
          assert(got == m.asScala.map { case (k, v) => (k.toString, v.toString) }.toMap)
      }
      assert(row.getAs[String]("status") == str(rec.get("status")))
      val tags = rec.get("tags").asInstanceOf[java.util.List[AnyRef]].asScala.map(_.toString)
      assert(row.getSeq[String](row.fieldIndex("tags")).toSeq == tags.toSeq)
      assert(row.getAs[String]("maintenance_date") == str(rec.get("maintenance_date")))
    }
  }

  test("expression encode → raw decode: 100 seeded random records equal the originals") {
    val recs = records
    // mirror each record as an external Row in catalyst shape
    def asRow(rec: GenericRecord): Row = {
      val loc = rec.get("location").asInstanceOf[GenericRecord]
      val valueRow = rec.get("value") match {
        case null => null
        case d: java.lang.Double => Row(d, null)
        case i: java.lang.Integer => Row(null, i)
      }
      Row(
        str(rec.get("device_id")), str(rec.get("device_type")), str(rec.get("timestamp")),
        valueRow, str(rec.get("unit")),
        Row(loc.get("latitude"), loc.get("longitude"), str(loc.get("building")),
          loc.get("floor"), str(loc.get("zone")), str(loc.get("room"))),
        rec.get("battery_level"), rec.get("signal_strength"), rec.get("is_anomaly"),
        str(rec.get("firmware_version")),
        rec.get("device_metadata") match {
          case null => null
          case m: java.util.Map[_, _] =>
            m.asScala.map { case (k, v) => (k.toString, v.toString) }.toMap
        },
        str(rec.get("status")),
        rec.get("tags").asInstanceOf[java.util.List[AnyRef]].asScala.map(_.toString).toSeq,
        str(rec.get("maintenance_date")))
    }
    val df = spark.createDataFrame(
      recs.map(asRow).asJava, AvroWire.sensorCatalystType)
    val bodies = df
      .select(AvroWire.toAvro(
        org.apache.spark.sql.functions.struct(df.columns.map(col): _*),
        AvroWire.sensorSchemaJson).as("body"))
      .collect().map(_.getAs[Array[Byte]]("body"))
    recs.zip(bodies).foreach { case (rec, body) =>
      assert(rawDecode(body) == rec, s"mismatch for $rec")
    }
  }
}
