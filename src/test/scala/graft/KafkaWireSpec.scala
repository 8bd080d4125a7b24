package graft

import java.nio.file.Files

import graft.pipeline.Ingest
import graft.streaming.KafkaWire
import org.apache.spark.sql.functions._

class KafkaWireSpec extends SparkSpec {

  private def readings = {
    val raw = Ingest.generateRaw(spark, 4, 25)
    val (valid, _) = Ingest.ingest(spark, raw,
      lit("2024-01-01 00:02:00").cast("timestamp_ntz"))
    valid
  }

  test("record projection: key is the device_id bytes (keyed partitioning S2)") {
    val rec = KafkaWire.toKafkaRecords(readings).limit(20).collect()
    rec.foreach { r =>
      val key = new String(r.getAs[Array[Byte]]("key"), "UTF-8")
      assert(key.nonEmpty && key.contains("_")) // derived <gateway>_<metric> id
      val value = r.getAs[Array[Byte]]("value")
      assert(value(0) == 0x00) // Confluent magic
    }
  }

  test("wire parity: readings → framed records → decoded readings") {
    val in = readings
    val back = KafkaWire.fromKafkaRecords(KafkaWire.toKafkaRecords(in))
    assert(back.count() == in.count())
    // key and payload device id agree after the round trip
    assert(back.filter(col("key_device_id") =!= col("device_id")).count() == 0)
    def proj(df: org.apache.spark.sql.DataFrame) = df.select(
        col("device_id"), col("device_type"), col("ts"), col("value"),
        col("unit"), col("location.latitude"), col("location.floor"),
        col("battery_level"), col("signal_strength"), col("is_anomaly"),
        col("status"), col("tags"))
      .orderBy(col("device_id"), col("ts"), col("value"))
      .collect().map(_.toString)
    assert(proj(back).sameElements(proj(in)))
  }

  test("replay transport drives the same decode DAG as a stream") {
    val recDir = Files.createTempDirectory("kw_records").toString + "/t"
    KafkaWire.toKafkaRecords(readings).write.parquet(recDir)
    val stream = KafkaWire.readRecordStream(spark,
      KafkaWire.Transport("parquet", topic = recDir))
    assert(stream.isStreaming)
    val q = KafkaWire.fromKafkaRecords(stream)
      .writeStream.format("memory").queryName("kw_parity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("kw_parity").count() == readings.count())
      assert(spark.table("kw_parity")
        .filter(col("device_type") === "temperature_sensor").count() > 0)
    } finally q.stop()
  }

  test("unknown transport kinds fail loudly") {
    intercept[IllegalArgumentException] {
      KafkaWire.readRecordStream(spark, KafkaWire.Transport("carrier-pigeon"))
    }
  }
}
