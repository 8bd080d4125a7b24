package graft

import java.nio.file.Files

import graft.pipeline.Ingest
import graft.streaming.{JsonGateway, KafkaWire}
import org.apache.spark.sql.functions._

class JsonGatewaySpec extends SparkSpec {

  test("JSON payload parse round-trips the raw gateway frame") {
    val raw = Ingest.generateRaw(spark, 3, 20)
    val parsed = JsonGateway.parse(raw.toJSON.toDF("value"))
    assert(parsed.schema == JsonGateway.gatewaySchema)
    def proj(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("device_id"), col("timestamp"))
      .collect().map(_.toString)
    assert(proj(parsed).sameElements(proj(raw.select(
      JsonGateway.gatewaySchema.fieldNames.map(col): _*))))
  }

  test("malformed lines become all-null rows (dead-letterable), not failures") {
    import spark.implicits._
    val parsed = JsonGateway.parse(Seq("{not json", "", "42").toDF("value"))
    assert(parsed.count() == 3)
    assert(parsed.filter(col("device_id").isNull).count() == 3)
  }

  test("file replay transport streams payload lines through the ingest DAG") {
    val dir = Files.createTempDirectory("gw_json").toString + "/lines"
    val raw = Ingest.generateRaw(spark, 3, 20)
    raw.toJSON.toDF("value").coalesce(1).write.text(dir)
    val stream = JsonGateway.readJsonStream(spark, KafkaWire.Transport("file", topic = dir))
    assert(stream.isStreaming)
    val (valid, _) = Ingest.ingest(spark, stream,
      lit("2024-01-01 00:02:00").cast("timestamp_ntz"))
    val q = valid.writeStream.format("memory").queryName("gw_ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("gw_ingest")
      // batch twin over the same payloads
      val (batchValid, _) = Ingest.ingest(spark, raw,
        lit("2024-01-01 00:02:00").cast("timestamp_ntz"))
      assert(got.count() == batchValid.count())
      assert(got.filter(col("device_type") === "temperature_sensor").count() ==
        batchValid.filter(col("device_type") === "temperature_sensor").count())
    } finally q.stop()
  }
}
