package graft

import java.nio.file.Files

import graft.pipeline.Ingest
import graft.streaming.{JsonGateway, KafkaWire, Metrics, Streams}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §3.1 as ONE streaming chain, end to end — the reference's full
  * pipeline (README:7-15) rather than its segments:
  *
  *   gateway JSON lines → schema-checked parse → fan-out / clamp /
  *   validate / anomaly-flag → keyed Avro wire records (Confluent
  *   frame) → replay transport → frame-strip + Avro decode →
  *   observability counters → transactional idempotent sink.
  *
  * Parity oracle: the identical raw rows pushed through the BATCH
  * `Ingest.ingest` DAG. The final stored table must match row-for-row
  * (the Avro wire is lossless for this schema), and the metrics
  * registry's counters must equal the true row counts.
  */
class E2EPipelineSpec extends SparkSpec {

  test("§3.1 one streaming chain: JSON gateway → ingest → Avro wire → decode → sink ≡ batch DAG; counters exact") {
    val jsonDir = Files.createTempDirectory("gw_json").toString + "/lines"
    val recDir  = Files.createTempDirectory("wire_records").toString + "/records"
    val ckpt1   = Files.createTempDirectory("ckpt_produce").toString
    val ckpt2   = Files.createTempDirectory("ckpt_consume").toString
    val outDir  = Files.createTempDirectory("sink_out").toString + "/readings"

    // fixed ingest clock so streaming and batch runs see the same "now"
    val now = lit("2024-01-01 12:00:00").cast("timestamp_ntz")
    val raw = Ingest.generateRaw(spark, nDevices = 6, nPerDevice = 40)
    raw.toJSON.coalesce(1).write.text(jsonDir)

    // ---- producer leg: gateway source → ingest DAG → keyed Avro records
    val gateway = JsonGateway.readJsonStream(spark,
      KafkaWire.Transport("file", topic = jsonDir))
    val (valid, _) = Ingest.ingest(spark, gateway, now)
    val q1 = KafkaWire.writeRecordStream(KafkaWire.toKafkaRecords(valid),
      KafkaWire.Transport("parquet", topic = recDir), ckpt1)
    q1.processAllAvailable(); q1.stop()

    // ---- consumer leg: records → decode → observe → transactional sink
    val (reg, listener) = Metrics.attach(spark, "e2e-pipeline")
    val decoded = KafkaWire.fromKafkaRecords(
      KafkaWire.readRecordStream(spark, KafkaWire.Transport("parquet", topic = recDir)))
    val q2 = Metrics.observedReadings(decoded.drop("key_device_id"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt2)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Streams.commitBatch(batch, outDir, batchId,
          keys = Seq("device_id", "ts"), epoch = "run1-")
      }
      .start()
    q2.processAllAvailable(); q2.stop()
    spark.streams.removeListener(listener)

    // ---- batch twin over the same raw rows
    val (batchValid, batchInvalid) = Ingest.ingest(spark, raw, now)

    // comparable projection: map compared as sorted entries (Avro map
    // round-trip does not preserve order); nulls dropped on the batch
    // side exactly as the wire encoder does
    def norm(df: DataFrame): Seq[String] = df.select(
        col("device_id"), col("device_type"), col("ts"), col("value"),
        col("unit"), col("location"), col("battery_level"),
        col("signal_strength"),
        coalesce(col("is_anomaly"), lit(false)).as("is_anomaly"),
        col("status"), array_join(col("tags"), ",").as("tags"),
        to_json(array_sort(map_entries(
          map_filter(col("device_metadata"), (_, v) => v.isNotNull))))
          .as("device_metadata"))
      .collect().map(_.toString).sorted.toSeq

    val stored = spark.read.parquet(outDir).drop("event_date")
    val streamed = norm(stored)
    val batched = norm(batchValid)
    assert(streamed.nonEmpty)
    assert(streamed == batched)

    // a NEW sink incarnation (fresh checkpoint ⇒ fresh batch ids and a
    // different epoch) re-delivers every record against the same table:
    // its batches must not match the old incarnation's commit markers,
    // and the content-keyed anti-join must keep the table exactly-once
    val ckpt3 = Files.createTempDirectory("ckpt_replay").toString
    val q3 = KafkaWire.fromKafkaRecords(
        KafkaWire.readRecordStream(spark,
          KafkaWire.Transport("parquet", topic = recDir)))
      .drop("key_device_id")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt3)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Streams.commitBatch(batch, outDir, batchId,
          keys = Seq("device_id", "ts"), epoch = "run2-")
      }
      .start()
    q3.processAllAvailable(); q3.stop()
    assert(norm(spark.read.parquet(outDir).drop("event_date")) == batched)

    // counters mirror the true row counts (observation rides the plan)
    val n = batchValid.count()
    val anomalies = batchValid.filter(col("is_anomaly")).count()
    assert(batchInvalid.count() == 0) // generator emits only valid rows
    assert(reg.counter(Metrics.MessagesReceived) == n)
    assert(reg.counter(Metrics.AnomaliesDetected) == anomalies)
    assert(anomalies > 0) // the generator's ~5% spike injection reached T9
    assert(reg.counter(Metrics.ValidationFailures, "failure_type=null_field") == 0)
    assert(reg.counter(Metrics.MessagesProcessed) == n)
  }
}
