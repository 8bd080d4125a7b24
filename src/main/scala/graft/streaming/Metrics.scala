package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Observability layer mirroring the reference's Prometheus taxonomy
  * (/root/reference/src/utils/metrics.py:17-164 base counters;
  * 229-360 consumer/sink subclasses) on Spark-native machinery:
  *
  *  - data-plane counters come from `Dataset.observe` aggregate
  *    expressions — computed INSIDE the existing job per micro-batch,
  *    zero extra passes, exactly-once per batch (no accumulator
  *    double-count on task retry);
  *  - control-plane timings/gauges come from a StreamingQueryListener
  *    reading each StreamingQueryProgress (batch duration, input rate,
  *    sink rows, state size, watermark) — the direct analog of the
  *    reference's middleware wrapping its consumer poll loop;
  *  - everything lands in a MetricsRegistry exposed as both a raw
  *    snapshot and a (metric, service, labels, value) DataFrame — the
  *    scrape surface a Prometheus exporter would serve.
  *
  * Scale shape: observed metrics are map-side aggregates merged on the
  * driver (bytes per batch); the registry is driver-local state of
  * bounded cardinality (metric × label). Nothing here touches the data
  * path beyond the observe() expressions.
  */
object Metrics {

  /** Counter/gauge registry keyed by (name, labels). Histogram-style
    * metrics are kept as _count/_sum/_max triples, the standard
    * Prometheus summary reduction.
    */
  final class MetricsRegistry(val service: String) extends Serializable {
    private val counters = new ConcurrentHashMap[(String, String), Long]()
    private val gauges = new ConcurrentHashMap[(String, String), Double]()

    def inc(name: String, by: Long = 1L, labels: String = ""): Unit =
      counters.merge((name, labels), by, (a, b) => a + b)

    def setGauge(name: String, v: Double, labels: String = ""): Unit =
      gauges.put((name, labels), v)

    /** Observe one histogram sample as _count/_sum/_max. */
    def observeHist(name: String, v: Double, labels: String = ""): Unit = {
      inc(s"${name}_count", 1L, labels)
      counters.merge((s"${name}_sum", labels), math.round(v), (a, b) => a + b)
      gauges.merge((s"${name}_max", labels), v, (a, b) => math.max(a, b))
    }

    def counter(name: String, labels: String = ""): Long =
      counters.getOrDefault((name, labels), 0L)

    def gauge(name: String, labels: String = ""): Double =
      gauges.getOrDefault((name, labels), 0.0)

    def snapshot: Map[(String, String), Double] =
      counters.asScala.map { case (k, v) => k -> v.toDouble }.toMap ++
        gauges.asScala.toMap

    /** The scrape surface: one row per (metric, labels). */
    def report(spark: SparkSession): DataFrame = {
      import spark.implicits._
      snapshot.toSeq
        .map { case ((name, labels), v) => (name, service, labels, v) }
        .sortBy(r => (r._1, r._3))
        .toDF("metric", "service", "labels", "value")
    }
  }

  /** Names shared with the reference taxonomy (metrics.py:44-103). */
  val MessagesReceived = "iot_messages_received_total"
  val MessagesProcessed = "iot_messages_processed_total"
  val MessagesFailed = "iot_messages_failed_total"
  val AnomaliesDetected = "iot_anomaly_detected_total"
  val ValidationFailures = "iot_validation_failures_total"
  val BatchDuration = "iot_processing_duration_ms"
  val InsertRows = "sink_records_inserted_total"
  val InsertBatchSize = "sink_batch_insert_size"
  val InputRate = "iot_input_rows_per_second"
  val StateRows = "iot_state_rows"
  val ConnectionStatus = "iot_connection_status"
  val ObservationName = "graft_pipeline"

  /** Attach the data-quality observation to an events-shaped DataFrame
    * (ts, user_id, event_type, value). The expressions ride the existing
    * plan; the listener picks the results out of each progress event.
    */
  def observed(events: DataFrame): DataFrame =
    events.observe(ObservationName,
      count(lit(1)).as("messages_received"),
      count_if(col("event_type") === "error").as("anomalies"),
      count_if(col("value").isNull || col("user_id").isNull ||
        col("ts").isNull).as("validation_failures"))

  /** The readings-shaped twin of `observed` for the sensor ingest DAG
    * (post-decode side of the Avro wire): same counter taxonomy, keyed
    * off the canonical readings schema (device_id, ts, value,
    * is_anomaly).
    */
  def observedReadings(readings: DataFrame): DataFrame =
    readings.observe(ObservationName,
      count(lit(1)).as("messages_received"),
      count_if(col("is_anomaly")).as("anomalies"),
      count_if(col("value").isNull || col("device_id").isNull ||
        col("ts").isNull).as("validation_failures"))

  /** Control-plane listener: one registry update per micro-batch
    * progress + connection status on start/stop (the reference's
    * consumer-loop middleware, metrics.py:229-286).
    */
  final class MetricsListener(registry: MetricsRegistry)
      extends StreamingQueryListener {

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit =
      registry.setGauge(ConnectionStatus, 1.0, s"query=${e.name}")

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      registry.observeHist(BatchDuration, p.batchDuration.toDouble)
      registry.setGauge(InputRate, p.processedRowsPerSecond)
      val sinkRows = p.sink.numOutputRows
      if (sinkRows > 0) {
        registry.inc(InsertRows, sinkRows)
        registry.observeHist(InsertBatchSize, sinkRows.toDouble)
      }
      val stateRows = p.stateOperators.map(_.numRowsTotal).sum
      registry.setGauge(StateRows, stateRows.toDouble)
      p.observedMetrics.asScala.get(ObservationName).foreach { row =>
        val received = row.getAs[Long]("messages_received")
        val failures = row.getAs[Long]("validation_failures")
        registry.inc(MessagesReceived, received)
        registry.inc(ValidationFailures, failures, "failure_type=null_field")
        registry.inc(MessagesProcessed, received - failures)
        registry.inc(AnomaliesDetected, row.getAs[Long]("anomalies"))
      }
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      registry.setGauge(ConnectionStatus, 0.0)
      e.exception.foreach(err =>
        registry.inc(MessagesFailed, 1L,
          s"error_type=${err.takeWhile(_ != ':')}"))
    }
  }

  /** Wire a registry + listener into a session; returns both so callers
    * can detach with `spark.streams.removeListener`.
    */
  def attach(spark: SparkSession, service: String): (MetricsRegistry, MetricsListener) = {
    val reg = new MetricsRegistry(service)
    val listener = new MetricsListener(reg)
    spark.streams.addListener(listener)
    (reg, listener)
  }
}
