package graft

import graft.streaming.{Metrics, Streams}
import graft.streaming.Streams.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Metrics layer over a real streaming run of the alerting DAG:
  * observe()-sourced counters must equal the exact input facts, and the
  * listener must record batch timings / sink rows / connection status.
  */
class MetricsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def await(deadlineMs: Long = 20000)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < deadlineMs) Thread.sleep(50)
    cond
  }

  test("streaming run populates the reference metric taxonomy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (reg, listener) = Metrics.attach(spark, "consumer")
    val mem = MemoryStream[EventRow]
    val q = Streams.alerts(Metrics.observed(mem.toDF()))
      .writeStream.format("memory").queryName("metrics_alerts")
      .outputMode("append").start()
    try {
      mem.addData(
        EventRow(0, ts("2024-01-01 00:10:00"), 1, "click", 10.0),
        EventRow(1, ts("2024-01-01 00:20:00"), 1, "error", 500.0),
        EventRow(2, ts("2024-01-01 00:25:00"), 2, "error", 100.0),
        EventRow(3, ts("2024-01-01 00:30:00"), 2, "view", 475.0))
      q.processAllAvailable()
      mem.addData(EventRow(4, ts("2024-01-01 01:00:00"), 3, "view", 1.0))
      q.processAllAvailable()

      // listener events are async — wait for the progress to land
      assert(await()(reg.counter(Metrics.MessagesReceived) == 5L),
        s"received=${reg.counter(Metrics.MessagesReceived)}")
      // 2 'error' rows in batch 1, none in batch 2
      assert(reg.counter(Metrics.AnomaliesDetected) == 2L)
      // EventRow fields are non-nullable — no validation failures
      assert(reg.counter(Metrics.ValidationFailures,
        "failure_type=null_field") == 0L)
      assert(reg.counter(Metrics.MessagesProcessed) == 5L)
      // alerts sink saw 3 rows (CRITICAL + WARNING + HIGH_VALUE)
      assert(await()(reg.counter(Metrics.InsertRows) == 3L),
        s"inserted=${reg.counter(Metrics.InsertRows)}")
      // batch histogram: at least the two data batches, positive duration
      assert(reg.counter(s"${Metrics.BatchDuration}_count") >= 2L)
      assert(reg.counter(s"${Metrics.BatchDuration}_sum") > 0L)
      assert(reg.gauge(s"${Metrics.BatchDuration}_max") > 0.0)
      // connected while running
      assert(reg.gauge(Metrics.ConnectionStatus, "query=metrics_alerts") == 1.0)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
    // report surface: one row per metric, service label carried
    val rep = reg.report(spark)
    assert(rep.columns.toSeq == Seq("metric", "service", "labels", "value"))
    val asMap = rep.collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getDouble(3)).toMap
    assert(asMap((Metrics.MessagesReceived, "")) == 5.0)
    assert(rep.filter(col("service") =!= "consumer").count() == 0)
  }

  test("terminated query flips connection status; failure increments failed counter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (reg, listener) = Metrics.attach(spark, "consumer")
    val mem = MemoryStream[EventRow]
    val q = Streams.alerts(mem.toDF())
      .writeStream.format("memory").queryName("metrics_term")
      .outputMode("append").start()
    try {
      mem.addData(EventRow(0, ts("2024-01-01 00:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(await()(reg.gauge(Metrics.ConnectionStatus) == 0.0))
    // clean stop → no failure recorded
    assert(reg.counter(Metrics.MessagesFailed) == 0L)
    spark.streams.removeListener(listener)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
