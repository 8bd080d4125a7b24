package graft.operators

import graft.Cols._
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-level transform operators (SURVEY.md §2.2) expressed over the
  * `events` table. Each is a pure DataFrame→DataFrame function — narrow
  * (no shuffle), fully codegen'd, so it composes into the ingest
  * pipeline at any scale.
  */
object EventOps {

  /** T1 fan-out (ruuvitag_adapter.py:229-385): one event row → N derived
    * metric readings with derived ids (`<id>_<metric>`), via explode of a
    * built struct array — the Spark idiom for the reference's declarative
    * sensor_mapping unpivot.
    */
  def fanout(e: DataFrame): DataFrame =
    e.select(
        col("event_id"), col("ts"), col("user_id"),
        explode(array(
          struct(lit("value").as("metric"), col("value").as("metric_value")),
          struct(lit("props_k").as("metric"),
            get_json_object(col("props"), "$.k").cast(DoubleType).as("metric_value"))
        )).as("m"))
      .select(
        concat(col("user_id").cast(StringType), lit("_"), col("m.metric")).as("device_id"),
        col("event_id"), col("ts"),
        col("m.metric").as("metric"),
        col("m.metric_value").as("metric_value"))
      .filter(col("metric_value").isNotNull)

  def t1Fanout(s: SparkSession, dir: String): DataFrame =
    fanout(Tables.events(s, dir)).orderBy(col("event_id"), col("metric"))

  /** T3 safe numeric cast (adapter:439-444): cast-or-zero. */
  def safeDouble(c: Column): Column = coalesce(c.cast(DoubleType), lit(0.0))

  /** T4 battery-%-from-value (adapter:446-468): piecewise linear map of a
    * bounded measurement into [0,100]. Pure double arithmetic (subtract +
    * ×0.25) — bit-identical in any engine; no rounding step needed.
    */
  def batteryPct(v: Column): Column =
    when(v <= 50.0, lit(0.0))
      .when(v >= 450.0, lit(100.0))
      .otherwise((v - lit(50.0)) * lit(0.25))

  def t4BatteryPct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("value"), batteryPct(col("value")).as("battery_pct"))
      .orderBy(col("event_id"))

  /** T5 timestamp normalization (ruuvitag_adapter.py:407-437): accept
    * epoch seconds (int or string), device-uptime-relative values
    * (small ints → "now"), or ISO strings; anything unparseable → "now".
    * `now` is a column so batch backfills can pin it deterministically.
    */
  def normalizeTs(raw: Column, now: Column): Column = {
    val asLong = raw.cast(LongType)
    when(asLong.isNotNull && asLong >= 10000000L,
        timestamp_seconds(asLong).cast("timestamp_ntz"))
      .when(asLong.isNotNull, now) // uptime-relative, not an absolute time
      .otherwise(coalesce(to_timestamp(raw).cast("timestamp_ntz"), now))
  }

  /** T5 as a registered query: derive raw timestamp strings exercising
    * all four normalizeTs branches from each events row (epoch-seconds
    * string, device-uptime small int, ISO string, unparseable), pin
    * `now`, normalize.
    */
  def t5NormalizeTs(s: SparkSession, dir: String): DataFrame = {
    val eid = col("event_id")
    val raw =
      when(eid % 4 === 0, (lit(1704067200L) + eid % 100000L).cast(StringType))
        .when(eid % 4 === 1, (eid % 1000L).cast(StringType))
        .when(eid % 4 === 2, concat(
          lit("2024-01-"), lpad(((eid % 28) + 1).cast(StringType), 2, "0"),
          lit(" 0"), (eid % 10).cast(StringType), lit(":30:00")))
        .otherwise(lit("garbage"))
    Tables.events(s, dir)
      .select(col("event_id"), raw.as("raw_ts"),
        normalizeTs(raw, tsLit("2024-01-15")).as("norm_ts"))
      .orderBy(col("event_id"))
  }

  /** T6 timestamp sanity clamp (timescaledb_sink.py:152-161): clamp
    * out-of-line timestamps into a tolerated window around "now" (frozen
    * here to a fixed instant for determinism).
    */
  def clampTs(ts: Column, lo: Column, hi: Column): Column =
    when(ts < lo, lo).when(ts > hi, hi).otherwise(ts)

  def t6ClampTs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("ts"),
        clampTs(col("ts"), tsLit("2024-01-05"), tsLit("2024-01-25")).as("ts_clamped"))
      .withColumn("was_clamped", col("ts") =!= col("ts_clamped"))
      .orderBy(col("event_id"))

  /** T7/T8 validation split (adapter:387-405, models.py:171-197): the
    * valid branch of required-field + domain validation, counted per type.
    */
  def validFilter: Column =
    col("user_id").isNotNull && col("event_type").isNotNull &&
      col("ts").isNotNull && col("value").isNotNull &&
      col("value") >= 0 && col("value") <= 1000

  def t7ValidCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("is_valid", validFilter)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_total"),
        count_if(col("is_valid")).as("n_valid"),
        count_if(!col("is_valid")).as("n_invalid"))
      .orderBy(col("event_type"))

  /** T9 threshold anomaly detection (adapter:470-511): per-type threshold
    * map (broadcast in spirit; a literal CASE here) → is_anomaly flag.
    */
  def anomalyFlag(eventType: Column, v: Column): Column =
    (eventType === "purchase" && v > 400.0) ||
      (eventType === "error") ||
      (v > 480.0)

  def t9AnomalyFlags(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("is_anomaly", anomalyFlag(col("event_type"), col("value")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count_if(col("is_anomaly")).as("n_anomalies"),
        (count_if(col("is_anomaly")) * lit(100.0) / count(lit(1))).as("anomaly_pct"))
      .orderBy(col("event_type"))

  /** T10 alert classification (consumer.py:359-508): severity routing as
    * a derived column, non-alerts filtered out.
    */
  def t10Alerts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("alert_level",
        when(col("event_type") === "error" && col("value") > 300, "CRITICAL")
          .when(col("event_type") === "error", "WARNING")
          .when(col("value") > 450, "HIGH_VALUE")
          .otherwise(lit(null).cast(StringType)))
      .filter(col("alert_level").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("alert_level"))
      .orderBy(col("event_id"))

  /** L8 integrity audit (database_utils.py:328-415): the five data-quality
    * checks as one aggregate pass (single scan, single report row).
    */
  def l8Integrity(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val dups = e.groupBy(col("user_id"), col("ts"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(coalesce(count(lit(1)), lit(0L)).as("duplicate_pairs"))
    e.agg(
        count(lit(1)).as("total_rows"),
        count_if(col("user_id").isNull).as("null_ids"),
        count_if(col("ts") > tsLit("2024-02-01")).as("future_ts"),
        count_if(col("value") < 0 || col("value") > 1000).as("out_of_range"),
        count_if(col("value").isNull).as("null_values"))
      .crossJoin(broadcast(dups))
  }
}
