package graft.store

import java.time.LocalDate

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch half of the continuous-aggregate surface (A12): the refresh /
  * backfill job (init.sql:324-368 `refresh_continuous_aggregate`
  * semantics; manual refresh database.py:591-607). The streaming half
  * (Streams.hourlyRollup) keeps the rollup current past the watermark;
  * THIS recomputes a historical range — late corrections, bulk loads,
  * corrupted chunks — by rebuilding exactly the affected date partitions
  * and overwriting them in place (dynamic partition overwrite), leaving
  * every other partition's files untouched.
  *
  * Scale: the recompute reads only the raw-table date partitions in
  * range (partition pruning on the filter), shuffles once for the
  * windowed groupBy, and the overwrite is per-partition file
  * replacement — cost tracks the refreshed range, never the table size.
  */
object Backfill {

  /** The rollup definition shared verbatim with the streaming job
    * (Streams.hourlyRollup — the watermark is a no-op in batch), plus
    * the partition column. 1-hour windows are day-aligned, so
    * bucket_date == date(ts) and the refresh range maps cleanly onto
    * partitions.
    */
  def hourlyRollupPartitioned(events: DataFrame): DataFrame =
    Streams.hourlyRollup(events)
      .withColumn("bucket_date", to_date(col("bucket")))

  /** Full rebuild (initial materialization). */
  def materialize(events: DataFrame, rollupDir: String): Unit =
    hourlyRollupPartitioned(events)
      .write.mode("overwrite").partitionBy("bucket_date").parquet(rollupDir)

  /** REAL-TIME continuous-aggregate serving (TimescaleDB's
    * `materialized_only = false` read path, init.sql:324-368): closed
    * buckets come from the MATERIALIZED rollup — partition-pruned
    * parquet, no raw scan — and only the live tail past `servedUntil`
    * is aggregated on the fly from raw events. The union is exactly the
    * rollup definition over the full stream (spec-proven), but the raw
    * side's scan is bounded by the refresh lag instead of the table:
    * at 100 TB the served query reads gigabytes of rollup plus the
    * tail, not the raw history. Composed from existing operators — the
    * semantics need no custom plan node.
    */
  def servedHourly(spark: SparkSession, events: DataFrame, rollupDir: String,
      servedUntil: java.sql.Timestamp): DataFrame = {
    // hour alignment, or one bucket would be split across both sides
    require(servedUntil.getTime % 3600000L == 0, s"not hour-aligned: $servedUntil")
    val closed = spark.read.parquet(rollupDir)
      .filter(col("bucket") < lit(servedUntil))
      .drop("bucket_date")
    val tail = Streams.hourlyRollup(
      events.filter(col("ts") >= lit(servedUntil)))
    closed.unionByName(tail)
  }

  /** Refresh [from, to): recompute the range from the raw table and
    * overwrite ONLY the affected bucket_date partitions.
    */
  def refreshRange(spark: SparkSession, events: DataFrame, rollupDir: String,
      from: LocalDate, to: LocalDate): Unit = {
    val ranged = events.filter(
      col("ts") >= lit(from.toString).cast("timestamp_ntz") &&
      col("ts") < lit(to.toString).cast("timestamp_ntz"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      hourlyRollupPartitioned(ranged)
        .write.mode("overwrite").partitionBy("bucket_date").parquet(rollupDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
