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

  /** The ORACLE-CERTIFIED end-to-end continuous-aggregate exercise
    * (registered as `served_hourly`): the one A12 path whose SERVED
    * output goes through the DuckDB gate instead of spec-only checks.
    * It drives the full lifecycle against the fixture events table:
    *
    *  1. materialize the rollup from a deliberately STALE snapshot —
    *     every 10th event in the last two days missing (the late-data /
    *     corrupted-chunk scenario refresh exists for);
    *  2. `refreshRange` the affected date partitions from the full raw
    *     table (dynamic partition overwrite — untouched partitions keep
    *     their files);
    *  3. serve with `servedHourly`: closed buckets from the refreshed
    *     MATERIALIZED store, the live tail (last ~2 hours) aggregated
    *     from raw.
    *
    * The result is projected to `a2_hourly_agg`'s shape with
    * avg = exact decimal sum ÷ n_value (the rollup's stored
    * count(value) — the oracle divides by count(value) too, so both
    * sides carry the reference AVG's null-skipping semantics instead
    * of relying on a null-free fixture), so the oracle hash certifies
    * that
    * materialize → refresh → serve equals
    * the reference's fully-refreshed continuous aggregate
    * (init.sql:324-345 semantics, SURVEY §7.4#4) — which only holds if
    * the refresh really replaced the stale partitions AND the
    * closed/tail seam at `servedUntil` lost and duplicated nothing.
    */
  def servedHourlyCertified(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, TimestampType}
    val ev = graft.Tables.events(spark, dir)
    val span = ev.agg(min(col("ts")).cast(TimestampType),
      max(col("ts")).cast(TimestampType)).head()
    val (minT, maxT) = (span.getTimestamp(0), span.getTimestamp(1))
    def utcDate(t: java.sql.Timestamp): LocalDate =
      java.time.Instant.ofEpochMilli(t.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val (minD, maxD) = (utcDate(minT), utcDate(maxT))
    val midD = { val m = maxD.minusDays(2); if (m.isBefore(minD)) minD else m }
    val servedUntil = new java.sql.Timestamp(
      math.max(maxT.getTime / 3600000L * 3600000L - 2 * 3600000L,
        minT.getTime / 3600000L * 3600000L + 3600000L))
    // deterministic per-process-per-corpus root, cleared before each
    // rebuild: the lifecycle is re-exercised every invocation but at
    // most ONE rollup tree per corpus per JVM ever lives in tmp (a
    // fresh createTempDirectory per call accumulated unboundedly across
    // gate loops — review r13). Scoped by pid + an md5 of the corpus
    // path (advice r14: a shared hashCode-keyed path let two concurrent
    // sessions — or two corpora colliding on 32-bit hashCode — delete
    // each other's tree mid-query; the served plan reads the closed
    // buckets LAZILY at action time, so the tree must stay private to
    // this JVM for the DataFrame's lifetime). Trees left by dead JVMs
    // are swept on entry so the per-pid scoping stays bounded.
    val rollupBase = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_rollup")
    Option(rollupBase.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      val alive = scala.util.Try(f.getName.toLong).toOption.exists(p =>
        ProcessHandle.of(p).map[java.lang.Boolean](_.isAlive).orElse(false))
      if (!alive) org.apache.commons.io.FileUtils.deleteQuietly(f)
    }
    val corpusKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val root = rollupBase
      .resolve(ProcessHandle.current().pid().toString)
      .resolve(corpusKey).toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val stale = ev.filter(
      col("ts") < graft.Cols.tsLit(midD.toString) ||
        pmod(col("event_id"), lit(10)) =!= 0)
    materialize(stale, root)
    refreshRange(spark, ev, root, midD, maxD.plusDays(1))
    servedHourly(spark, ev, root, servedUntil)
      .select(col("bucket").cast("timestamp_ntz").as("bucket"),
        col("event_type"), col("n"),
        (col("sum_value").cast(DoubleType) / col("n_value"))
          .cast(DoubleType).as("avg_value"),
        col("min_value"), col("max_value"))
      .orderBy(col("bucket"), col("event_type"))
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
