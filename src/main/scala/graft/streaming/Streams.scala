package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-streaming jobs mirroring the reference's streaming surface
  * (SURVEY.md §2.9):
  *  - continuous aggregates (A12, init.sql:324-368) as watermarked
  *    windowed aggregation — the reference's `end_offset => 1 hour`
  *    refresh lag IS the watermark;
  *  - threshold alerting (T10, consumer.py:359-508) as a streaming
  *    filter/classify;
  *  - per-parent sibling-sensor context (T11, consumer.py:350-432) as
  *    flatMapGroupsWithState WITH timeout eviction (the reference's
  *    in-memory dict grows unboundedly — deliberate improvement,
  *    SURVEY.md §7.4#6);
  *  - idempotent batched sink (S5/L5, timescaledb_sink.py:169-237) as
  *    foreachBatch dedup + append.
  *
  * All transforms take a (possibly streaming) DataFrame with the events
  * schema (ts TIMESTAMP_NTZ, user_id LONG, event_type STRING,
  * value DOUBLE) so batch tests and streaming runs share one code path.
  */
object Streams {

  /** A12: hourly rollup with 1-hour watermark. In append mode a window
    * only materializes once the watermark passes — exactly the
    * reference's "never refresh the most recent hour" semantics.
    *
    * `sum_value` is an EXACT decimal sum (graft.Cols policy): the
    * rollup is a MATERIALIZED table that later unions with freshly
    * aggregated tails and partition refreshes (store/Backfill), and a
    * float sum's low bits would depend on which path computed each
    * bucket — the exact decimal makes the stored rollup equal to the
    * direct aggregation bit-for-bit in any engine and any order (the
    * `served_hourly` oracle row certifies exactly that).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // count(value) stored alongside count(*): the served avg
        // divides by THIS, matching the reference continuous
        // aggregate's AVG(value) null-skipping semantics (init.sql
        // AVG) instead of silently relying on a null-free fixture
        // (advice r14)
        count(col("value")).as("n_value"),
        sum(graft.Cols.dec2(col("value"))).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("n_value"), col("sum_value"),
        col("min_value"), col("max_value"))

  /** W4's streaming twin: per-user SESSION windows closed by an
    * inactivity gap (session_window + watermark). State per open
    * session only; a session materializes once the watermark passes its
    * close — the same append-mode discipline as the hourly rollup.
    */
  def sessionRollup(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Source-side duplicate-delivery dedup with BOUNDED state (L5's
    * in-flight half): `dropDuplicatesWithinWatermark` keeps each key's
    * fingerprint only until the event-time watermark passes it, so
    * state is O(keys per horizon) instead of O(all keys ever) — the
    * difference between a dedup stage that survives a year of uptime
    * and one that OOMs. Duplicates delivered WITHIN the horizon (the
    * at-least-once-source case: retries, rebalances, replays) are
    * dropped in-flight; anything later than the horizon is by contract
    * the transactional sink's anti-join's job (`startDedupSink`), which
    * is exactly how the two layers compose in the reference's
    * batch+ON CONFLICT pipeline.
    */
  def streamDedup(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** T10 as a stream: alert classification, non-alerts dropped. */
  def alerts(events: DataFrame): DataFrame =
    events
      .withColumn("alert_level",
        when(col("event_type") === "error" && col("value") > 300, "CRITICAL")
          .when(col("event_type") === "error", "WARNING")
          .when(col("value") > 450, "HIGH_VALUE"))
      .filter(col("alert_level").isNotNull)

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class DeviceCtx(latest: Map[String, Double], nSeen: Long)

  case class AnomalyWithContext(user_id: Long, event_id: Long,
      event_type: String, value: Double, siblings: Map[String, Double])

  /** T11: keyed state holding the latest value per event_type for each
    * device; every anomalous event ('error') is emitted enriched with
    * the latest sibling readings. ProcessingTimeTimeout evicts idle
    * devices — bounded state, unlike the reference.
    */
  def anomalyContext(events: Dataset[EventRow],
      timeoutMs: Long = 3600 * 1000L): Dataset[AnomalyWithContext] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[DeviceCtx, AnomalyWithContext](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (userId, rows, state: GroupState[DeviceCtx]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var ctx = state.getOption.getOrElse(DeviceCtx(Map.empty, 0L))
            val out = rows.toSeq.sortBy(_.event_id).flatMap { r =>
              val res =
                if (r.event_type == "error")
                  Some(AnomalyWithContext(userId, r.event_id, r.event_type,
                    r.value, ctx.latest - "error"))
                else None
              ctx = DeviceCtx(ctx.latest + (r.event_type -> r.value), ctx.nSeen + 1)
              res
            }
            state.update(ctx)
            state.setTimeoutDuration(timeoutMs)
            out.iterator
          }
      }
  }

  /** Stream-stream event-time join (J2's cross-STREAM form): every
    * error event joined to the same device's click events within the
    * preceding `windowSec` seconds, both sides watermarked so the join
    * state is BOUNDED — a buffered click can be dropped once the error
    * stream's watermark guarantees no error can still reach back to it
    * (Spark derives the eviction bound from the time-interval predicate
    * + both watermarks; without the interval condition the state would
    * grow forever). Append mode: a pair emits once both sides are past
    * doubt. The equi-key (user_id) keeps it one state-store shuffle.
    */
  def errorClickJoin(errors: DataFrame, clicks: DataFrame,
      windowSec: Int = 600, delay: String = "1 hour"): DataFrame = {
    val e = errors
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts").as("error_ts"), col("value").as("error_value"))
    val c = clicks
      .withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", delay)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    e.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("click_ts") < col("error_ts"))
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("error_value"), col("click_id"), col("click_ts"))
  }

  /** Crash-injection points for the transactional sink's replay test. */
  sealed trait CrashPoint
  case object NoCrash extends CrashPoint
  case object CrashAfterStage extends CrashPoint
  case object CrashAfterPromote extends CrashPoint

  /** S5/L5: TRANSACTIONAL idempotent micro-batch commit (the reference's
    * ON CONFLICT DO NOTHING, timescaledb_sink.py:169-237, plus the
    * rename-promotion discipline of Lifecycle.compact):
    *
    *  1. a `_committed/batch-N` marker short-circuits a fully committed
    *     batch replayed after a crash between commit and checkpoint;
    *  2. the batch is deduped on the natural key and anti-joined against
    *     the keys ALREADY IN THE SINK (scan pruned to the date
    *     partitions the batch touches), then written to a `_staging`
    *     dir — never directly into the live tree;
    *  3. staged files are promoted by per-file rename into the live
    *     partition dirs, then the marker is written and staging dropped.
    *
    * Crash safety: `_staging`/`_committed` start with '_' so readers
    * never see them. A crash mid-promote leaves some rows live without a
    * marker — the REPLAY rolls the partial promote back BY FILE PREFIX,
    * unconditionally whenever the marker is absent (idempotent: a first
    * attempt's rollback deletes nothing), then recommits from scratch,
    * so the protocol converges to exactly-once regardless of where the
    * previous attempt died. (The rollback is the idempotency mechanism;
    * the marker is the fast path.)
    *
    * Metadata growth, consciously bounded rather than eliminated: one
    * marker per commit accumulates in `_committed` for the table's
    * lifetime — rollback-by-prefix and migration detection depend on
    * committed prefixes staying resolvable, so markers are never GC'd.
    * The per-commit listing cost this adds is bounded in practice by
    * DATE PARTITIONING: a partition is hot only while its day is
    * current, so commits-per-partition (and, with the one-file-per-
    * commit staged write, files-per-partition) are bounded by one
    * day's commit count — the 500-commit LongRunKeyedSink profile
    * measures the flat regime. Folding markers away would need
    * data-file compaction that re-adopts files under one compacted
    * prefix, i.e. a manifest format — which the plain-parquet
    * any-reader contract (DuckDB reads these trees directly)
    * deliberately excludes.
    *
    * `epoch` scopes the marker to one sink INCARNATION: batch ids are
    * only meaningful within a single checkpoint lineage, so a stream
    * restarted against the same table with a FRESH checkpoint (new ids,
    * different batch composition) must not match the old incarnation's
    * markers — its batches take the content-keyed anti-join path
    * instead, which is composition-independent. `startDedupSink`
    * derives the epoch from the checkpoint location.
    *
    * `keyedDedup = false` swaps step 2's anti-join for rollback-by-
    * prefix replay (append-exactly-once, no read-back) — see
    * `startDedupSink`'s scaladoc for the semantics trade.
    */
  def commitBatch(batch: DataFrame, outDir: String, batchId: Long,
      crash: CrashPoint = NoCrash,
      keys: Seq[String] = Seq("user_id", "ts"),
      epoch: String = "",
      keyedDedup: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(hconf)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val marker = p(s"$outDir/_committed/${epoch}batch-$batchId")
    if (fs.exists(marker)) return
    val staging = p(s"$outDir/_staging/${epoch}batch-$batchId")
    // every live file this commit promotes is prefixed with
    // "{epoch}batch{id}-", so a crashed attempt's partial promote can be
    // rolled back by name, without reading any data
    val filePrefix = s"${epoch}batch$batchId-"
    // persist + materialize ONCE: the micro-batch's upstream plan (e.g.
    // the full decode pipeline, plus any observe() counters riding it)
    // would otherwise re-execute for each action below — paying the
    // decode twice per commit and double-counting observed metrics
    val fresh = batch.dropDuplicates(keys)
      .withColumn("event_date", to_date(col("ts")))
      .persist()
    // abandoned-lineage residue files to adopt once this batch's marker
    // lands (filled by the keyed path's migration step)
    var adoptable: Seq[org.apache.hadoop.fs.Path] = Seq.empty
    try {
      val touched = fresh.select(col("event_date")).distinct()
        .collect().map(_.get(0))
      // rollback-by-prefix runs UNCONDITIONALLY whenever the marker is
      // absent: a crashed attempt's partial promote (data AND keyidx
      // sidecar) is dropped by name, no content read-back. The replayed
      // batch has the same rows (same id, same checkpoint lineage),
      // hence the same touched partitions. Idempotent — it only touches
      // files carrying THIS batch's prefix, so a first attempt deletes
      // nothing. (Gating this on staging residue was a double-crash
      // window: residue was deleted before the rollback ran, so a crash
      // between the two left the next replay with no marker, no
      // residue, and the first attempt's promoted files still live.)
      touched.foreach { d =>
        val dir = p(s"$outDir/event_date=$d")
        if (fs.exists(dir))
          fs.listStatus(dir)
            .filter(f => f.isFile && f.getPath.getName.startsWith(filePrefix))
            .foreach(f => fs.delete(f.getPath, false))
        KeyIndex.rollbackPrefix(fs, outDir, d, filePrefix)
      }
      fs.delete(staging, true) // leftover from a crashed attempt
      // one staged file per touched partition per commit: without the
      // repartition the write emits every upstream partition's sliver
      // into every date dir (micro-batch × 32 tasks = up to 32 files
      // per partition PER COMMIT), and the per-commit rollback/
      // migration listings then grow linearly with commit count — the
      // long-run profile measured commit cost climbing 1.3 → 3.8 s
      // over 300 commits from exactly this. The shuffle is one pass
      // over the (small) batch; a genuinely huge micro-batch hashing
      // onto few date keys would raise `filesPerPartition`-style fan-
      // out instead, the same dial Lifecycle.compact exposes.
      def stagedWrite(df: DataFrame): Unit =
        df.repartition(col("event_date")).write.mode("overwrite")
          .partitionBy("event_date")
          .parquet(staging.toString)
      if (!keyedDedup) {
        stagedWrite(fresh)
      } else {
        // keyed mode (the ON CONFLICT DO NOTHING twin): dedup authority
        // is the COMMITTED key sidecar index, not a data read-back.
        // Per-commit cost: load the touched partitions' blooms (KBs) →
        // if no batch key hits any bloom (the common all-new-keys case)
        // the anti-join is skipped entirely; otherwise anti-join against
        // the committed key SEGMENTS (a keys-only scan, still far
        // smaller than the data). Partitions from before the sidecar
        // existed take a one-time migration read-back folded into this
        // commit's segment.
        val prefixes = KeyIndex.committedPrefixes(fs, outDir)
        val migrating = touched.filter(d =>
          KeyIndex.needsMigration(fs, outDir, d, prefixes))
        // abandoned-lineage residue (reader-visible files carrying no
        // committed prefix) in the migrating partitions: its keys ride
        // the read-back below into this commit's segment, and the files
        // themselves are adopted under this batch's prefix after the
        // marker lands (see the post-marker step)
        adoptable = migrating.toSeq.flatMap(d =>
          KeyIndex.uncoveredDataFiles(fs, outDir, d, prefixes))
        val blooms = touched.flatMap(d =>
          KeyIndex.loadBlooms(fs, outDir, d, prefixes))
        val hashCol = KeyIndex.keyHashCol(fresh, keys)
        val bloomsB = spark.sparkContext.broadcast(blooms.toArray)
        // driver-merged sketch probed per batch row — a deliberate
        // batch-side-only udf (might_contain needs a bloom built by
        // bloom_filter_agg, which would mean scanning the very keys the
        // sketch exists to avoid reading)
        val bloomHit = udf((h: Long) => bloomsB.value.exists(_.mightContain(h)))
        val anyCandidate =
          blooms.nonEmpty && !fresh.filter(bloomHit(hashCol)).isEmpty
        val migratedWithDate =
          if (migrating.isEmpty) None
          else Some(spark.read.parquet(outDir)
            .filter(col("event_date").isInCollection(migrating.toSeq))
            .select(col("event_date") +: keys.map(col): _*).persist())
        try {
          val segmentFiles =
            if (!anyCandidate) Seq.empty
            else touched.flatMap(d =>
              KeyIndex.committedKeyFiles(fs, outDir, d, prefixes))
              .map(_.toString).toSeq
          val existing = Seq(
            if (segmentFiles.nonEmpty)
              Some(spark.read.parquet(segmentFiles: _*).select(keys.map(col): _*))
            else None,
            migratedWithDate.map(_.select(keys.map(col): _*))
          ).flatten.reduceOption(_ unionByName _)
          val staged = existing match {
            case None    => fresh
            case Some(e) => fresh.join(e, keys, "left_anti")
          }
          stagedWrite(staged)
          // sidecar segment for this commit: the keys it inserts, plus
          // the migration read-back keys (so the partition is fully
          // covered the moment this batch's marker lands)
          val segKeys = (staged.select(col("event_date") +: keys.map(col): _*) +:
            migratedWithDate.toSeq).reduce(_ unionByName _)
            .repartition(col("event_date")).persist()
          try {
            segKeys.write.mode("overwrite").partitionBy("event_date")
              .parquet(s"$staging/_keyidx")
            // one bloom per touched partition over that segment's keys,
            // staged beside it (promoted + prefix-named with the rest)
            val counts = segKeys.groupBy(col("event_date")).count()
              .collect().map(r => (r.get(0), r.getLong(1)))
            counts.foreach { case (d, n) =>
              val bloom = KeyIndex.bloomOf(
                segKeys.filter(col("event_date") === lit(d)), keys, n)
              KeyIndex.writeBloom(fs,
                p(s"$staging/_keyidx/event_date=$d/bloom.bin"), bloom)
            }
          } finally segKeys.unpersist()
        } finally migratedWithDate.foreach(_.unpersist())
      }
    } finally fresh.unpersist()
    if (crash == CrashAfterStage) throw new RuntimeException("injected crash: after stage")
    // promote: move each staged partition's data files into the live tree
    fs.listStatus(staging).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("event_date="))
      .foreach { part =>
        val target = p(s"$outDir/${part.getPath.getName}")
        fs.mkdirs(target)
        fs.listStatus(part.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .foreach { f =>
            val dst = new org.apache.hadoop.fs.Path(target,
              s"$filePrefix${f.getPath.getName}")
            fs.delete(dst, true) // idempotent re-promote
            if (!fs.rename(f.getPath, dst))
              throw new java.io.IOException(s"promote: cannot move ${f.getPath}")
          }
      }
    // promote the key sidecar (keyed mode): segments + blooms land under
    // _keyidx with the SAME file prefix — authoritative only once the
    // marker below exists, rolled back by prefix like the data on replay
    val stagedIdx = p(s"$staging/_keyidx")
    if (fs.exists(stagedIdx))
      fs.listStatus(stagedIdx).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("event_date="))
        .foreach { part =>
          val target = p(s"$outDir/_keyidx/${part.getPath.getName}")
          fs.mkdirs(target)
          fs.listStatus(part.getPath)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .zipWithIndex.foreach { case (f, i) =>
              val name =
                if (f.getPath.getName == "bloom.bin") s"${filePrefix}bloom.bin"
                else s"${filePrefix}keys-$i.parquet"
              val dst = new org.apache.hadoop.fs.Path(target, name)
              fs.delete(dst, true)
              if (!fs.rename(f.getPath, dst))
                throw new java.io.IOException(s"promote: cannot move ${f.getPath}")
            }
        }
    if (crash == CrashAfterPromote) throw new RuntimeException("injected crash: after promote")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    // adopt abandoned-lineage residue under this batch's NOW-COMMITTED
    // prefix: the migration read-back already folded these files' keys
    // into this batch's marker-gated segment, so the rename makes
    // `needsMigration` see the partition as covered from the next
    // commit on. Ordering is the safety argument: adoption runs
    // strictly AFTER the marker, and rollback-by-prefix only runs when
    // the marker is ABSENT — an adopted file can never be deleted as a
    // "partial promote". A crash mid-adoption leaves the remainder
    // uncovered; the next commit re-runs the (idempotent) read-back and
    // retries. A failed rename is likewise left for the next commit —
    // the data is already durable, so the commit must not fail here.
    adoptable.foreach { f =>
      val dst = new org.apache.hadoop.fs.Path(
        f.getParent, s"${filePrefix}adopted-${f.getName}")
      try fs.rename(f, dst) catch { case _: java.io.IOException => () }
    }
    fs.delete(staging, true)
  }

  /** `keyedDedup = true` (default) keeps the reference's idempotent-
    * insert semantics: duplicate natural keys arriving in ANY batch are
    * dropped — the TimescaleDB `ON CONFLICT DO NOTHING` twin. Since the
    * key sidecar index (`KeyIndex`), its per-commit cost is BOUNDED:
    * bloom loads (KBs per prior commit to the touched partitions) plus
    * a keys-only segment anti-join ONLY when some batch key hits a
    * bloom — an all-new-keys commit never scans any keys. Authority is
    * marker-gated: only committed segments dedup, and both data and
    * sidecar of a crashed attempt are rolled back by prefix on replay
    * (the replayed micro-batch is assumed row-identical, which the
    * checkpoint WAL guarantees). Residue from an ABANDONED lineage that
    * crashed mid-promote — unmarked files a replay will never roll
    * back, but visible to every reader — is detected by
    * `KeyIndex.needsMigration` (no committed prefix covers it), folded
    * into the next commit's read-back + segment, and the files adopted
    * under that commit's prefix: the ON-CONFLICT-DO-NOTHING contract
    * holds even against a table a previous incarnation died writing.
    * `keyedDedup = false` is append-exactly-once: each delivered row is
    * stored exactly once per checkpoint lineage (marker fast path +
    * rollback-by-prefix replay), with no key tracking at all — the mode
    * a source with unique delivery (Kafka, file replay) wants when keys
    * never repeat across batches.
    */
  def startDedupSink(events: DataFrame, outDir: String, checkpointDir: String,
      keyedDedup: Boolean = true) = {
    // one epoch per checkpoint lineage: same checkpoint -> same epoch
    // (crash/restart replays hit their own markers), new checkpoint ->
    // new epoch (content-keyed dedup, never a stale-marker skip)
    val epoch = java.lang.Long.toHexString(
      graft.functions.TextHash.hash60(checkpointDir)) + "-"
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, outDir, batchId, epoch = epoch,
          keyedDedup = keyedDedup)
      }
      .start()
  }
}
