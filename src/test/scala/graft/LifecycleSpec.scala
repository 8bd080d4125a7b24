package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.store.Lifecycle
import org.apache.spark.sql.functions._

class LifecycleSpec extends SparkSpec {

  test("O2 side-table equals the ad-hoc anomaly view; partitioned + pruned") {
    val dir = Files.createTempDirectory("anomalies").toString
    Lifecycle.writeAnomalies(Tables.events(spark, Sf0001), dir)
    val fromStore = Lifecycle.readAnomalies(spark, dir)
      .collect().map(r => (r.getLong(0), r.get(1), r.getLong(2), r.getDouble(3)))
    val adHoc = graft.analytics.EventAnalytics.o2AnomalousReadings(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.get(1), r.getLong(2), r.getDouble(3)))
    assert(fromStore.toSet == adHoc.toSet)
    assert(fromStore.map(_._2.toString).toSeq == adHoc.map(_._2.toString).toSeq) // newest-first order
    assert(fromStore.nonEmpty)
    // side-table is date-partitioned → the recency query prunes partitions
    val stats = Lifecycle.tableStats(spark, dir)
    assert(stats.size > 1)
    val oneDay = spark.read.parquet(dir).filter(col("event_date") === stats.head._1)
    assert(oneDay.count() < fromStore.length)
  }

  test("z-order clustering bounds per-file spans on BOTH dimensions") {
    import java.nio.file.Files
    val zDir = Files.createTempDirectory("tbl_z").toString
    val linDir = Files.createTempDirectory("tbl_lin").toString
    val raw = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"),
        (Cols.epochUs(col("ts")) / 60000000L).cast("long").as("minute"))
    val dom = raw.agg(max("user_id"), max("minute"), min("minute")).head()
    val (uDomain, mDomain) =
      (dom.getLong(0).toDouble, (dom.getLong(1) - dom.getLong(2)).toDouble)
    // z-order contract: comparable bit scales — stretch the narrow user
    // domain to the minute domain's width before interleaving
    val uScale = math.max(1L, (mDomain / uDomain).toLong)
    val events = raw.withColumn("user_scaled", col("user_id") * uScale)
    val total = events.count()

    Lifecycle.writeZClustered(events, zDir, "user_scaled", "minute", files = 8)
    // the 1-D layout: perfectly clustered on time, oblivious to user
    events.repartitionByRange(8, col("minute"))
      .sortWithinPartitions(col("minute"))
      .write.mode("overwrite").parquet(linDir)

    assert(spark.read.parquet(zDir).count() == total)
    // analytic z-value: a=5 (bits at even slots -> 17), b=3 (odd -> 10)
    val z = Lifecycle.zValue(lit(5L), lit(3L), 16)
    assert(spark.range(1).select(z).head().getLong(0) == 27L)

    // mean per-file span of each dimension, as a fraction of its domain
    def spans(dir: String): (Double, Double) = {
      val byFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("user_id") - min("user_id")).as("us"),
          (max("minute") - min("minute")).as("ms"))
        .agg(avg("us"), avg("ms")).head()
      (byFile.getDouble(0) / uDomain, byFile.getDouble(1) / mDomain)
    }
    val (zu, zm) = spans(zDir)
    val (lu, lm) = spans(linDir)
    // the 1-D layout prunes perfectly on minute and not at all on user;
    // z-order bounds BOTH — its worst dimension stays well under the
    // linear layout's worst dimension (which is the whole user domain)
    assert(lu > 0.9, s"linear user coverage $lu")
    assert(math.max(zu, zm) < 0.7, s"z worst-dim coverage u=$zu m=$zm")
    assert(zu < 0.7 && zm < 0.7, s"z spans u=$zu m=$zm")
  }

  test("clustered write → archive → retention → compaction round-trip") {
    val main = Files.createTempDirectory("tbl_main").toString
    val arch = Files.createTempDirectory("tbl_arch").toString
    val events = Tables.events(spark, Sf0001)
    val total = events.count()

    // L4 clustered, date-partitioned layout
    Lifecycle.writeClustered(events, main, "user_id", "ts")
    val stats = Lifecycle.tableStats(spark, main)
    assert(stats.nonEmpty && stats.map(_._1).distinct.size == stats.size)
    assert(spark.read.parquet(main).count() == total)

    // partition pruning must reach the scan (chunk-exclusion equivalent)
    val pruned = spark.read.parquet(main)
      .filter(col("event_date") === stats.head._1)
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(spark.read.parquet(main).filter(col("event_date") === stats.head._1)
      .count() < total)
    assert(!prunedPlan.toLowerCase.contains("filter") ||
      pruned.count() == spark.read.parquet(main)
        .where(col("event_date") === stats.head._1).count())

    // L1 archive: move everything before day 10 — a pure file-level
    // move: the archived partitions hold the IDENTICAL files (same
    // names, same bytes — a rewrite would mint new part-file UUIDs),
    // and the partitions are gone from main
    val cutoff = LocalDate.parse("2024-01-10")
    def fileInventory(dir: String): Set[(String, String, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val b = Set.newBuilder[(String, String, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += ((f.getPath.getParent.getName, f.getPath.getName, f.getLen))
      }
      b.result()
    }
    val preMove = fileInventory(main)
      .filter(e => LocalDate.parse(e._1.stripPrefix("event_date=")).isBefore(cutoff))
    val moved = Lifecycle.archiveOlderThan(spark, main, arch, cutoff)
    assert(moved > 0)
    assert(fileInventory(arch) == preMove) // same files, byte-for-byte sizes
    val archCount = spark.read.parquet(arch).count()
    val mainCount = spark.read.parquet(main).count()
    assert(archCount + mainCount == total)
    assert(Lifecycle.tableStats(spark, main).forall(s => LocalDate.parse(s._1).isAfter(cutoff.minusDays(1))))

    // L2/L3 retention on the archive
    val dropped = Lifecycle.dropOlderThan(spark, arch, LocalDate.parse("2024-01-05"))
    assert(dropped > 0)
    assert(spark.read.parquet(arch).count() < archCount)

    // L7 compaction: fewer files, same rows
    val before = Lifecycle.tableStats(spark, main).map(_._2).sum
    Lifecycle.compact(spark, main, "user_id", "ts")
    val after = Lifecycle.tableStats(spark, main).map(_._2).sum
    assert(after <= before)
    assert(spark.read.parquet(main).count() == mainCount)
  }

  test("store-root retention: stale and orphaned roots age out, live roots survive") {
    import graft.store.StoreRoot
    import org.apache.hadoop.fs.Path
    val base = Files.createTempDirectory("rootsweep").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a live root: ensured (stamped) moments ago
    val live = new Path(s"$base/lex-feedcafe")
    StoreRoot.ensureBuilt(spark, live) { staging =>
      fs.mkdirs(new Path(staging)); ()
    }
    // a pre-stamp root (regenerated-corpus orphan: no liveness entry)
    fs.mkdirs(new Path(s"$base/pq-deadbeef"))
    // a stamped-but-expired root, plus a crashed build's staging dir
    val old = new Path(s"$base/ivf-0ddba11")
    StoreRoot.ensureBuilt(spark, old)(s => { fs.mkdirs(new Path(s)); () })
    fs.setTimes(new Path(s"$base/_live/ivf-0ddba11"),
      System.currentTimeMillis() - 100000L, -1)
    // a crashed build's staging: reaped by its own age (never stamped
    // — a FRESH one must survive, it may be a build in progress)
    fs.mkdirs(new Path(s"$base/pq-0ddba11.build-42"))
    fs.setTimes(new Path(s"$base/pq-0ddba11.build-42"),
      System.currentTimeMillis() - 100000L, -1)
    fs.mkdirs(new Path(s"$base/pq-0ddba11.build-77"))
    // an orphaned stamp (root deleted out-of-band)
    fs.create(new Path(s"$base/_live/lex-gone"), true).close()

    val removed = StoreRoot.sweepStale(spark, base, ttlMs = 60000L)

    assert(removed == 3, s"expected 3 removals, got $removed")
    assert(fs.exists(live), "sweep removed a live root")
    assert(fs.exists(new Path(s"$base/_live/lex-feedcafe")))
    assert(!fs.exists(new Path(s"$base/pq-deadbeef")))
    assert(!fs.exists(old))
    assert(!fs.exists(new Path(s"$base/pq-0ddba11.build-42")))
    assert(fs.exists(new Path(s"$base/pq-0ddba11.build-77")),
      "sweep reaped a possibly in-progress build staging")
    assert(!fs.exists(new Path(s"$base/_live/ivf-0ddba11")))
    assert(!fs.exists(new Path(s"$base/_live/lex-gone")))
    // a live root keeps serving after the sweep: ensure is a no-op
    var rebuilt = false
    StoreRoot.ensureBuilt(spark, live)(_ => rebuilt = true)
    assert(!rebuilt)
  }
}
