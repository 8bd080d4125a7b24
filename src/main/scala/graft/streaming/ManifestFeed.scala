package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Manifest-gated file deliveries for the durable incremental sinks.
  *
  * THE PROBLEM (r14 verdict #6): Spark's file stream source lists the
  * feed directory per poll, and a multi-file parquet append is not
  * atomically visible — the commit renames part files one by one, so a
  * poll landing mid-append sees a PARTIAL delivery and splits it across
  * two micro-batches, shifting every batchId-derived delivery stamp.
  * The repo's r14 answer was a convention (`coalesce(1)` per delivery:
  * a single file's rename is all-or-nothing), which caps a delivery at
  * one writer task — a contract no real multi-file delivery can keep.
  *
  * THE MECHANISM: a delivery writes its data files (ANY number of part
  * files) into a per-delivery directory OUTSIDE the streamed path, then
  * publishes ONE single-line manifest file into `$root/feed` via
  * create-in-hidden-dir + rename. The streaming query streams the
  * MANIFESTS, not the data: a manifest is one file (its rename is
  * atomic — it appears fully formed or not at all), the file stream
  * source never splits one file across batches, and the data directory
  * is complete before the manifest exists. A micro-batch therefore
  * contains whole deliveries, always.
  *
  * Batch semantics: one manifest per poll → batchId counts deliveries
  * exactly (the registered queries' `processAllAvailable` cadence).
  * Several manifests published between polls MERGE into one micro-batch
  * — whole deliveries still, just coarser; sinks whose delivery stamps
  * must be 1:1 with deliveries control the poll cadence, as the
  * registered incremental queries do.
  *
  * Replay: a restarted query re-reads the same manifest lines, resolves
  * the same (immutable once published) data directories, and recomputes
  * the identical batch — composing with the sinks' segment-overwrite
  * idempotence unchanged.
  */
object ManifestFeed {

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Publish one delivery: write `df` as `nFiles` part files under a
    * PER-ATTEMPT data directory `$root/data/d<deliveryId>-a<nonce>`,
    * then atomically publish the manifest `$root/feed/m<deliveryId>
    * .txt` whose single line is that data directory. Returns the data
    * directory.
    *
    * Duplicate-delivery safety (review r15 + ADVICE r15): the earlier
    * shape — a shared `d<deliveryId>` data dir guarded by a manifest
    * exists() check — was check-then-act: two concurrent deliver()
    * calls with the same deliveryId could both pass the check and the
    * second overwrite() would rewrite a data dir the first had already
    * (or was about to) publish, mid-read. Now NO attempt ever writes a
    * path another attempt can reference: each attempt stages into its
    * own nonce'd dir, and the manifest names the winner's dir. The
    * exists() check stays as the fail-fast for the common sequential
    * duplicate, and the publish itself is a NO-REPLACE commit — an
    * atomic link(2) on file:// roots, a FileContext rename elsewhere
    * (fails when dst exists, unlike FileSystem.rename's local
    * rename(2) which silently replaces; atomic on HDFS where the
    * namenode serializes it): a
    * racer that loses removes its never-referenced staging dir and
    * throws, and a published manifest can never be mutated under a
    * reader. Published data directories remain immutable forever; a
    * retry of a genuinely-failed deliver (manifest absent) just stages
    * a fresh nonce'd dir. Callers must hold deliveryId → content
    * stable (the sink replay contract); which attempt's identical
    * bytes win is then immaterial. Orphaned loser dirs are bounded by
    * concurrent-duplicate count and live under `data/` for the feed's
    * (scratch-rooted, swept) lifetime.
    */
  def deliver(df: DataFrame, root: String, deliveryId: Long,
      nFiles: Int): String = {
    val s = df.sparkSession
    val f = fs(s, root)
    val dst = new Path(s"$root/feed/m$deliveryId.txt")
    if (f.exists(dst))
      throw new java.io.IOException(
        s"delivery $deliveryId already published ($dst exists); " +
          "published data directories are immutable")
    val dataDir =
      s"$root/data/d$deliveryId-a${java.util.UUID.randomUUID.toString.take(8)}"
    df.repartition(nFiles).write.mode("overwrite").parquet(dataDir)
    f.mkdirs(new Path(s"$root/feed"))
    val tmp = new Path(s"$root/.mtmp/m$deliveryId-${dataDir.takeRight(8)}")
    f.mkdirs(tmp.getParent)
    val out = f.create(tmp, true)
    try out.write((dataDir + "\n").getBytes("UTF-8"))
    finally out.close()
    // NO-REPLACE publish: a concurrent duplicate deliver() must not
    // clobber a manifest a poll may already have latched (review r16:
    // the detect-after-the-fact read-back could delete a data dir the
    // mutated manifest no longer named, breaking replay). Only a
    // racer that VERIFIABLY failed to publish deletes its staging dir
    // — nothing else ever touches published state.
    //  - file:// roots (r16 ADVICE #1): FileContext's default
    //    renameInternal is an exists() check followed by rename(2) —
    //    two concurrent publishers can both pass the check and the
    //    second silently replaces the first. link(2) is the local
    //    atomic no-replace primitive: Files.createLink fails with
    //    EEXIST atomically in the kernel, no check-then-act window.
    //  - other schemes: FileContext.rename, which (unlike
    //    FileSystem.rename's local rename(2)) fails when dst exists;
    //    on HDFS the namenode serializes it, so it is atomic there.
    //    Local filesystems WITHOUT hard links (r17 ADVICE #3: some
    //    overlay/network mounts surface as file:// but reject
    //    link(2)) fall back to this branch too — weaker than link(2)
    //    but never an orphaned staging dir with no publish attempt.
    def fcRename(): Boolean = try {
      org.apache.hadoop.fs.FileContext
        .getFileContext(dst.toUri, df.sparkSession.sparkContext.hadoopConfiguration)
        .rename(tmp, dst)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
    }
    val renamed =
      if (f.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(f.makeQualified(dst).toUri.getPath),
            java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath))
          f.delete(tmp, false) // dst now holds the only reference that matters
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // link(2) unsupported (or an IO failure that is NOT the
          // lost-race EEXIST): FileAlreadyExistsException is itself a
          // FileSystemException, so it must be matched above this
          case _: UnsupportedOperationException |
               _: java.nio.file.FileSystemException => fcRename()
        }
      } else fcRename()
    if (!renamed) {
      // lost the publish race with certainty (our manifest never
      // landed): our staging dir is unreferenced by construction
      f.delete(new Path(dataDir), true)
      f.delete(tmp, false)
      throw new java.io.IOException(
        s"delivery $deliveryId lost publish race ($dst already " +
          "published); staging dir dropped")
    }
    dataDir
  }

  /** Resolve a micro-batch of manifest rows to the document rows they
    * gate. The collect is control-plane by construction: one line per
    * delivery directory, not per data file or row.
    */
  def resolve(mb: DataFrame, schema: StructType): DataFrame = {
    val dirs = mb.select("value").collect().map(_.getString(0)).sorted
    if (dirs.isEmpty)
      mb.sparkSession.createDataFrame(
        mb.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else mb.sparkSession.read.schema(schema).parquet(dirs.toIndexedSeq: _*)
  }

  /** Run `commit(docs, batchId)` once per micro-batch of WHOLE
    * deliveries: streams `$root/feed` manifests and resolves each batch
    * to its gated document rows before handing it to the sink step.
    */
  def start(s: SparkSession, root: String, schema: StructType,
      checkpointDir: String)(commit: (DataFrame, Long) => Unit)
      : StreamingQuery = {
    fs(s, root).mkdirs(new Path(s"$root/feed"))
    s.readStream.text(s"$root/feed")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        commit(resolve(mb, schema), batchId)
        ()
      }
      .start()
  }
}
