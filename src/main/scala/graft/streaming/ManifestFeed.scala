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

  /** Publish one delivery: write `df` as `nFiles` part files under
    * `$root/data/d<deliveryId>`, then atomically publish the manifest
    * `$root/feed/m<deliveryId>.txt` whose single line is that data
    * directory. Returns the data directory.
    */
  def deliver(df: DataFrame, root: String, deliveryId: Long,
      nFiles: Int): String = {
    val s = df.sparkSession
    val dataDir = s"$root/data/d$deliveryId"
    val f = fs(s, root)
    val dst0 = new Path(s"$root/feed/m$deliveryId.txt")
    // Fail fast on a duplicate deliveryId BEFORE touching the data
    // directory: a published delivery's data dir is immutable by
    // contract (a running or replaying query may be reading it), and
    // the mode("overwrite") below would delete-and-rewrite it mid-read
    // before the manifest rename ever got the chance to fail (review
    // r15). A retry of a genuinely-failed deliver (manifest absent) is
    // still safe: only the unpublished data dir gets rewritten.
    if (f.exists(dst0))
      throw new java.io.IOException(
        s"delivery $deliveryId already published ($dst0 exists); " +
          "published data directories are immutable")
    df.repartition(nFiles).write.mode("overwrite").parquet(dataDir)
    f.mkdirs(new Path(s"$root/feed"))
    val tmp = new Path(s"$root/.mtmp/m$deliveryId")
    val dst = new Path(s"$root/feed/m$deliveryId.txt")
    f.mkdirs(tmp.getParent)
    val out = f.create(tmp, true)
    try out.write((dataDir + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"manifest publish failed: $tmp -> $dst")
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
