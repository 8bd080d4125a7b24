package graft

import java.nio.file.Files

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Long-run + idempotence coverage for the incremental exact-runs
  * pipeline (r14). The two-delivery ORACLE row
  * (`dedup_exact_runs_incremental`) certifies the semantics against
  * DuckDB; these specs cover what a two-delivery hash cannot:
  * many-delivery accumulation through the durable sink, and replay
  * idempotence of a committed batch.
  */
class ExactRunsIncrementalSpec extends SparkSpec {

  private def reportRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("doc_a"), col("doc_b"), col("max_run_tokens"),
        col("n_runs"), col("delivery"))
      .collect().map(_.toString).sorted.toSeq

  test("long-run: 8 deliveries through the durable sink equal the in-memory step loop") {
    val root = Files.createTempDirectory("exr_longrun").toString
    val (outDir, idxDir, ckpt, feed) =
      (s"$root/out", s"$root/idx", s"$root/ckpt", s"$root/feed")
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
    val nDeliveries = 8

    // the durable path: one micro-batch per doc_id mod class, drained
    // fully before the next lands (deterministic batch ids 0..7)
    docs.filter(col("doc_id") % nDeliveries === 0).coalesce(1)
      .write.parquet(feed)
    val q = Dedup.startExactRunsSink(
      spark.readStream.schema(docs.schema).parquet(feed), outDir, idxDir, ckpt)
    try {
      q.processAllAvailable()
      for (d <- 1 until nDeliveries) {
        docs.filter(col("doc_id") % nDeliveries === d).coalesce(1)
          .write.mode("append").parquet(feed)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = reportRows(Dedup.readSegments(spark, outDir))

    // the in-memory reference: the same step function driven by a
    // driver loop over the same splits (collect each delta before the
    // next step so the lazy report never outlives its caches)
    var idx = Dedup.emptyGramIndex(spark)
    val want = scala.collection.mutable.ArrayBuffer.empty[String]
    for (d <- 0 until nDeliveries) {
      val batch = docs.filter(col("doc_id") % nDeliveries === d)
      val (rep, _, acc) = Dedup.exactRunsIncrementalStep(batch, idx)
      want ++= rep.withColumn("delivery", lit(d + 1L))
        .select(col("doc_a"), col("doc_b"), col("max_run_tokens"),
          col("n_runs"), col("delivery"))
        .collect().map(_.toString)
      idx = acc
    }
    assert(got == want.sorted.toSeq)
    // non-trivial: the report accumulates across deliveries, and at
    // least one pair was detected by the CROSS-delivery match path
    assert(got.nonEmpty)
    val deliveries = Dedup.readSegments(spark, outDir)
      .select(col("delivery")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(deliveries.exists(_ >= 2),
      s"no cross/later-delivery reports at all: $deliveries")
    graft.store.Checkpoints.free(spark)
  }

  test("compaction: folds keep the report identical and bound the segment count") {
    val root = Files.createTempDirectory("exr_compact").toString
    val (outDir, idxDir, ckpt, feed) =
      (s"$root/out", s"$root/idx", s"$root/ckpt", s"$root/feed")
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
    val nDeliveries = 6
    docs.filter(col("doc_id") % nDeliveries === 0).coalesce(1)
      .write.parquet(feed)
    val q = Dedup.startExactRunsSink(
      spark.readStream.schema(docs.schema).parquet(feed), outDir, idxDir,
      ckpt, compactEvery = 2)
    try {
      q.processAllAvailable()
      for (d <- 1 until nDeliveries) {
        docs.filter(col("doc_id") % nDeliveries === d).coalesce(1)
          .write.mode("append").parquet(feed)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = reportRows(Dedup.readSegments(spark, outDir))

    // reference: the same deliveries through the in-memory step loop
    var idx = Dedup.emptyGramIndex(spark)
    val want = scala.collection.mutable.ArrayBuffer.empty[String]
    for (d <- 0 until nDeliveries) {
      val (rep, _, acc) = Dedup.exactRunsIncrementalStep(
        docs.filter(col("doc_id") % nDeliveries === d), idx)
      want ++= rep.withColumn("delivery", lit(d + 1L))
        .select(col("doc_a"), col("doc_b"), col("max_run_tokens"),
          col("n_runs"), col("delivery"))
        .collect().map(_.toString)
      idx = acc
    }
    assert(got == want.sorted.toSeq)
    // the fold really bounded the gram-segment population: with
    // compactEvery=2 over 6 deliveries the tree holds at most the
    // last uncompacted deliveries plus one fold, never all 6
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(idxDir))
      .filter(_.isDirectory).map(_.getPath.getName).toSeq
    assert(segs.length < nDeliveries, s"no fold happened: $segs")
    assert(segs.exists(_.startsWith("seg_compact_")), s"no fold dir: $segs")
    graft.store.Checkpoints.free(spark)
  }

  test("replay after compaction is idempotent (the crash window)") {
    val root = Files.createTempDirectory("exr_replay_compact").toString
    val (outDir, idxDir) = (s"$root/out", s"$root/idx")
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    Dedup.exactRunsCommit(even, outDir, idxDir, 0L)
    Dedup.exactRunsCommit(odd, outDir, idxDir, 1L)
    // the crash window: batch 1's grams are folded into a compact
    // segment BEFORE its checkpoint commit, so the replay sees its own
    // grams in the index — the distinct-occurrence cap and the
    // matched-position distinct must make the recomputed report
    // identical anyway
    Dedup.compactSegments(spark, idxDir, Seq("doc_id", "pos", "g"))
    val before = reportRows(Dedup.readSegments(spark, outDir))
    Dedup.exactRunsCommit(odd, outDir, idxDir, 1L)
    val after = reportRows(Dedup.readSegments(spark, outDir))
    assert(after == before)
    graft.store.Checkpoints.free(spark)
  }

  test("replay idempotence: re-committing a finished batch changes nothing") {
    val root = Files.createTempDirectory("exr_replay").toString
    val (outDir, idxDir) = (s"$root/out", s"$root/idx")
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    Dedup.exactRunsCommit(even, outDir, idxDir, 0L)
    Dedup.exactRunsCommit(odd, outDir, idxDir, 1L)
    val before = reportRows(Dedup.readSegments(spark, outDir))
    // a replayed batch 1 must read only gram segments with id < 1 —
    // never its own crashed attempt's delta — and so recompute the
    // identical report and overwrite its own segments byte-for-byte
    // semantically
    Dedup.exactRunsCommit(odd, outDir, idxDir, 1L)
    val after = reportRows(Dedup.readSegments(spark, outDir))
    assert(after == before)
    graft.store.Checkpoints.free(spark)
  }
}
