package graft

import java.nio.file.Files

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Durability and cost-shape guarantees of the incremental dedup sink's
  * append-only segment lifecycle (`Dedup.incrementalCommit`):
  * crash-replay idempotence at every window, O(batch) index writes,
  * no silent empty-index resurrection, and the short-doc survivor rule.
  */
class IncrementalSinkSpec extends SparkSpec {
  import spark.implicits._

  private def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def keptIds(outDir: String): Seq[Long] =
    Dedup.readSegments(spark, outDir).select("doc_id").as[Long].collect().sorted.toSeq

  test("crash between survivor write and index write: replay leaks no dups") {
    val root = Files.createTempDirectory("incr_crash1")
    val (out, idx) = (s"$root/out", s"$root/idx")
    val b1 = docsDf((1L, words("alpha", 30)), (5L, words("beta", 30)))
    Dedup.incrementalCommit(b1, out, idx, 0)
    // batch 2 carries a cross-delivery dup of doc 5 — and crashes after
    // its survivors landed but before its index delta did
    val b2 = docsDf((2L, words("beta", 30)), (4L, words("gamma", 30)))
    intercept[RuntimeException] {
      Dedup.incrementalCommit(b2, out, idx, 1, crash = Dedup.CrashAfterSurvivorWrite)
    }
    // the failed attempt's survivor segment is on disk; the index is
    // exactly the pre-batch state (no delta segment)
    assert(Dedup.readIndex(spark, idx).select("doc_id").distinct().count() == 2)
    // replay of batch 1 and 2 (checkpoint never advanced past either):
    // both overwrite their own segments — no duplicated rows, dup of
    // doc 5 still dead
    Dedup.incrementalCommit(b2, out, idx, 1)
    assert(keptIds(out) == Seq(1L, 4L, 5L))
    // batch 3 dedups against the now-complete index: a dup of batch 2's
    // survivor (gamma) dies — proof the index recovered, not emptied
    val b3 = docsDf((7L, words("gamma", 30)), (9L, words("delta", 30)))
    Dedup.incrementalCommit(b3, out, idx, 2)
    assert(keptIds(out) == Seq(1L, 4L, 5L, 9L))
  }

  test("crash after index write, before checkpoint commit: replay is idempotent") {
    val root = Files.createTempDirectory("incr_crash2")
    val (out, idx) = (s"$root/out", s"$root/idx")
    val b1 = docsDf(
      (1L, words("alpha", 30)), (3L, words("alpha", 30)), (5L, words("beta", 30)))
    Dedup.incrementalCommit(b1, out, idx, 0)
    val (kept0, idx0) = (keptIds(out),
      Dedup.readIndex(spark, idx).count())
    // full replay of the SAME batchId — the state a crash between the
    // index write and the streaming checkpoint commit produces. The
    // batch's own band rows are already indexed; the same-doc_id
    // exclusion must keep every decision identical.
    Dedup.incrementalCommit(b1, out, idx, 0)
    assert(keptIds(out) == kept0)
    assert(Dedup.readIndex(spark, idx).count() == idx0)
    assert(kept0 == Seq(1L, 5L)) // within-batch dup 3 stayed dead on replay
  }

  test("per-batch index write is O(batch): 8 band rows per batch survivor") {
    val root = Files.createTempDirectory("incr_obatch")
    val (out, idx) = (s"$root/out", s"$root/idx")
    // batch 1: a large-ish corpus of 40 unique docs
    val b1 = docsDf((1L to 40L).map(i => (i, words(s"corpus$i", 30))): _*)
    Dedup.incrementalCommit(b1, out, idx, 0)
    // batch 2: 3 docs, 1 a cross-delivery dup → 2 survivors
    val b2 = docsDf((101L, words("corpus7", 30)), (102L, words("fresh", 30)),
      (103L, words("fresher", 30)))
    Dedup.incrementalCommit(b2, out, idx, 1)
    // batch 2's own segment carries ONLY its survivors' band rows —
    // 2 docs × 8 bands — not the 40-doc accumulated corpus
    val seg1 = spark.read.schema(Dedup.indexSchema).parquet(s"$idx/seg_1")
    assert(seg1.count() == 16, s"seg_1 rows = ${seg1.count()}")
    assert(seg1.select("doc_id").distinct().as[Long].collect().sorted.toSeq
      == Seq(102L, 103L))
    // while the unioned index covers the whole corpus
    assert(Dedup.readIndex(spark, idx).select("doc_id").distinct().count() == 42)
  }

  test("short docs (no 3-shingle) are automatic survivors, never each other's dups") {
    val root = Files.createTempDirectory("incr_short")
    val (out, idx) = (s"$root/out", s"$root/idx")
    // two UNRELATED two-token docs: an empty shingle set used to minhash
    // to the all-identity signature, colliding in every band with
    // estimate 1.0 — both must survive, and neither may emit index rows
    val b1 = docsDf((1L, "hello world"), (2L, "goodbye moon"),
      (3L, words("alpha", 30)))
    Dedup.incrementalCommit(b1, out, idx, 0)
    assert(keptIds(out) == Seq(1L, 2L, 3L))
    val idxIds = Dedup.readIndex(spark, idx).select("doc_id").distinct()
      .as[Long].collect().toSeq
    assert(idxIds == Seq(3L), s"index ids = $idxIds")
    // a later short doc doesn't dedup against the earlier ones either
    Dedup.incrementalCommit(docsDf((9L, "tiny doc")), out, idx, 1)
    assert(keptIds(out) == Seq(1L, 2L, 3L, 9L))
  }

  test("readIndex: missing dir reads empty; a corrupt segment propagates, not empties") {
    val root = Files.createTempDirectory("incr_read")
    val idx = s"$root/idx"
    assert(Dedup.readIndex(spark, idx).count() == 0) // genuinely absent: empty seed
    // a corrupt (non-parquet) file in an existing index must surface as
    // an error — the old catch(Throwable => emptyIndex) would silently
    // resurrect an EMPTY index and re-admit every cross-delivery dup
    Files.createDirectories(java.nio.file.Paths.get(s"$idx/seg_0"))
    Files.write(java.nio.file.Paths.get(s"$idx/seg_0/part-garbage.parquet"),
      "not a parquet file".getBytes)
    intercept[Exception] {
      Dedup.readIndex(spark, idx).count()
    }
  }
}
