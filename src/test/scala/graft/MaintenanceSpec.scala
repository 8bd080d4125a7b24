package graft

import graft.similarity.Similarity
import graft.store.{AnnIndex, Maintenance, StoreRoot, TextIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The policy-driven maintenance pass: one run fires exactly the
  * certified ops each store needs (fold on tombstones/segment growth,
  * split on census skew, retention on stale roots), never changes a
  * served result, and a second immediate run takes no action.
  */
class MaintenanceSpec extends SparkSpec {

  private def queryLits(dir: String) =
    Similarity.materializeSmall(
      Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))

  test("one pass: retention + folds + split fire as needed, serve unchanged, second pass idle") {
    val base = java.nio.file.Files.createTempDirectory("maint").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val emb = Tables.embeddings(spark, Sf0001)
    val docs = Tables.documents(spark, Sf0001)
    val half = emb.count() / 2
    import spark.implicits._

    // PQ store with a tombstone (fold trigger #1)
    val pqRoot = new Path(s"$base/pq-aaaa1111")
    StoreRoot.ensureBuilt(spark, pqRoot)(s => AnnIndex.buildPq(emb, s))
    AnnIndex.deleteVectors(spark, pqRoot.toString, Seq(13L).toDF("vec_id"))
    // IVF store with an adversarial hot cell (split trigger)
    val ivfRoot = new Path(s"$base/ivf-bbbb2222")
    StoreRoot.ensureBuilt(spark, ivfRoot) { s =>
      AnnIndex.buildIvf(emb, s)
      val v = broadcast(emb.filter(col("vec_id") === 7L)
        .select(col("embedding").as("src_emb")))
      AnnIndex.appendIvfBatch(
        (0 until 4).map(m => emb.crossJoin(v)
          .select((col("vec_id") + lit(100000L + m * 10000L)).as("vec_id"),
            col("label"),
            transform(col("src_emb"), x => x * lit(1.0f + m * 0.0001f))
              .as("embedding"))).reduce(_ unionByName _), s, 0L)
    }
    // lexical store with many append segments (fold trigger #2)
    val lexRoot = new Path(s"$base/lex-cccc3333")
    StoreRoot.ensureBuilt(spark, lexRoot) { s =>
      TextIndex.build(docs.filter(col("doc_id") < half), s)
      (0 until 9).foreach(b => TextIndex.appendBatch(
        docs.filter(col("doc_id") >= half && col("doc_id") % 9 === b), s, b.toLong))
    }
    // a stale root (no liveness stamp) the retention leg must reap
    fs.mkdirs(new Path(s"$base/pq-dead0000"))

    val q = queryLits(Sf0001)
    val pqBefore = AnnIndex.servePqTopk(spark, pqRoot.toString, q).collect().toSeq
    val ivfBefore = AnnIndex.serveIvfTopk(spark, ivfRoot.toString, q).collect().toSeq
    val lexBefore = TextIndex.serveBm25(spark, lexRoot.toString).collect().toSeq

    val reports = Maintenance.run(spark, base, ttlMs = 3600000L)

    val actions = reports.map(r => (r.family, r.action)).toSet
    assert(actions.contains(("-", "retention")), s"no retention: $reports")
    assert(actions.contains(("pq", "fold")), s"no pq fold: $reports")
    assert(actions.contains(("lex", "fold")), s"no lex fold: $reports")
    assert(actions.contains(("ivf", "split")), s"no ivf split: $reports")
    assert(!fs.exists(new Path(s"$base/pq-dead0000")))
    assert(!fs.exists(new Path(s"$pqRoot/deletes")))
    // served results are untouched by the whole pass
    assert(AnnIndex.servePqTopk(spark, pqRoot.toString, q).collect().toSeq == pqBefore)
    assert(AnnIndex.serveIvfTopk(spark, ivfRoot.toString, q).collect().toSeq == ivfBefore)
    assert(TextIndex.serveBm25(spark, lexRoot.toString).collect().toSeq == lexBefore)
    // guard healthy after the split
    assert(AnnIndex.cellGuard(spark, ivfRoot.toString, "lists")
      .head.getAs[Long]("cells_over_bound") == 0)
    // idempotence: an immediate second pass takes no action
    assert(Maintenance.run(spark, base, ttlMs = 3600000L).isEmpty,
      "second pass was not idle")
  }

  test("crash mid root-swap: healing precedes retention, fresh __old is never reaped") {
    val base = java.nio.file.Files.createTempDirectory("maintswap").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val emb = Tables.embeddings(spark, Sf0001)
    val root = new Path(s"$base/pq-swap1111")
    StoreRoot.ensureBuilt(spark, root)(s => AnnIndex.buildPq(emb, s))
    val q = queryLits(Sf0001)
    val before = AnnIndex.servePqTopk(spark, root.toString, q).collect().toSeq
    // simulate a republish crash between swapDir's two renames: the
    // live root renamed aside, the promotion never happened — the
    // __old copy is the ONLY surviving data
    assert(fs.rename(root, new Path(root.toString + "__old")))
    // a standalone retention sweep keeps both the unstamped __old copy
    // (its freshness is the BASE root's stamp) and the stamp itself
    assert(StoreRoot.sweepStale(spark, base, ttlMs = 3600000L) == 0)
    assert(fs.exists(new Path(root.toString + "__old")), "__old reaped while fresh")
    assert(fs.exists(new Path(s"$base/_live/${root.getName}")), "stamp dropped")
    // the scheduled pass heals FIRST, then sweeps — the store survives
    Maintenance.run(spark, base, ttlMs = 3600000L)
    assert(fs.exists(root), "crashed swap not healed")
    assert(!fs.exists(new Path(root.toString + "__old")))
    assert(AnnIndex.servePqTopk(spark, root.toString, q).collect().toSeq == before)
    // a genuinely TTL-stale store is reaped WHOLE, __old included
    assert(fs.rename(root, new Path(root.toString + "__old")))
    val stamp = new Path(s"$base/_live/${root.getName}")
    fs.setTimes(stamp, System.currentTimeMillis() - 7200000L, -1)
    assert(StoreRoot.sweepStale(spark, base, ttlMs = 3600000L) >= 1)
    assert(!fs.exists(new Path(root.toString + "__old")))
    assert(!fs.exists(stamp))
  }

  test("cellGuard on a sub-table with no committed batch is a healthy census, not an exception") {
    val base = java.nio.file.Files.createTempDirectory("maintguard").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val root = s"$base/ivf-torn0001"
    Seq((0L, Array(0.1f)), (1L, Array(0.9f))).toDF("cell", "centroid")
      .write.parquet(s"$root/centroids")
    // one data file from a batch whose marker never landed: all torn
    fs.mkdirs(new Path(s"$root/lists/cell=0"))
    fs.create(new Path(s"$root/lists/cell=0/batch7-part.parquet"), true).close()
    val row = AnnIndex.cellGuard(spark, root, "lists").head
    assert(row.getAs[Long]("n_cells") == 0L)
    assert(row.getAs[Long]("cells_over_bound") == 0L)
  }

  test("split fan-out clamps below the 1024 composite radix") {
    assert(graft.store.Compaction.fanoutFor(10, 4) == 6L)
    assert(graft.store.Compaction.fanoutFor(1, 4) == 2L)
    // point mass: 10^9 rows against bound 1 would want f = 2×10^9 —
    // clamped so composite ids never alias into other parents' ranges
    assert(graft.store.Compaction.fanoutFor(1000000000L, 1L) == 1023L)
    assert(graft.store.Compaction.fanoutFor(512L * 4, 4L) == 1023L)
  }
}
