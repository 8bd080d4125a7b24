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
}
