package graft

import graft.similarity.Similarity
import graft.store.{AnnIndex, Compaction, TextIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Fold compaction for the persisted stores: serve must be
  * BIT-IDENTICAL before and after a fold, the deletes table and the
  * per-batch segment files must collapse, and a torn batch must
  * neither leak rows into the fold nor lose its tombstones.
  */
class CompactionSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"cmp_$tag").toString + "/idx"

  private def queryLits(dir: String) =
    Similarity.materializeSmall(
      Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath.getName)
  }

  test("PQ fold: serve bit-identical, deletes truncated, segments back to one file") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val root = tmpRoot("pq")
    AnnIndex.buildPq(emb.filter(col("vec_id") < half), root)
    AnnIndex.appendPqBatch(emb.filter(col("vec_id") >= half), root, 0L)
    import spark.implicits._
    AnnIndex.deleteVectors(spark, root,
      emb.filter(col("vec_id") % 17 === 3).select(col("vec_id")))
    val q = queryLits(Sf0001)
    val before = AnnIndex.servePqTopk(spark, root, q).collect().toSeq
    val beforeSq8 = AnnIndex.servePqTopkSq8(spark, root, q).collect().toSeq
    assert(dataFiles(s"$root/codes").size >= 2, "fixture lacks segments")
    assert(fs(root).exists(new Path(s"$root/deletes")))

    Compaction.compactPqStore(spark, root)

    assert(AnnIndex.servePqTopk(spark, root, q).collect().toSeq == before)
    assert(AnnIndex.servePqTopkSq8(spark, root, q).collect().toSeq == beforeSq8)
    assert(!fs(root).exists(new Path(s"$root/deletes")),
      "deletes not truncated")
    Seq("codes", "vnorms", "vecs8", "attrs").foreach { sub =>
      assert(dataFiles(s"$root/$sub").size == 1, s"$sub not folded")
    }
    // tombstoned rows are physically gone from every sub-table
    val badIds = emb.filter(col("vec_id") % 17 === 3)
      .select(col("vec_id")).as[Long].collect().toSet
    Seq("codes", "vnorms", "vecs8", "attrs").foreach { sub =>
      val n = spark.read.parquet(s"$root/$sub")
        .filter(col("vec_id").isInCollection(badIds)).count()
      assert(n == 0, s"$sub still holds $n tombstoned rows")
    }
    // idempotent: a second fold changes nothing
    val snap = AnnIndex.servePqTopk(spark, root, q).collect().toSeq
    Compaction.compactPqStore(spark, root)
    assert(AnnIndex.servePqTopk(spark, root, q).collect().toSeq == snap)
  }

  test("IVF fold: cell layout and partition pruning survive, serve identical") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val root = tmpRoot("ivf")
    AnnIndex.buildIvf(emb.filter(col("vec_id") < half), root)
    AnnIndex.appendIvfBatch(emb.filter(col("vec_id") >= half), root, 0L)
    AnnIndex.deleteVectors(spark, root,
      emb.filter(col("vec_id") % 13 === 5).select(col("vec_id")))
    val q = queryLits(Sf0001)
    val before = AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq

    Compaction.compactIvfStore(spark, root)

    val served = AnnIndex.serveIvfTopk(spark, root, q)
    assert(served.collect().toSeq == before)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).take(200).contains("cell"),
      "fold broke the probe's partition pruning")
    assert(!fs(root).exists(new Path(s"$root/deletes")))
    // each surviving cell folds to one file
    val f = fs(root)
    f.listStatus(new Path(s"$root/lists")).filter(_.isDirectory).foreach { d =>
      assert(dataFiles(d.getPath.toString).size == 1,
        s"cell ${d.getPath.getName} not folded")
    }
    // tombstoned rows physically removed
    assert(spark.read.parquet(s"$root/lists")
      .filter(col("vec_id") % 13 === 5).count() == 0)
  }

  test("IVFPQ fold: composed store folds, serve identical") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val root = tmpRoot("ivfpq")
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") < half), root)
    AnnIndex.appendIvfPqBatch(emb.filter(col("vec_id") >= half), root, 0L)
    AnnIndex.deleteVectors(spark, root,
      emb.filter(col("vec_id") % 19 === 7).select(col("vec_id")))
    val q = queryLits(Sf0001)
    val before = AnnIndex.serveIvfPqTopk(spark, root, q).collect().toSeq
    Compaction.compactIvfPqStore(spark, root)
    assert(AnnIndex.serveIvfPqTopk(spark, root, q).collect().toSeq == before)
    assert(dataFiles(s"$root/vnorms").size == 1)
    assert(spark.read.parquet(s"$root/cellcodes")
      .filter(col("vec_id") % 19 === 7).count() == 0)
  }

  test("lexical fold: df/stats delta segments collapse to one, BM25 identical") {
    val docs = Tables.documents(spark, Sf0001)
    val n = docs.count()
    val root = tmpRoot("lex")
    TextIndex.build(docs.filter(col("doc_id") < n / 4), root)
    TextIndex.appendBatch(
      docs.filter(col("doc_id") >= n / 4 && col("doc_id") < n / 2), root, 0L)
    TextIndex.appendBatch(
      docs.filter(col("doc_id") >= n / 2 && col("doc_id") < 3 * n / 4), root, 1L)
    TextIndex.appendBatch(docs.filter(col("doc_id") >= 3 * n / 4), root, 2L)
    val before = TextIndex.serveBm25(spark, root).collect().toSeq
    assert(before.nonEmpty)
    assert(dataFiles(s"$root/df").size == 4, "fixture lacks df segments")

    Compaction.compactLexStore(spark, root)

    assert(TextIndex.serveBm25(spark, root).collect().toSeq == before)
    Seq("postings", "df", "dl", "stats").foreach { sub =>
      assert(dataFiles(s"$root/$sub").size == 1, s"$sub not folded")
    }
    // the semantic folds really aggregated: one stats row, unique toks
    assert(spark.read.parquet(s"$root/stats").count() == 1)
    val dfreq = spark.read.parquet(s"$root/df")
    assert(dfreq.count() == dfreq.select(col("tok")).distinct().count())
    // and the folded index still equals a one-shot build of the corpus
    val freshRoot = tmpRoot("lexfresh")
    TextIndex.build(docs, freshRoot)
    assert(TextIndex.serveBm25(spark, root).collect().toSeq ==
      TextIndex.serveBm25(spark, freshRoot).collect().toSeq)
  }

  test("lexical takedown: negative deltas equal a rebuild without the docs; fold removes them physically") {
    val docs = Tables.documents(spark, Sf0001)
    val root = tmpRoot("lexdel")
    TextIndex.build(docs, root)
    val deadIds = docs.filter(col("doc_id") % 7 === 3 && col("doc_id") >= 10)
      .select(col("doc_id"))
    TextIndex.deleteDocs(spark, root, deadIds, 0L)
    // ground truth: an index that never contained the deleted docs
    val refRoot = tmpRoot("lexdelref")
    TextIndex.build(docs.join(deadIds, Seq("doc_id"), "left_anti"), refRoot)
    val got = TextIndex.serveBm25(spark, root).collect().toSeq
    assert(got.nonEmpty)
    assert(got == TextIndex.serveBm25(spark, refRoot).collect().toSeq,
      "tombstone + negative deltas diverged from the clean rebuild")
    // a replayed takedown batch short-circuits; a later batch with the
    // same ids subtracts nothing (idempotence both ways)
    TextIndex.deleteDocs(spark, root, deadIds, 0L)
    TextIndex.deleteDocs(spark, root, deadIds, 1L)
    assert(TextIndex.serveBm25(spark, root).collect().toSeq == got,
      "repeated takedown double-subtracted")
    // fold: rows physically gone, deletes truncated, serve identical
    Compaction.compactLexStore(spark, root)
    assert(TextIndex.serveBm25(spark, root).collect().toSeq == got)
    assert(!fs(root).exists(new Path(s"$root/deletes")))
    import spark.implicits._
    val deadSet = deadIds.as[Long].collect().toSet
    assert(spark.read.parquet(s"$root/postings")
      .filter(col("doc_id").isInCollection(deadSet)).count() == 0)
    assert(dataFiles(s"$root/df").size == 1)
    // folded df equals the clean rebuild's df, row for row
    val fold = spark.read.parquet(s"$root/df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = spark.read.parquet(s"$refRoot/df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fold == ref, "folded df diverged from the clean rebuild")
  }

  test("torn batch: fold drops its files, keeps the tombstones, replay heals") {
    val emb = Tables.embeddings(spark, Sf0001)
    val n = emb.count()
    val half = n / 2
    val root = tmpRoot("torn")
    AnnIndex.buildPq(emb.filter(col("vec_id") < half), root)
    // batch 0 commits; batch 1 tears (promoted, marker lost)
    val delta0 = emb.filter(col("vec_id") >= half)
    val delta1 = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 70001L).as("vec_id"), col("label"),
        col("embedding"))
    AnnIndex.appendPqBatch(delta0, root, 0L)
    AnnIndex.appendPqBatch(delta1, root, 1L)
    val f = fs(root)
    f.delete(new Path(s"$root/_committed/batch-1"), false)
    // a tombstone aimed at a torn row: must survive the fold
    import spark.implicits._
    AnnIndex.deleteVectors(spark, root, Seq(70001L).toDF("vec_id"))

    Compaction.compactPqStore(spark, root)

    // torn rows excluded from the fold (they will replay), tombstones kept
    assert(spark.read.parquet(s"$root/codes")
      .filter(col("vec_id") >= 70001L).count() == 0,
      "fold committed a torn batch's rows")
    assert(f.exists(new Path(s"$root/deletes")),
      "deletes truncated while a batch was torn")
    // the replay lands batch 1 exactly once; its tombstoned row stays dead
    AnnIndex.appendPqBatch(delta1, root, 1L)
    val codes = spark.read.parquet(s"$root/codes")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
    assert(codes.count() == n + 3)
    assert(codes.filter(col("c") =!= 8).count() == 0)
    val q = Similarity.materializeSmall(
      emb.filter(col("vec_id") === 1)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    assert(!AnnIndex.servePqTopk(spark, root, q).collect()
      .exists(_.getAs[Long]("neighbor_id") == 70001L),
      "tombstoned torn row resurrected after replay")
    // with the batch landed, the next fold truncates deletes
    Compaction.compactPqStore(spark, root)
    assert(!f.exists(new Path(s"$root/deletes")))
    assert(spark.read.parquet(s"$root/codes")
      .filter(col("vec_id") === 70001L).count() == 0)
  }

  test("torn takedown: fold must not act on a torn batch's tombstones; replay heals exactly") {
    val docs = Tables.documents(spark, Sf0001)
    val root = tmpRoot("lextorn")
    TextIndex.build(docs, root)
    val idsA = docs.filter(col("doc_id") % 13 === 4 && col("doc_id") >= 10)
      .select(col("doc_id"))
    val idsB = docs.filter(col("doc_id") % 13 === 7 && col("doc_id") >= 10)
      .select(col("doc_id"))
    TextIndex.deleteDocs(spark, root, idsA, 0L) // committed takedown
    TextIndex.deleteDocs(spark, root, idsB, 1L)
    val f = fs(root)
    f.delete(new Path(s"$root/_committed/batch-1"), false) // batch 1 tears

    Compaction.compactLexStore(spark, root)

    import spark.implicits._
    val aSet = idsA.as[Long].collect().toSet
    val bSet = idsB.as[Long].collect().toSet
    // committed tombstones acted on; torn ones NOT (their negative
    // deltas are equally torn — acting would corrupt df/stats forever)
    assert(spark.read.parquet(s"$root/postings")
      .filter(col("doc_id").isInCollection(aSet)).count() == 0)
    assert(spark.read.parquet(s"$root/postings")
      .filter(col("doc_id").isInCollection(bSet)).count() > 0,
      "fold removed a torn takedown's rows")
    assert(f.exists(new Path(s"$root/deletes")),
      "deletes truncated while a takedown batch was torn")

    // the replay must re-deliver B IN FULL (its rolled-back tombstone
    // file must not count as 'already deleted')
    TextIndex.deleteDocs(spark, root, idsB, 1L)
    val refRoot = tmpRoot("lextornref")
    TextIndex.build(docs
      .filter(!col("doc_id").isInCollection(aSet ++ bSet)), refRoot)
    assert(TextIndex.serveBm25(spark, root).collect().toSeq ==
      TextIndex.serveBm25(spark, refRoot).collect().toSeq,
      "post-replay statistics diverged from the clean rebuild")
    // with everything landed, the next fold truncates and stays exact
    Compaction.compactLexStore(spark, root)
    assert(!f.exists(new Path(s"$root/deletes")))
    assert(TextIndex.serveBm25(spark, root).collect().toSeq ==
      TextIndex.serveBm25(spark, refRoot).collect().toSeq)
  }

  test("streaming takedown: delete requests drain through both stores' sinks") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, Sf0001)
    val q = Similarity.materializeSmall(
      emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    // ANN: ids arrive as a file-source stream; tombstones land at
    // least once, serve anti-join dedups
    val pqRoot = tmpRoot("delstream")
    AnnIndex.buildPq(emb, pqRoot)
    val before = AnnIndex.servePqTopk(spark, pqRoot, q).collect()
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(before.nonEmpty)
    val victim = before.head
    val feed = java.nio.file.Files.createTempDirectory("del_feed").toString + "/f"
    Seq(victim).toDF("vec_id").write.parquet(feed)
    val ckpt = java.nio.file.Files.createTempDirectory("del_ckpt").toString
    val qs = AnnIndex.startDeleteSink(
      spark.readStream.schema("vec_id LONG").parquet(feed), pqRoot, ckpt)
    try qs.processAllAvailable() finally qs.stop()
    assert(!AnnIndex.servePqTopk(spark, pqRoot, q).collect()
      .exists(_.getAs[Long]("neighbor_id") == victim))

    // lexical: the negative-delta takedown through the stream, equal
    // to a clean rebuild without the docs
    val docs = Tables.documents(spark, Sf0001)
    val lexRoot = tmpRoot("lexdelstream")
    TextIndex.build(docs, lexRoot)
    val dead = docs.filter(col("doc_id") % 11 === 5 && col("doc_id") >= 10)
      .select(col("doc_id"))
    val lfeed = java.nio.file.Files.createTempDirectory("ldel_feed").toString + "/f"
    dead.write.parquet(lfeed)
    val lckpt = java.nio.file.Files.createTempDirectory("ldel_ckpt").toString
    val lq = TextIndex.startDeleteSink(
      spark.readStream.schema("doc_id LONG").parquet(lfeed), lexRoot, lckpt)
    try lq.processAllAvailable() finally lq.stop()
    val refRoot = tmpRoot("lexdelstreamref")
    TextIndex.build(docs.join(dead, Seq("doc_id"), "left_anti"), refRoot)
    assert(TextIndex.serveBm25(spark, lexRoot).collect().toSeq ==
      TextIndex.serveBm25(spark, refRoot).collect().toSeq)
  }

  test("swap recovery: a crash between the two renames heals on the next fold") {
    val emb = Tables.embeddings(spark, Sf0001)
    val root = tmpRoot("recover")
    AnnIndex.buildPq(emb, root)
    val q = queryLits(Sf0001)
    val before = AnnIndex.servePqTopk(spark, root, q).collect().toSeq
    // simulate the crash window: live dir renamed aside, promote lost
    val f = fs(root)
    assert(f.rename(new Path(s"$root/vecs8"), new Path(s"$root/vecs8__old")))
    Compaction.compactPqStore(spark, root)
    assert(AnnIndex.servePqTopk(spark, root, q).collect().toSeq == before)
    assert(AnnIndex.servePqTopkSq8(spark, root, q).collect().nonEmpty)
    assert(!f.exists(new Path(s"$root/vecs8__old")))
  }
}
