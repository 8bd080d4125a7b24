package graft

import graft.similarity.Similarity
import graft.store.AnnIndex
import org.apache.spark.sql.functions._

/** Persisted ANN index: the build-once/serve-many contract.
  *
  * The DuckDB oracle gate certifies serve VALUES (emb_pq_serve /
  * emb_ivf_serve hash-match a full SQL mirror of build+serve); this
  * spec pins the PLAN-SHAPE properties the persisted path exists for —
  * serve never scans the embeddings table, the IVF probe is partition-
  * pruned to the routed cells — plus serve ≡ in-session-twin equality
  * and build determinism across rebuilds.
  */
class AnnIndexSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"annidx_$tag").toString + "/idx"

  private def queryLits(dir: String) =
    Similarity.materializeSmall(
      Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))

  test("IVF serve from the persisted index equals the in-session twin") {
    val expect = Similarity.embIvfTopk(spark, Sf0001).collect().toSeq
    val got = AnnIndex.embIvfServe(spark, Sf0001).collect().toSeq
    assert(got == expect)
  }

  test("serve plans never scan the embeddings table; IVF probe is partition-pruned") {
    val ivf = AnnIndex.embIvfServe(spark, Sf0001)
    val pq = AnnIndex.embPqServe(spark, Sf0001)
    val ivfPlan = ivf.queryExecution.executedPlan.toString
    val pqPlan = pq.queryExecution.executedPlan.toString
    assert(!ivfPlan.contains("embeddings.parquet"), "IVF serve scans the corpus")
    assert(!pqPlan.contains("embeddings.parquet"), "PQ serve scans the corpus")
    // the routed-cell IN filter must land as a PARTITION filter on the
    // inverted-lists scan (directory pruning), not a post-scan filter
    assert(ivfPlan.contains("PartitionFilters") &&
      ivfPlan.split("PartitionFilters", 2)(1).take(200).contains("cell"),
      "IVF lists scan is not partition-pruned on cell")
  }

  test("build is deterministic: a rebuild into a fresh root serves identical top-k") {
    val emb = Tables.embeddings(spark, Sf0001)
    val q = queryLits(Sf0001)
    val (r1, r2) = (tmpRoot("pq1"), tmpRoot("pq2"))
    AnnIndex.buildPq(emb, r1)
    AnnIndex.buildPq(emb, r2)
    val a = AnnIndex.servePqTopk(spark, r1, q).collect().toSeq
    val b = AnnIndex.servePqTopk(spark, r2, q).collect().toSeq
    assert(a == b)
    assert(a.size == 50) // 10 queries x k=5, every rank filled
  }

  test("PQ serve surfaces a planted near-identical twin at rank 1") {
    // plant: vector 10010 = vector 3 with a tiny deterministic nudge —
    // ADC over 8 codebook lookups must still put it top-1 for query 3
    val emb = Tables.embeddings(spark, Sf0001)
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 10007L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    val root = tmpRoot("twin")
    AnnIndex.buildPq(planted, root)
    val q = Similarity.materializeSmall(
      planted.filter(col("vec_id") === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val rows = AnnIndex.servePqTopk(spark, root, q).collect()
    val twin = rows.find(_.getAs[Long]("neighbor_id") == 10010L)
    assert(twin.isDefined, s"planted twin missing from top-5: ${rows.toSeq}")
    // the twin carries the maximal ADC score (rank 1 modulo exact
    // same-code ties, which resolve to the lowest id by contract)
    val best = rows.map(_.getAs[Double]("pq_cos")).max
    assert(twin.get.getAs[Double]("pq_cos") == best,
      s"planted twin not at the top ADC score: ${rows.toSeq}")
  }

  test("IVF append: frozen centroids, delta assigned exactly as a full build would") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val base = emb.filter(col("vec_id") < half)
    val delta = emb.filter(col("vec_id") >= half)
    val (rFull, rApp) = (tmpRoot("ivffull"), tmpRoot("ivfapp"))
    // reference: one build whose quantizer trained on the base but
    // whose lists hold the full corpus — constructed by building on
    // base then bulk-assigning everything in one shot
    AnnIndex.buildIvf(base, rFull)
    AnnIndex.appendIvf(delta, rFull)
    // the incremental path under test: same build, append in two slices
    // (append must compose — two deltas == one delta)
    AnnIndex.buildIvf(base, rApp)
    val mid = half + (emb.count() - half) / 2
    AnnIndex.appendIvf(delta.filter(col("vec_id") < mid), rApp)
    AnnIndex.appendIvf(delta.filter(col("vec_id") >= mid), rApp)
    val q = queryLits(Sf0001)
    val a = AnnIndex.serveIvfTopk(spark, rFull, q).collect().toSeq
    val b = AnnIndex.serveIvfTopk(spark, rApp, q).collect().toSeq
    assert(a == b, "append is not slice-composable")
    // centroids untouched by append (the frozen-quantizer contract)
    val centAfter = spark.read.parquet(s"$rApp/centroids")
      .orderBy(col("cell")).collect().toSeq
    val centBase = {
      val rB = tmpRoot("ivfbase")
      AnnIndex.buildIvf(base, rB)
      spark.read.parquet(s"$rB/centroids").orderBy(col("cell")).collect().toSeq
    }
    assert(centAfter == centBase, "append mutated the trained centroids")
    // lists hold exactly the full corpus, no duplicates
    val ids = spark.read.parquet(s"$rApp/lists").select(col("vec_id"))
    assert(ids.count() == emb.count() && ids.distinct().count() == emb.count())
  }

  test("PQ append: a twin planted in the DELTA is served for a BASE query") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val root = tmpRoot("pqapp")
    AnnIndex.buildPq(emb.filter(col("vec_id") < half), root)
    // delta = second half PLUS a near-copy of base vector 3
    val delta = emb.filter(col("vec_id") >= half).unionByName(
      emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 10007L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    AnnIndex.appendPq(delta, root)
    val q = Similarity.materializeSmall(
      emb.filter(col("vec_id") === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val rows = AnnIndex.servePqTopk(spark, root, q).collect()
    val twin = rows.find(_.getAs[Long]("neighbor_id") == 10010L)
    assert(twin.isDefined, s"appended twin not served: ${rows.toSeq}")
    assert(twin.get.getAs[Double]("pq_cos") ==
      rows.map(_.getAs[Double]("pq_cos")).max,
      s"appended twin not at the top ADC score: ${rows.toSeq}")
  }

  test("SQ8 rescore tier: embeddings-free plan; rescored cosine beats raw ADC on the twin") {
    val emb = Tables.embeddings(spark, Sf0001)
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 10007L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    val root = tmpRoot("sq8")
    AnnIndex.buildPq(planted, root)
    val q = Similarity.materializeSmall(
      planted.filter(col("vec_id") === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val df = AnnIndex.servePqTopkSq8(spark, root, q)
    assert(!df.queryExecution.executedPlan.toString.contains("embeddings.parquet"),
      "SQ8 serve scans the corpus")
    val rows = df.collect()
    val top = rows.minBy(_.getAs[Long]("rank"))
    // int8 keeps ~2 decimal digits of cosine: the near-identical twin
    // rescores to ~1.0 and must take rank 1
    assert(top.getAs[Long]("neighbor_id") == 10010L, s"twin not rank 1: ${rows.toSeq}")
    assert(top.getAs[Double]("q8_cos") > 0.99, s"twin q8_cos suspicious: $top")
  }

  test("IVFPQ: routed, partition-pruned, codes-only serve; twin surfaces through both quantizers") {
    val emb = Tables.embeddings(spark, Sf0001)
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 10007L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    val root = tmpRoot("ivfpq")
    AnnIndex.buildIvfPq(planted, root)
    val q = Similarity.materializeSmall(
      planted.filter(col("vec_id") === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val df = AnnIndex.serveIvfPqTopk(spark, root, q)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"), "IVFPQ serve scans the corpus")
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).take(200).contains("cell"),
      "IVFPQ code scan is not partition-pruned")
    // the twin lands in the query's own coarse cell (cosine ≈ 1 to the
    // same centroid) and its codes match — it must surface through the
    // route AND take the top ADC score
    val rows = df.collect()
    val twin = rows.find(_.getAs[Long]("neighbor_id") == 10010L)
    assert(twin.isDefined, s"twin lost by the composed index: ${rows.toSeq}")
    assert(twin.get.getAs[Double]("pq_cos") ==
      rows.map(_.getAs[Double]("pq_cos")).max)
  }

  test("IVFPQ two-tier serve: routed ADC cut + SQ8 rescore, embeddings-free, twin at rank 1") {
    val emb = Tables.embeddings(spark, Sf0001)
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 10007L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    val root = tmpRoot("ivfpqsq8")
    AnnIndex.buildIvfPq(planted, root)
    val q = Similarity.materializeSmall(
      planted.filter(col("vec_id") === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val df = AnnIndex.serveIvfPqTopkSq8(spark, root, q)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "IVFPQ SQ8 serve scans the corpus")
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).take(300).contains("cell"))
    val rows = df.collect()
    val top = rows.minBy(_.getAs[Long]("rank"))
    assert(top.getAs[Long]("neighbor_id") == 10010L, s"twin not rank 1: ${rows.toSeq}")
    assert(top.getAs[Double]("q8_cos") > 0.99)
  }

  test("IVFPQ append: delta routed and coded by the frozen quantizers, twin served") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val root = tmpRoot("ivfpqapp")
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") < half), root)
    val delta = emb.filter(col("vec_id") >= half).unionByName(
      emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 10007L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    AnnIndex.appendIvfPq(delta, root)
    val q = Similarity.materializeSmall(
      emb.filter(col("vec_id") === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val rows = AnnIndex.serveIvfPqTopk(spark, root, q).collect()
    val twin = rows.find(_.getAs[Long]("neighbor_id") == 10010L)
    assert(twin.isDefined, s"appended twin not routed+served: ${rows.toSeq}")
    assert(twin.get.getAs[Double]("pq_cos") ==
      rows.map(_.getAs[Double]("pq_cos")).max)
    // the code table holds base + delta, once each
    val ids = spark.read.parquet(s"$root/cellcodes")
      .select(col("vec_id")).distinct()
    assert(ids.count() == emb.count() + 1)
  }

  test("tombstones: a deleted twin vanishes from serve, ranks close densely, no rebuild") {
    val emb = Tables.embeddings(spark, Sf0001)
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 3)
        .select((col("vec_id") + 10007L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    val root = tmpRoot("tomb")
    AnnIndex.buildPq(planted, root)
    val q = Similarity.materializeSmall(
      planted.filter(col("vec_id") === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    import spark.implicits._
    val before = AnnIndex.servePqTopk(spark, root, q).collect()
    assert(before.exists(_.getAs[Long]("neighbor_id") == 10010L))
    AnnIndex.deleteVectors(spark, root, Seq(10010L).toDF("vec_id"))
    val after = AnnIndex.servePqTopk(spark, root, q).collect()
    assert(!after.exists(_.getAs[Long]("neighbor_id") == 10010L),
      s"tombstoned vector still served: ${after.toSeq}")
    // ranks re-close densely over the survivors
    assert(after.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 5L))
    // the delete displaced exactly the twin: the other four survive
    val beforeIds = before.map(_.getAs[Long]("neighbor_id")).toSet - 10010L
    val afterIds = after.map(_.getAs[Long]("neighbor_id")).toSet
    assert(beforeIds.subsetOf(afterIds))
  }

  test("streaming delta maintains the PQ index: exactly-once under replay and torn promote") {
    val emb = Tables.embeddings(spark, Sf0001)
    val n = emb.count()
    val half = n / 2
    val base = emb.filter(col("vec_id") < half)
    val delta = emb.filter(col("vec_id") >= half)
    val root = tmpRoot("stream")
    AnnIndex.buildPq(base, root)
    // reference: the certified one-shot append onto an identical base
    val refRoot = tmpRoot("streamref")
    AnnIndex.buildPq(base, refRoot)
    AnnIndex.appendPq(delta, refRoot)
    // the delta arrives as a real stream (file source -> foreachBatch)
    val deltaDir = java.nio.file.Files.createTempDirectory("pq_delta")
      .toString + "/files"
    delta.write.parquet(deltaDir)
    val ckpt = java.nio.file.Files.createTempDirectory("pq_ckpt").toString
    val q = AnnIndex.startPqAppendSink(
      spark.readStream.schema(emb.schema).parquet(deltaDir), root, ckpt)
    q.processAllAvailable()
    q.stop()
    val qdf = queryLits(Sf0001)
    assert(AnnIndex.servePqTopk(spark, root, qdf).collect().toSeq ==
      AnnIndex.servePqTopk(spark, refRoot, qdf).collect().toSeq)
    // at-least-once replay of the stream's batch: marker short-circuits
    AnnIndex.appendPqBatch(delta, root, 0L)
    // crash-after-marker residue: a dead staging copy must be reaped by
    // the short-circuited replay, not leak forever
    val fsPre = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deadStaging = new org.apache.hadoop.fs.Path(s"$root/_staging/batch-0/codes")
    fsPre.mkdirs(deadStaging)
    AnnIndex.appendPqBatch(delta, root, 0L)
    assert(!fsPre.exists(deadStaging.getParent),
      "short-circuited replay left the dead staging copy")
    val codeIds = spark.read.parquet(s"$root/codes")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
    assert(codeIds.count() == n, "replayed batch double-coded the delta")
    assert(codeIds.filter(col("c") =!= 8).count() == 0)
    // torn promote: commit an extra batch, crash between promote and
    // marker (simulated by deleting the marker), replay — rollback by
    // prefix must leave each vector coded exactly once
    val extra = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 90001L).as("vec_id"), col("label"),
        col("embedding"))
    AnnIndex.appendPqBatch(extra, root, 1L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_committed/batch-1"), false)
    AnnIndex.appendPqBatch(extra, root, 1L)
    val extraCodes = spark.read.parquet(s"$root/codes")
      .filter(col("vec_id") >= 90001L)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
    assert(extraCodes.count() == 3 &&
      extraCodes.filter(col("c") =!= 8).count() == 0,
      "torn-promote replay left duplicate or missing codes")
  }

  test("IVF streaming append: two-level promote is exactly-once, probe layout intact") {
    val emb = Tables.embeddings(spark, Sf0001)
    val n = emb.count()
    val half = n / 2
    val base = emb.filter(col("vec_id") < half)
    val delta = emb.filter(col("vec_id") >= half)
    val root = tmpRoot("ivfstream")
    AnnIndex.buildIvf(base, root)
    val refRoot = tmpRoot("ivfstreamref")
    AnnIndex.buildIvf(base, refRoot)
    AnnIndex.appendIvf(delta, refRoot)
    val deltaDir = java.nio.file.Files.createTempDirectory("ivf_delta")
      .toString + "/files"
    delta.write.parquet(deltaDir)
    val ckpt = java.nio.file.Files.createTempDirectory("ivf_ckpt").toString
    val q = AnnIndex.startIvfAppendSink(
      spark.readStream.schema(emb.schema).parquet(deltaDir), root, ckpt)
    q.processAllAvailable()
    q.stop()
    val qdf = queryLits(Sf0001)
    assert(AnnIndex.serveIvfTopk(spark, root, qdf).collect().toSeq ==
      AnnIndex.serveIvfTopk(spark, refRoot, qdf).collect().toSeq)
    // replay is a marker no-op; torn promote (marker deleted after a
    // second batch) rolls back by prefix inside the cell dirs
    AnnIndex.appendIvfBatch(delta, root, 0L)
    val extra = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 91001L).as("vec_id"), col("label"),
        col("embedding"))
    AnnIndex.appendIvfBatch(extra, root, 1L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_committed/batch-1"), false)
    AnnIndex.appendIvfBatch(extra, root, 1L)
    val ids = spark.read.parquet(s"$root/lists")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
    assert(ids.count() == n + 3, "exactly-once append lost or duplicated ids")
    assert(ids.filter(col("c") =!= 1).count() == 0)
  }

  test("recall audit: one row per query, hits consistent with recall, sane floor") {
    val rows = AnnIndex.embPqRecall(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq == (0L until 10L))
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      val recall = r.getAs[Double]("recall")
      assert(hits >= 0 && hits <= 5)
      assert(math.abs(recall - hits / 5.0) < 1e-9)
    }
    // ADC over full-sample-trained codebooks must beat chance by a
    // wide margin: random top-5 of n≈200 would average recall ~0.025;
    // the floor only a working index clears (measured: 0.22 on the
    // sf0.001 fixture — near-uniform synthetic embeddings are PQ's
    // worst case, which is precisely what this audit is for)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.1, s"mean recall@5 $mean below floor")
    // the composed-index audit adds routing loss on top; structurally
    // identical census, no monotonicity contract vs plain PQ (pruning
    // non-neighbor candidates can RAISE a query's recall)
    val ivfpq = AnnIndex.embIvfPqRecall(spark, Sf0001).collect()
    assert(ivfpq.map(_.getAs[Long]("query_id")).toSeq == (0L until 10L))
    ivfpq.foreach { r =>
      assert(math.abs(r.getAs[Double]("recall") -
        r.getAs[Long]("hits") / 5.0) < 1e-9)
    }
    // the CLUSTERED-geometry audit (planted 6-cliques): each panel
    // query's exact top-5 is its planted clique, so the composed index
    // must retrieve most of it — the operating-geometry contract the
    // uniform floor above cannot express (r12 frontier: 0.96 at sf0.1;
    // the bound here is loose against sf0.001 routing variance)
    val clustered = AnnIndex.embIvfPqRecallClustered(spark, Sf0001).collect()
    assert(clustered.map(_.getAs[Long]("query_id")).toSeq == (0L until 10L))
    val clusteredMean =
      clustered.map(_.getAs[Double]("recall")).sum / clustered.length
    assert(clusteredMean >= 0.6,
      s"clustered-geometry mean recall@5 $clusteredMean below floor")
  }

  test("IVFPQ streaming append: exactly-once into the composed index") {
    val emb = Tables.embeddings(spark, Sf0001)
    val n = emb.count()
    val half = n / 2
    val base = emb.filter(col("vec_id") < half)
    val delta = emb.filter(col("vec_id") >= half)
    val root = tmpRoot("ivfpqstream")
    AnnIndex.buildIvfPq(base, root)
    val refRoot = tmpRoot("ivfpqstreamref")
    AnnIndex.buildIvfPq(base, refRoot)
    AnnIndex.appendIvfPq(delta, refRoot)
    val deltaDir = java.nio.file.Files.createTempDirectory("ivfpq_delta")
      .toString + "/files"
    delta.write.parquet(deltaDir)
    val ckpt = java.nio.file.Files.createTempDirectory("ivfpq_ckpt").toString
    val q = AnnIndex.startIvfPqAppendSink(
      spark.readStream.schema(emb.schema).parquet(deltaDir), root, ckpt)
    q.processAllAvailable()
    q.stop()
    val qdf = queryLits(Sf0001)
    assert(AnnIndex.serveIvfPqTopk(spark, root, qdf).collect().toSeq ==
      AnnIndex.serveIvfPqTopk(spark, refRoot, qdf).collect().toSeq)
    // replay + torn promote on the cell-partitioned code table
    AnnIndex.appendIvfPqBatch(delta, root, 0L)
    val extra = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 92001L).as("vec_id"), col("label"),
        col("embedding"))
    AnnIndex.appendIvfPqBatch(extra, root, 1L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_committed/batch-1"), false)
    AnnIndex.appendIvfPqBatch(extra, root, 1L)
    val ids = spark.read.parquet(s"$root/cellcodes")
      .groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
    assert(ids.count() == n + 3)
    assert(ids.filter(col("c") =!= 8).count() == 0,
      "torn-promote replay left duplicate or missing codes")
  }

  test("filtered serve: every hit satisfies the predicate, plan stays embeddings-free") {
    val served = AnnIndex.embPqServeFiltered(spark, Sf0001)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "filtered serve scans the corpus")
    val rows = served.collect()
    assert(rows.map(_.getAs[Long]("rank")).grouped(5).forall(_.toSeq == (1L to 5L)))
    val labels = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("neighbor_id")
      assert(labels(id) % 3 == 0, s"hit $id violates the filter")
    }
    // the filter must actually bite: the unfiltered serve surfaces at
    // least one neighbor the filtered serve may not
    val unfiltered = AnnIndex.embPqServe(spark, Sf0001).collect()
      .map(_.getAs[Long]("neighbor_id")).toSet
    assert(unfiltered.exists(id => labels(id) % 3 != 0))
  }

  test("cell stats: census covers the corpus exactly, shares sum to 1") {
    val emb = Tables.embeddings(spark, Sf0001)
    val n = emb.count()
    val rows = AnnIndex.embIvfCellStats(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // 16 label-seeded cells at this scale; every cell non-empty is not
    // guaranteed, but the census must never exceed the seed count
    assert(rows.length <= 16 && rows.length >= 2)
    // embeddings-free read: the census comes from the lists table
    val plan = AnnIndex.embIvfCellStats(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "cell census scans the corpus instead of the index")
  }

  test("store manifest: internal cardinality invariants hold") {
    val rows = graft.store.Manifest.storeManifest(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.size == 9)
    assert(rows(("pq", "codes")) == 8 * rows(("pq", "attrs")))
    assert(rows(("pq", "vnorms")) == rows(("pq", "attrs")))
    assert(rows(("pq", "vecs8")) == rows(("pq", "attrs")))
    assert(rows(("lex", "stats")) == 1)
    assert(rows(("lex", "postings")) >= rows(("lex", "df")))
    assert(rows(("lex", "postings")) >= rows(("lex", "dl")))
  }

  test("coarser-modulus rung ladder: pct ladder at gate scales, sub-1% beyond") {
    import Similarity.{trainSamplePct, trainSampleRung}
    // gate scales: exactly the pct ladder on modulus 100
    Seq(1L, 512L, 2048L, 16384L, 32768L).foreach { n =>
      assert(trainSampleRung(n) == ((100L, trainSamplePct(n).toLong)))
    }
    // beyond: modulus widens, threshold keeps shrinking (sub-1% rungs)
    assert(trainSampleRung(100000L) == ((10000L, 50L)))
    assert(trainSampleRung(500000L) == ((10000L, 25L)))
    assert(trainSampleRung(10000000L) == ((10000L, 10L)))
    // the expected ABSOLUTE training-set size stays in a bounded band
    // across 4 decades (the property the coarse rungs exist for)
    Seq(40000L, 130000L, 500000L, 5000000L).foreach { n =>
      val (m, t) = trainSampleRung(n)
      val expTrain = n.toDouble * t / m
      assert(expTrain >= 128 && expTrain <= 16384,
        s"n=$n expected training rows $expTrain out of band")
    }
  }
}
