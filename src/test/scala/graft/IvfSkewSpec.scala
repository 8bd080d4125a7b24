package graft

import graft.similarity.Similarity
import graft.store.{AnnIndex, Compaction}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-skew discipline for the persisted IVF/IVFPQ lists: an
  * adversarial single-direction delta (every vector a near-copy of one
  * base embedding) routes ENTIRELY into one frozen cell, tripping the
  * census alarm; `Compaction.splitHotCells` must return every physical
  * partition under the 4×-uniform bound while serve stays BIT-IDENTICAL
  * (the split is pure layout — a routed parent expands to its composite
  * descendants), and appends must keep composing afterward.
  */
class IvfSkewSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"skew_$tag").toString + "/idx"

  private def queryLits(dir: String) =
    Similarity.materializeSmall(
      Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))

  /** `mult`× the corpus size of near-copies of base vector `src`, ids
    * stacked above 100000 — the drifting point-mass delta.
    */
  private def pointMass(dir: String, src: Long, mult: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val v = broadcast(emb.filter(col("vec_id") === src)
      .select(col("embedding").as("src_emb")))
    (0 until mult).map { m =>
      emb.crossJoin(v)
        .select((col("vec_id") + lit(100000L + m * 10000L)).as("vec_id"),
          col("label"),
          transform(col("src_emb"), x => x * lit(1.0f + m * 0.0001f))
            .as("embedding"))
    }.reduce(_ unionByName _)
  }

  private def physicalCells(root: String, sub: String): Seq[Long] = {
    val dir = new Path(s"$root/$sub")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("cell=")).map(_.stripPrefix("cell=").toLong).toSeq
  }

  test("IVF: point-mass delta trips the guard; split holds the bound, serve identical") {
    val emb = Tables.embeddings(spark, Sf0001)
    val root = tmpRoot("ivf")
    AnnIndex.buildIvf(emb, root)
    val nCells = spark.read.parquet(s"$root/centroids").count()
    AnnIndex.appendIvfBatch(pointMass(Sf0001, 7L, 4), root, 0L)

    // the alarm fires: at least one physical partition over the bound
    val g0 = AnnIndex.cellGuard(spark, root, "lists").head
    assert(g0.getAs[Long]("cells_over_bound") >= 1,
      s"adversarial delta did not trip the guard: $g0")
    val bound = g0.getAs[Long]("bound")
    val q = queryLits(Sf0001)
    val before = AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq

    val split = Compaction.splitHotCells(spark, root, "lists")
    assert(split >= 1, "splitter found no hot cell")

    // per-physical-partition bound held (the guard returns to zero)
    val g1 = AnnIndex.cellGuard(spark, root, "lists").head
    assert(g1.getAs[Long]("cells_over_bound") == 0,
      s"split left partitions over the bound: $g1")
    assert(g1.getAs[Long]("n_vecs") == g0.getAs[Long]("n_vecs"),
      "split lost or duplicated rows")
    // composite ids are strictly above the top-level range and map back
    val phys = physicalCells(root, "lists")
    assert(phys.exists(_ >= 1024L), "no composite partitions written")
    assert(phys.filter(_ < 1024L).forall(_ < nCells))

    // serve is BIT-IDENTICAL: the split is layout-only
    val served = AnnIndex.serveIvfTopk(spark, root, q)
    assert(served.collect().toSeq == before)
    // and still partition-pruned on the cell directory column
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters", 2)(1).take(300).contains("cell"),
      "split broke the probe's partition pruning")

    // appends keep composing AFTER the split (deltas route to parent
    // ids; serve probes parent + descendants together)
    val extra = emb.filter(col("vec_id") < 5)
      .select((col("vec_id") + 900001L).as("vec_id"), col("label"),
        col("embedding"))
    AnnIndex.appendIvfBatch(extra, root, 1L)
    val refRoot = tmpRoot("ivfref")
    AnnIndex.buildIvf(emb, refRoot)
    AnnIndex.appendIvfBatch(pointMass(Sf0001, 7L, 4), refRoot, 0L)
    AnnIndex.appendIvfBatch(extra, refRoot, 1L)
    assert(AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq ==
      AnnIndex.serveIvfTopk(spark, refRoot, q).collect().toSeq,
      "post-split append diverged from the never-split reference")
  }

  test("IVFPQ: cellcodes split under the code-aware census, serve identical") {
    val emb = Tables.embeddings(spark, Sf0001)
    val root = tmpRoot("ivfpq")
    AnnIndex.buildIvfPq(emb, root)
    AnnIndex.appendIvfPqBatch(pointMass(Sf0001, 7L, 4), root, 0L)

    val g0 = AnnIndex.cellGuard(spark, root, "cellcodes", rowsPerVec = 8).head
    assert(g0.getAs[Long]("cells_over_bound") >= 1)
    val q = queryLits(Sf0001)
    val before = AnnIndex.serveIvfPqTopk(spark, root, q).collect().toSeq

    val split = Compaction.splitHotCells(spark, root, "cellcodes",
      rowsPerVec = 8)
    assert(split >= 1)

    val g1 = AnnIndex.cellGuard(spark, root, "cellcodes", rowsPerVec = 8).head
    assert(g1.getAs[Long]("cells_over_bound") == 0, s"bound not held: $g1")
    assert(AnnIndex.serveIvfPqTopk(spark, root, q).collect().toSeq == before)
  }

  test("splitter is a no-op on a healthy store") {
    val emb = Tables.embeddings(spark, Sf0001)
    val root = tmpRoot("healthy")
    AnnIndex.buildIvf(emb, root)
    val before = physicalCells(root, "lists").sorted
    assert(Compaction.splitHotCells(spark, root, "lists") == 0)
    assert(physicalCells(root, "lists").sorted == before)
    assert(AnnIndex.cellGuard(spark, root, "lists")
      .head.getAs[Long]("cells_over_bound") == 0)
  }

  test("census-triggered rebuild: retrains from the lists alone, folds deletes, keeps markers") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val root = tmpRoot("rebuild")
    AnnIndex.buildIvf(emb.filter(col("vec_id") < half), root)
    val centBefore = spark.read.parquet(s"$root/centroids")
      .orderBy(col("cell")).collect().toSeq
    val delta = pointMass(Sf0001, 7L, 2)
    AnnIndex.appendIvfBatch(delta, root, 0L)
    import spark.implicits._
    AnnIndex.deleteVectors(spark, root, Seq(100007L).toDF("vec_id"))

    AnnIndex.rebuildIvf(spark, root)

    // bit-identical to a fresh build over the same surviving rows with
    // the same id-derived seed recipe (labels are not stored)
    val rows = emb.filter(col("vec_id") < half)
      .select(col("vec_id"), col("embedding"))
      .unionByName(delta.select(col("vec_id"), col("embedding")))
      .filter(col("vec_id") =!= 100007L)
      .select(col("vec_id"), pmod(col("vec_id"), lit(16L)).as("label"),
        col("embedding"))
    val refRoot = tmpRoot("rebuildref")
    AnnIndex.buildIvf(rows, refRoot)
    val q = queryLits(Sf0001)
    assert(AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq ==
      AnnIndex.serveIvfTopk(spark, refRoot, q).collect().toSeq,
      "rebuild diverged from the deterministic fresh build")
    // the quantizer really retrained on the drifted corpus
    val centAfter = spark.read.parquet(s"$root/centroids")
      .orderBy(col("cell")).collect().toSeq
    assert(centAfter != centBefore, "rebuild kept the frozen centroids")
    // deletes folded; tombstoned row physically gone
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(s"$root/deletes")))
    assert(spark.read.parquet(s"$root/lists")
      .filter(col("vec_id") === 100007L).count() == 0)
    // markers survived: a replayed committed batch still short-circuits
    val n0 = spark.read.parquet(s"$root/lists").count()
    AnnIndex.appendIvfBatch(delta, root, 0L)
    assert(spark.read.parquet(s"$root/lists").count() == n0,
      "replay re-appended after rebuild dropped its marker")
    // composes with the layout splitter: serve unchanged, guard to zero
    val before = AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq
    Compaction.splitHotCells(spark, root, "lists")
    assert(AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq == before)
    assert(AnnIndex.cellGuard(spark, root, "lists")
      .head.getAs[Long]("cells_over_bound") == 0)
  }

  test("corpus-fed rebuilds: PQ and IVFPQ republish cleanly, tombstones folded, markers kept") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val q = queryLits(Sf0001)
    import spark.implicits._

    // PQ: base build + append + tombstone, rebuild from the corpus
    val pqRoot = tmpRoot("pqrebuild")
    AnnIndex.buildPq(emb.filter(col("vec_id") < half), pqRoot)
    AnnIndex.appendPqBatch(emb.filter(col("vec_id") >= half), pqRoot, 0L)
    AnnIndex.deleteVectors(spark, pqRoot, Seq(13L).toDF("vec_id"))
    AnnIndex.rebuildPq(emb, pqRoot)
    val pqRef = tmpRoot("pqrebuildref")
    AnnIndex.buildPq(emb.filter(col("vec_id") =!= 13L), pqRef)
    assert(AnnIndex.servePqTopk(spark, pqRoot, q).collect().toSeq ==
      AnnIndex.servePqTopk(spark, pqRef, q).collect().toSeq)
    val f = new Path(pqRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new Path(s"$pqRoot/deletes")))
    // marker carried: the replayed append short-circuits
    val n0 = spark.read.parquet(s"$pqRoot/codes").count()
    AnnIndex.appendPqBatch(emb.filter(col("vec_id") >= half), pqRoot, 0L)
    assert(spark.read.parquet(s"$pqRoot/codes").count() == n0)

    // IVFPQ: same contract through the composed build
    val cRoot = tmpRoot("ivfpqrebuild")
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") < half), cRoot)
    AnnIndex.appendIvfPqBatch(emb.filter(col("vec_id") >= half), cRoot, 0L)
    AnnIndex.deleteVectors(spark, cRoot, Seq(13L).toDF("vec_id"))
    AnnIndex.rebuildIvfPq(emb, cRoot)
    val cRef = tmpRoot("ivfpqrebuildref")
    AnnIndex.buildIvfPq(emb.filter(col("vec_id") =!= 13L), cRef)
    assert(AnnIndex.serveIvfPqTopk(spark, cRoot, q).collect().toSeq ==
      AnnIndex.serveIvfPqTopk(spark, cRef, q).collect().toSeq)
    assert(!f.exists(new Path(s"$cRoot/deletes")))
  }

  test("corpus-fed rebuild absorbs a TORN batch: marker written, replay short-circuits") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half = emb.count() / 2
    val q = queryLits(Sf0001)
    val pqRoot = tmpRoot("pqtornrebuild")
    AnnIndex.buildPq(emb.filter(col("vec_id") < half), pqRoot)
    val delta = emb.filter(col("vec_id") >= half)
    AnnIndex.appendPqBatch(delta, pqRoot, 0L)
    val f = new Path(pqRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(s"$pqRoot/_committed/batch-0"), false) // batch 0 tears
    // the rebuild DECLARES the corpus complete, so the torn batch's
    // rows are absorbed and its marker written
    AnnIndex.rebuildPq(emb, pqRoot)
    val n0 = spark.read.parquet(s"$pqRoot/codes").count()
    assert(n0 == emb.count() * 8, s"absorbed rebuild missing rows: $n0")
    AnnIndex.appendPqBatch(delta, pqRoot, 0L) // replay must short-circuit
    assert(spark.read.parquet(s"$pqRoot/codes").count() == n0,
      "replay double-delivered rows the rebuild absorbed")
    assert(AnnIndex.servePqTopk(spark, pqRoot, q).collect().length == 50)
  }

  test("fold compaction preserves a split layout and its bound") {
    val emb = Tables.embeddings(spark, Sf0001)
    val root = tmpRoot("foldsplit")
    AnnIndex.buildIvf(emb, root)
    AnnIndex.appendIvfBatch(pointMass(Sf0001, 7L, 4), root, 0L)
    Compaction.splitHotCells(spark, root, "lists")
    import spark.implicits._
    AnnIndex.deleteVectors(spark, root, Seq(100007L, 110007L).toDF("vec_id"))
    val q = queryLits(Sf0001)
    val before = AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq
    Compaction.compactIvfStore(spark, root)
    assert(AnnIndex.serveIvfTopk(spark, root, q).collect().toSeq == before)
    assert(AnnIndex.cellGuard(spark, root, "lists")
      .head.getAs[Long]("cells_over_bound") == 0)
    assert(physicalCells(root, "lists").exists(_ >= 1024L),
      "fold flattened the composite layout")
  }
}
