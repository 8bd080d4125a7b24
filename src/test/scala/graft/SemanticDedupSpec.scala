package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** SemDeDup (`dedup_semantic`): cluster-then-prune semantics on the
  * planted-near-dup corpus. The full-corpus hash check is the driver
  * gate; this spec pins the semantic contract — a vector is flagged iff
  * a smaller-id member of its near-dup clique shares its cell (the
  * within-cell min-id-keeps rule), cell-boundary misses are the ONLY
  * misses (the documented SemDeDup recall trade), and recall on the
  * planted cliques stays high.
  */
class SemanticDedupSpec extends SparkSpec {

  test("semantic cell ladder: integer boundaries, buckets track corpus size") {
    import Similarity.semanticCells
    // power-of-two boundaries are integer-exact (the oracle mirrors the
    // same CASE ladder — no float log2 on either side)
    assert(semanticCells(32768) == 16 && semanticCells(32769) == 32)
    assert(semanticCells(500) == 16)   // the sf0.01 driver-gate corpus
    assert(semanticCells(1048576) == 512 && semanticCells(1048577) == 1024)
    assert(semanticCells(100000000L) == 1024) // capped: prune work per cell
  }

  test("within-cell min-id prune, boundary-only misses, high planted recall") {
    // 6-clique corpus: every base vec_id + five perturbed copies; all
    // intra-clique cosines >= 0.95, natural pairs top out ~0.68 — at
    // minCos 0.9 the qualifying pairs are exactly the cliques
    val emb = Similarity.augmentedEmbeddings(
        Tables.embeddings(spark, Sf0001)).persist()
    val n = emb.count()
    val res = Similarity.dedupSemanticDf(emb, 0.9).persist()
    assert(res.count() == n)

    // exact semantics: flagged iff NOT the min-id of its (clique, cell)
    // group — base ids are the clique minima, so this also proves no
    // base vector is ever flagged and no cross-clique pair fires
    val withClique = res
      .withColumn("clique", pmod(col("vec_id"), lit(1000000L)))
    val keeper = withClique.groupBy(col("clique"), col("cell"))
      .agg(min(col("vec_id")).as("keeper"))
    val mismatches = withClique.join(keeper, Seq("clique", "cell"))
      .filter(col("is_dup") =!= (col("vec_id") =!= col("keeper")))
      .count()
    assert(mismatches == 0L)

    // the only misses are cell-boundary strays; they must stay a small
    // minority or the clustering is useless as a prune index
    val planted = res.filter(col("vec_id") >= 1000000L)
    val flagged = planted.filter(col("is_dup")).count().toDouble
    val recall = flagged / planted.count()
    assert(recall >= 0.75, s"planted recall $recall below 0.75")
    emb.unpersist(); res.unpersist()
  }

  test("mega-cell split: planted 10×-skew cell sub-clustered, pair work bounded") {
    // skew fixture: one tight direction holding ~10× the expected cell
    // population (1298 of 2048 at 16 cells) — far above splitBound's 4×
    // trigger. The same corpus+result pair is replayed against the
    // DuckDB oracle mirror out-of-band by tools/SkewSemantic +
    // tools/check_skew_semantic.py (the driver gate corpora are
    // balanced, so the oracle's split branch is proved equivalent there).
    val n = 2048L
    val emb = Similarity.skewedEmbeddings(spark, n).persist()
    val res = Similarity.dedupSemanticDf(emb, 0.95).persist()
    // the split union neither loses nor duplicates rows
    assert(res.count() == n)
    assert(res.select("vec_id").distinct().count() == n)
    val bound = Similarity.splitBound(n, Similarity.semanticCells(n))
    val pops = res.groupBy(col("cell")).count().persist()
    // composite sub-cell ids live strictly above the 0..1023 top-level
    // range — their presence proves the split fired
    val split = pops.filter(col("cell") >= 1024)
    assert(split.count() >= 2, "mega-cell did not split")
    // the sub-cells jointly carry a mega-cell's worth of mass (the
    // planted hot direction), i.e. the pre-split cell was above bound
    val splitMass = split.agg(sum(col("count"))).head.getLong(0)
    assert(splitMass > bound, s"split mass $splitMass is not a mega-cell")
    // BOUNDED PER-CELL PAIR WORK — the point of the operator: after the
    // split no final cell exceeds the bound, so |cell|² is capped
    val maxPop = pops.agg(max(col("count"))).head.getLong(0)
    assert(maxPop <= bound, s"cell of pop $maxPop above bound $bound")
    // prune semantics survive the split: flagged iff a same-FINAL-cell
    // smaller-id neighbor sits at cos >= minCos, recomputed here
    // independently from the result's cells and the raw corpus
    val m = res.join(emb, "vec_id")
    val l = m.select(col("cell"), col("vec_id").as("i"), col("embedding").as("ei"))
    val r = m.select(col("cell"), col("vec_id").as("j"), col("embedding").as("ej"))
    val expDup = l.join(r, "cell")
      .filter(col("j") < col("i") &&
        round(Similarity.cosine(col("ei"), col("ej")), 6) >= 0.95)
      .select(col("i").as("vec_id")).distinct()
      .withColumn("exp_dup", lit(true))
    val bad = res.join(expDup, Seq("vec_id"), "left_outer")
      .filter(coalesce(col("exp_dup"), lit(false)) =!= col("is_dup")).count()
    assert(bad == 0L, s"$bad vectors with wrong is_dup after split")
    pops.unpersist(); emb.unpersist(); res.unpersist()
  }
}
