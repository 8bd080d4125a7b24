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
}
