package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** knn-graph properties: the exact graph's shape invariants, and the
  * LSH-bucketed variant's recall against it — including 100% recall on
  * the planted near-identical edges (the pairs a semantic-dedup graph
  * must never miss).
  */
class SimilarityKnnSpec extends SparkSpec {
  import spark.implicits._

  private def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("src_id"), col("neighbor_id")).as[(Long, Long)]
      .collect().toSet

  test("exact knn graph: k rows per source, ranks ordered by (cos desc, id)") {
    val g = Similarity.embKnnGraph(spark, Sf0001, k = 5)
    val rows = g.collect()
    val n = Tables.embeddings(spark, Sf0001).count()
    assert(rows.length == n * 5)
    val bySrc = rows.groupBy(_.getAs[Long]("src_id"))
    bySrc.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      // ranks follow the declared total order
      sorted.sliding(2).foreach { case Array(hi, lo) =>
        val (a, b) = (hi.getAs[Double]("cos_sim"), lo.getAs[Double]("cos_sim"))
        assert(a > b || (a == b &&
          hi.getAs[Long]("neighbor_id") < lo.getAs[Long]("neighbor_id")),
          s"src $src rank order broken")
      }
    }
  }

  test("PQ ANN: compressed-domain candidates recover most exact top-5 edges") {
    val exact = Similarity.embTopk(spark, Sf001, k = 5)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    val pq = Similarity.embPqTopk(spark, Sf001)
    val rows = pq.collect()
    // shape: 5 ranked rows per query, rescored cosine ordering
    assert(rows.length == exact.size)
    val got = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    // 8 nibbles/vector vs 64 floats: the 32-candidate ADC cut still
    // recovers the bulk of the true top-5 — the PQ contract
    assert(recall >= 0.6, f"pq recall $recall%.2f < 0.6")
    // rescored cosines are exact: every reported edge's cos_sim equals
    // the true cosine (certified transitively by the oracle gate; here
    // assert monotone rank order)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knn LSH plane ladder: integer boundaries, buckets track corpus size") {
    import Similarity.knnLshPlanes
    // power-of-two boundaries are integer-exact (the oracle mirrors the
    // same CASE ladder — no float log2 on either side)
    assert(knnLshPlanes(64) == 1 && knnLshPlanes(65) == 2)
    assert(knnLshPlanes(512) == 4 && knnLshPlanes(513) == 5)
    assert(knnLshPlanes(500) == 4)  // the sf0.01 driver-gate corpus
    assert(knnLshPlanes(5000) == 8) // the sf0.1 bench corpus
    assert(knnLshPlanes(100000000L) == 8) // capped: refine work per bucket
  }

  test("LSH knn graph: high recall overall, 100% on planted near-identical edges") {
    val emb = Similarity.augmentedEmbeddings(
      Tables.embeddings(spark, Sf0001)).persist()
    try {
      val exact = Similarity.embKnnGraphDf(emb, 5).persist()
      val approx = Similarity.embKnnGraphLsh(emb, 5)
      val (e, a) = (edges(exact), edges(approx))
      val recall = (e intersect a).size.toDouble / e.size
      assert(recall >= 0.8, f"knn recall $recall%.3f < 0.8")
      // every exact edge at cosine >= 0.95 (the planted copies) is found:
      // sign-LSH at (b=4, t=24) has ~(1-0.9^4)^24 ≈ 1e-12 miss probability
      val mustKeep = exact.filter(col("cos_sim") >= 0.95)
      val planted = edges(mustKeep)
      assert(planted.nonEmpty)
      val missed = planted diff a
      assert(missed.isEmpty, s"missed planted edges: ${missed.take(5)}")
      exact.unpersist()
    } finally emb.unpersist()
  }
}
