package graft

import scala.util.Random

import graft.similarity.Mmr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MMR diversity re-ranking: the diversity property itself (planted
  * near-dup clusters collapse to one representative each), the pure-
  * relevance degenerate case (μ = 0 ≡ top-k order), partitioning
  * invariance, and the short-candidate edge.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def runMmr(df: DataFrame, c: Int, k: Int, lamE1: Int,
      muE1: Int): Seq[(Long, Long, Long)] = {
    val emb = df
    val queries = emb.filter(col("vec_id") < 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val pairs = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.similarity.Similarity.cosine(col("q_emb"), col("embedding")), 6)
          .as("cos_sim"))
    val topc = udaf(new graft.similarity.TopKByCos(c))
    val cand = pairs.groupBy(col("query_id"))
      .agg(topc(col("neighbor_id"), col("cos_sim")).as("nbrs"))
      .select(col("query_id"), explode(col("nbrs")).as("nbr"))
      .select(col("query_id"), col("nbr.neighbor_id").as("vec_id"),
        col("nbr.cos_sim").as("rel"))
    val cemb = emb.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("emb"))
    cemb.join(broadcast(cand), Seq("vec_id"))
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("vec_id"), col("rel"), col("emb"))).as("cands"))
      .select(col("query_id"),
        explode(Mmr.mmrSelect(col("cands"), k, lamE1, muE1)).as("m"))
      .select(col("query_id"), col("m.vec_id"), col("m.rank"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._3))
  }

  /** Query 0 plus `nClusters` tight clusters of `perCluster` vectors
    * each: cluster g's members are tiny jitters of a base direction
    * whose cosine to the query DECREASES with g, so pure relevance
    * top-k drains cluster 0 first while MMR must hop clusters.
    * Cluster of vec v (v >= 1): (v - 1) / perCluster.
    */
  private def clusteredCorpus(nClusters: Int, perCluster: Int,
      dim: Int = 16): Seq[(Long, Array[Float])] = {
    val rnd = new Random(7)
    val q = Array.fill(dim)(rnd.nextGaussian())
    val bases = (0 until nClusters).map { g =>
      // a query-aligned component decaying slowly in g (so relevance
      // orders clusters) + a DOMINANT per-cluster random component (so
      // inter-cluster cosine ~0.3 while intra stays ~1.0 — the regime
      // where hopping clusters beats re-picking near-dups)
      val noise = Array.fill(dim)(rnd.nextGaussian())
      q.zip(noise).map { case (a, b) => (2.0 - 0.2 * g) * a + 3.0 * b }
    }
    val members = for (g <- 0 until nClusters; j <- 0 until perCluster) yield {
      val id = (1 + g * perCluster + j).toLong
      val v = bases(g).map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
      (id, v)
    }
    (0L, q.map(_.toFloat)) +: members
  }

  test("mu = 0 degenerates to relevance top-k order") {
    val corpus = clusteredCorpus(4, 6)
    val df = corpus.toDF("vec_id", "embedding")
    val mmr = runMmr(df, c = 12, k = 5, lamE1 = 7, muE1 = 0)
    val topk = runMmr(df, c = 12, k = 5, lamE1 = 10, muE1 = 0)
    assert(mmr == topk) // any positive λ with μ=0 ranks by rel alone
  }

  test("planted near-dup clusters: top-k drains one cluster, MMR hops") {
    val perCluster = 6
    val corpus = clusteredCorpus(4, perCluster)
    def clusterOf(v: Long): Long = (v - 1) / perCluster
    val df = corpus.toDF("vec_id", "embedding")
    val topk = runMmr(df, c = 24, k = 4, lamE1 = 10, muE1 = 0)
    // relevance-only: all 4 picks from the closest cluster
    assert(topk.map(t => clusterOf(t._2)).distinct.size == 1, s"topk=$topk")
    val mmr = runMmr(df, c = 24, k = 4, lamE1 = 7, muE1 = 3)
    // MMR: 4 picks cover 4 distinct clusters
    assert(mmr.map(t => clusterOf(t._2)).distinct.size == 4, s"mmr=$mmr")
  }

  test("selection is invariant to input partitioning") {
    val corpus = clusteredCorpus(5, 5)
    val a = runMmr(corpus.toDF("vec_id", "embedding").repartition(1), 24, 8, 7, 3)
    val b = runMmr(corpus.toDF("vec_id", "embedding").repartition(7), 24, 8, 7, 3)
    assert(a == b)
  }

  test("fewer candidates than k returns all candidates, ranks contiguous") {
    val corpus = clusteredCorpus(1, 3) // 3 candidates, k = 8
    val got = runMmr(corpus.toDF("vec_id", "embedding"), 24, 8, 7, 3)
    assert(got.size == 3 && got.map(_._3) == Seq(1L, 2L, 3L))
  }

  test("emb_mmr_serve: embeddings-free plan, plausible overlap with exact MMR") {
    val df = SparkEntry.queries("emb_mmr_serve")(spark, Sf0001)
    assert(!df.queryExecution.executedPlan.toString.contains("embeddings.parquet"),
      "serve-side MMR plan must not scan the embeddings table")
    val served = df.collect()
    assert(served.length == 80)
    // quantized retrieval + quantized diversity should still mostly
    // agree with the exact path — a recall floor, not equality
    val exact = SparkEntry.queries("emb_mmr_topk")(spark, Sf0001).collect()
    def keys(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (keys(served) & keys(exact)).size.toDouble / 80
    assert(overlap >= 0.5, s"served/exact MMR overlap $overlap")
  }

  test("registered emb_mmr_topk: 8 diverse rows per query at sf0.001") {
    val df = SparkEntry.queries("emb_mmr_topk")(spark, Sf0001)
    val rows = df.collect()
    assert(rows.length == 80) // 10 queries x 8
    // rank-1 relevance must dominate rank-2's mmr score trade
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.head.getDouble(3) >= sorted(1).getDouble(3) ||
        sorted.head.getLong(4) >= sorted(1).getLong(4))
    }
  }
}
