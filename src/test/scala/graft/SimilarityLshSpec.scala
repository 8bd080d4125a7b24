package graft

import graft.similarity.{LshParams, Similarity}
import org.apache.spark.sql.functions._

/** The embedding-LSH scale path: parameter derivation, 100% recall vs
  * the exact pair set at gate scale, and the oversized-bucket split.
  */
class SimilarityLshSpec extends SparkSpec {

  test("LshParams.derive tracks corpus size and threshold") {
    // gate-scale operating points (empirical minimum tables for 100%
    // recall on the driver corpus: 13 at n=500/b=4, 45 at n=2000/b=6 —
    // the derived t carries 1.8x / 1.33x margin over those minima)
    assert(LshParams.derive(500, 0.45) == LshParams(4, 24))
    assert(LshParams.derive(2000, 0.45) == LshParams(6, 60))
    // buckets track corpus size at fixed threshold
    val small = LshParams.derive(1000, 0.9)
    val big = LshParams.derive(1000000, 0.9)
    assert(big.planesPerTable > small.planesPerTable)
    // a high threshold needs far fewer tables than a low one at same n:
    // this is the regime where LSH wins orders of magnitude
    assert(LshParams.derive(1000000, 0.9).nTables <
      LshParams.derive(1000000, 0.45).nTables / 10)
    // higher recall target => more tables
    assert(LshParams.derive(2000, 0.45, targetRecall = 0.999).nTables >
      LshParams.derive(2000, 0.45, targetRecall = 0.99).nTables)
  }

  test("LSH pipeline matches the exact O(n^2) pair set at gate scale") {
    val lsh = Similarity.dedupEmbeddingLsh(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.dedupEmbedding(spark, Sf001, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact)
    assert(lsh.nonEmpty) // 14 qualifying pairs in the sf0.01 corpus
  }

  test("threshold-aware dispatch: low thresholds run the exact scan, high thresholds the LSH index") {
    // random-pair admission drives the routing decision
    assert(LshParams.randomAdmission(LshParams(6, 60)) > 0.5) // 0.45 regime
    assert(LshParams.randomAdmission(LshParams(11, 46)) < 0.05) // 0.9 regime
    val emb = Tables.embeddings(spark, Sf001)
    // the exact path is the all-pairs non-equi join (BNLJ); the LSH
    // path is equi-joins over the (checkpointed) bucket index — the
    // pair enumeration strategy IS the routing decision
    def isExactScan(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    // 0.45: derived index would admit ~79% of random pairs → exact scan
    assert(isExactScan(Similarity.dedupEmbeddingLshAuto(emb, 0.45)))
    // 0.9 on the showcase corpus: selective index → LSH bucket joins
    assert(!isExactScan(Similarity.dedupEmbeddingLshAuto(
      Similarity.augmentedEmbeddings(emb), 0.9,
      targetRecall = 0.9999, targetBucketRows = 4)))
  }

  test("top-k aggregator totally orders NaN cosines: k-set independent of arrival order") {
    // a zero-norm embedding produces NaN cosine; with >/== both false
    // NaN would skip the id tiebreak and make the k-survivor set
    // partition-dependent — the aggregator ranks NaN below every real
    // similarity and totally orders it, so any arrival order yields one
    // answer and degenerate vectors never displace real neighbors
    import graft.similarity.{ScoredNbr, TopKByCos}
    val agg = new TopKByCos(3)
    val xs = Seq(ScoredNbr(1, 0.9), ScoredNbr(2, Double.NaN),
      ScoredNbr(3, 0.7), ScoredNbr(4, Double.NaN), ScoredNbr(5, 0.8))
    val results = xs.permutations.take(24).map { perm =>
      val (l, r) = perm.splitAt(2)
      agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))).map(_.neighbor_id)
    }.toSeq
    assert(results.distinct.size == 1, s"order-dependent: ${results.distinct}")
    assert(results.head == Seq(1L, 5L, 3L)) // real cosines only; NaN last
  }

  test("token entropy: analytic cases and corpus invariants") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, log}
    // uniform distinct tokens → log2(4)=2 bits; one repeated token → 0
    // bits / share 1; half-half → exactly 1 bit
    val docs = Seq(
      (1L, "a b c d"), (2L, "x x x x"), (3L, "y y z z"))
      .toDF("doc_id", "text")
    val e = graft.analytics.TextAnalysis.txEntropyDf(docs)
      .select("doc_id", "token_entropy", "top_token_share")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(e(1L) == ((2.0, 0.25)))
    assert(e(2L) == ((0.0, 1.0)))
    assert(e(3L) == ((1.0, 0.5)))
    // corpus: 0 ≤ entropy ≤ log2(n_tokens), share ∈ (0, 1]
    val corpus = graft.analytics.TextAnalysis.txEntropy(spark, Sf001)
    assert(corpus.count() == 500)
    val bad = corpus.filter(col("token_entropy") < 0 ||
      col("token_entropy") > log(2.0, col("n_tokens").cast("double")) + 1e-6 ||
      col("top_token_share") <= 0 || col("top_token_share") > 1).count()
    assert(bad == 0)
  }

  test("int8 quantized top-k: bounded codes, high agreement with exact top-k") {
    import org.apache.spark.sql.functions._
    val q = graft.similarity.Similarity.embQuantizedTopk(spark, Sf001)
    val rows = q.collect()
    assert(rows.length == 50) // 10 queries x top-5
    // quantized and exact cosines agree closely on unit vectors
    rows.foreach { r =>
      val d = math.abs(r.getAs[Double]("qcos_sim") - r.getAs[Double]("cos_sim"))
      assert(d < 0.01, s"quantization error $d")
    }
    // the rescored top-5 should essentially match the exact top-5
    val exact = graft.similarity.Similarity.embTopk(spark, Sf001)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val overlap = (exact & got).size.toDouble / exact.size
    assert(overlap >= 0.9, s"recall vs exact = $overlap")
    // codes are genuine int8 range
    val mx = Tables.embeddings(spark, Sf001)
      .select(array_max(transform(
        transform(col("embedding"),
          x => floor(x.cast("double") * (lit(127.0) /
            array_max(transform(col("embedding"), y => abs(y.cast("double"))))) + lit(0.5))),
        v => abs(v))).as("m"))
      .agg(max(col("m"))).head().getLong(0)
    assert(mx <= 127L)
  }

  test("oversized buckets get split; row multiplicity is preserved") {
    import spark.implicits._
    // deterministic direction-free cloud: every bucket is hot relative
    // to a tiny cap, so the splitter must fire
    def f(i: Int, d: Int): Float = {
      val z = (i * 1315423911L + d * 2654435761L) & 0xffffL
      (z.toDouble / 0x8000 - 1.0).toFloat
    }
    val emb = (0 until 400)
      .map(i => (i.toLong, Seq.tabulate(8)(d => f(i, d))))
      .toDF("vec_id", "embedding")
    val params = LshParams(2, 3) // 4 buckets/table → ~100 rows per bucket
    val capped = Similarity.lshBucketTable(emb, params, bucketCap = 30, extraPlanes = 4)
    val uncapped = Similarity.lshBucketTable(emb, params, bucketCap = 1000000, extraPlanes = 4)
    // split keeps every (vec_id, tbl) row — nothing dropped or duplicated
    assert(capped.count() == 400L * 3)
    assert(uncapped.count() == 400L * 3)
    val maxCapped = capped.groupBy("tbl", "bucket").count()
      .agg(max("count")).head().getLong(0)
    val maxUncapped = uncapped.groupBy("tbl", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(maxUncapped > 30)
    // extra plane bits subdivide the hot buckets
    assert(maxCapped < maxUncapped, s"capped=$maxCapped uncapped=$maxUncapped")
    // and split bucket ids stay disjoint across tables' base buckets:
    // low planesPerTable bits still identify the base bucket
    val baseMismatch = capped.select(col("bucket").bitwiseAND(lit(3L)).as("base"))
      .filter(col("base") >= 4).count()
    assert(baseMismatch == 0)
  }
}
