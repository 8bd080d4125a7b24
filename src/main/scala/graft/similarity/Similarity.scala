package graft.similarity

import graft.Tables
import graft.functions.{CosineSimExpr, LshBucketsExpr}
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
  /** IVF-style ANN top-k: coarse-quantize the corpus into cells
    * (centroid per label — the reduce step embLabelCentroids computes),
    * rank cells per query by centroid cosine, then run the EXACT
    * search only inside the `nprobe` nearest cells. The classic
    * recall/cost dial: cost drops from n per query to
    * nprobe·n/cells, recall is whatever the probed cells contain.
    *
    * Scale shape: centroids are tiny (one row per cell) → broadcast;
    * the cell-probe ranking is a window over q×cells rows (both small);
    * the refine joins the corpus on its cell key (one shuffle, pruned
    * to probed cells) and feeds the same bounded top-k aggregator as
    * embTopk — no stage touches more than nprobe/cells of the corpus
    * per query. Centroid components are rounded to 6 dp so the cell
    * assignment (and hence the result) is engine-independent.
    */
  def embIvfTopk(s: SparkSession, dir: String, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val cent = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v").cast(DoubleType)), 6).as("c"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val qc = queries.crossJoin(broadcast(cent))
      .select(col("query_id"), col("q_emb"), col("label"),
        round(ddot(col("q_emb"), col("centroid")) /
          (sqrt(ddot(col("q_emb"), col("q_emb"))) *
           sqrt(ddot(col("centroid"), col("centroid")))), 6).as("cos_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos_c").desc, col("label"))
    val cells = qc.withColumn("r", row_number().over(w)).filter(col("r") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("label"))
    val cand = cells
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label"), col("embedding")),
        Seq("label"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val topk = udaf(new TopKByCos(k))
    cand.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cos_sim")).as("nbrs"))
      .select(col("query_id"), posexplode(col("nbrs")).as(Seq("pos", "nbr")))
      .select(col("query_id"),
        col("nbr.neighbor_id").as("neighbor_id"),
        col("nbr.cos_sim").as("cos_sim"),
        (col("pos") + 1).cast(LongType).as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** All hash-table bucket ids in one native codegen'd pass
    * (LshBucketsExpr: deterministic splitmix64 hyperplanes, no broadcast
    * planes, no per-element lambdas).
    */
  private def lshBucketsCol(emb: Column, planesPerTable: Int, nTables: Int): Column =
    ColumnBridge.column(LshBucketsExpr(
      ColumnBridge.expression(emb), planesPerTable, nTables))

  def embLshBuckets(s: SparkSession, dir: String, nPlanes: Int = 8): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        element_at(lshBucketsCol(col("embedding"), nPlanes, 1), 1).as("bucket"))
      .orderBy(col("vec_id"))

  /** THE near-dup default at corpus scale: multi-table LSH bucketing
    * with the exact-cosine refine FUSED into the bucket self-join.
    *
    * `nTables` independent hash tables of `planesPerTable` hyperplanes
    * each (table t uses planes t·b..t·b+b−1); a pair is considered iff
    * it shares a bucket in some table — P(candidate | cos θ) =
    * 1−(1−(1−θ/π)^b)^t, so (b, t) tune recall at the operating
    * threshold while cost is Σ buckets n_bucket² instead of n².
    *
    * Shape: the embedding rides along into the (table, bucket) shuffle
    * (t× the corpus — linear), the join output streams straight through
    * the codegen'd cosine + threshold filter, and only the rare
    * survivors are deduped — no materialized candidate set, no O(pairs)
    * distinct, no refine joins. Any emitted pair carries the exact
    * rounded cosine; the CORRECTNESS gate checks equality with the full
    * O(n²) pair set at sf0.01 (= 100% recall there).
    */
  def dedupEmbeddingLsh(s: SparkSession, dir: String, minCos: Double = 0.45,
      nTables: Int = 20, planesPerTable: Int = 3): DataFrame = {
    val a = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"),
      posexplode(lshBucketsCol(col("embedding"), planesPerTable, nTables))
        .as(Seq("tbl", "bucket")))
    val x = a.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      col("tbl"), col("bucket"))
    val y = a.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      col("tbl"), col("bucket"))
    x.join(y, Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .distinct() // survivors only — a pair may match in several tables
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
