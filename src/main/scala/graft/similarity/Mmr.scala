package graft.similarity

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance diversity re-ranking (Carbonell &
  * Goldstein 1998) — the selection step a retrieval/training-data
  * pipeline runs AFTER top-k: from each query's candidate list, greedily
  * keep the item maximizing λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s), so
  * the final k are relevant AND mutually diverse (near-duplicate
  * neighbors collapse to one representative).
  *
  * Scale shape: the expensive part is candidate RETRIEVAL, which reuses
  * the existing bounded-heap top-C scan (or any ANN serve) — MMR itself
  * touches only nq × C candidate rows. Each query's greedy selection is
  * one native-expression pass over its collected ≤C-struct candidate
  * array (O(k·C) score updates + a C×C cosine table per query, C ≤ 24),
  * embarrassingly parallel across queries, no iteration-deep lineage and
  * no driver participation.
  *
  * Determinism across engines: relevance and pairwise cosines are
  * snapped to integer micro-units (round(cos·1e6)::BIGINT — the same
  * doubles bit-for-bit in both engines, so the same integer), and the
  * MMR score is EXACT INTEGER arithmetic in 1e-7 units:
  * score_e7 = 7·rel_µ − 3·max_pc_µ (λ = 0.7). A float formulation
  * would land on half-rounding boundaries ~1-in-10 per stage (a 6-dp
  * input times 0.7 is a 7-dp half), where BigDecimal HALF_UP and
  * DuckDB's scaled rounding legitimately disagree — integer compare
  * has no boundary at all. Ties break on vec_id asc, so the DuckDB
  * oracle replays the greedy loop as k chained CTE stages
  * (ROW_NUMBER() = 1 under (score_e7 DESC, vec_id)) and hash-matches
  * exactly.
  */
object MmrSelect {

  /** Micro-unit snap: round(x·1e6) as a long — `round(x * 1000000)::
    * BIGINT` in the oracle; both engines see the same double x, so the
    * same integer (cos·1e6 landing exactly on a half-integer double is
    * the same measure-zero class every 6-dp gate already accepts).
    */
  private def micro(x: Double): Long = Math.round(x * 1e6)

  /** Greedy MMR over one query's candidate structs
    * (vec_id: long, rel: double, emb: double[]). Returns
    * array<struct<vec_id, rel_cos, rank, mmr_score_e7>> of the first
    * min(k, n) selections. Stage 1 scores with the empty-set diversity
    * term fixed at 0 (so argmax = argmax rel); later stages use the
    * TRUE max pairwise micro-cosine against the selected set (possibly
    * negative) — both conventions mirrored verbatim in the SQL replay.
    */
  def select(cands: ArrayData, k: Int, lamE1: Int, muE1: Int): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val embs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rel(i) = row.getDouble(1)
      embs(i) = row.getArray(2).toDoubleArray()
      i += 1
    }
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      val e = embs(i)
      var s = 0.0
      var j = 0
      while (j < e.length) { s += e(j) * e(j); j += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    // micro-unit pairwise cosine table, same sequential-fold dot as
    // CosineSimExpr / list_dot_product
    val pc = Array.ofDim[Long](n, n)
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = embs(i); val b = embs(j)
        var d = 0.0
        var t = 0
        while (t < a.length) { d += a(t) * b(t); t += 1 }
        val c = micro(d / (norms(i) * norms(j)))
        pc(i)(j) = c
        pc(j)(i) = c
        j += 1
      }
      i += 1
    }
    val relU = new Array[Long](n)
    i = 0
    while (i < n) { relU(i) = micro(rel(i)); i += 1 }
    val m = math.min(k, n)
    val taken = new Array[Boolean](n)
    val sel = new Array[Int](m)
    val out = new Array[Any](m)
    var r = 0
    while (r < m) {
      var best = -1
      var bestScore = 0L
      i = 0
      while (i < n) {
        if (!taken(i)) {
          var mx = 0L
          if (r > 0) {
            mx = Long.MinValue
            var u = 0
            while (u < r) {
              val p = pc(i)(sel(u))
              if (p > mx) mx = p
              u += 1
            }
          }
          val sc = lamE1 * relU(i) - muE1 * mx
          if (best < 0 || sc > bestScore ||
              (sc == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = sc
          }
        }
        i += 1
      }
      taken(best) = true
      sel(r) = best
      out(r) = new GenericInternalRow(
        Array[Any](ids(best), rel(best), (r + 1).toLong, bestScore))
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** `mmr_select(cands, k, λ·10, μ·10)` as a native expression (codegen'd
  * call, no UDF/serialization boundary): input array<struct<vec_id,
  * rel, emb>>, output the ranked selection array. λ/μ arrive as deci
  * integers (7/3) — the score stays in exact integer arithmetic.
  */
case class MmrSelectExpr(child: Expression, k: Int, lamE1: Int, muE1: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("rel_cos", DoubleType, nullable = false),
    StructField("rank", LongType, nullable = false),
    StructField("mmr_score_e7", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MmrSelect.select(input.asInstanceOf[ArrayData], k, lamE1, muE1)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.similarity.MmrSelect.select($c, $k, $lamE1, $muE1)")
  override protected def withNewChildInternal(newChild: Expression): MmrSelectExpr =
    copy(child = newChild)
}

object Mmr {

  def mmrSelect(cands: Column, k: Int, lamE1: Int, muE1: Int): Column =
    ColumnBridge.column(MmrSelectExpr(
      ColumnBridge.expression(cands), k, lamE1, muE1))

  /** Diversity-re-ranked top-k for the standard query set (vec_id < 10):
    * candidates = the same broadcast-queries × corpus bounded-heap scan
    * as `embTopk` at C = 24, then per-query native greedy MMR at
    * λ = 0.7. The corpus-facing cost is identical to `emb_topk`; the
    * re-rank adds one broadcast join of the 240-row candidate set back
    * onto the (pruned) embeddings scan plus a per-query O(k·C) pass.
    */
  def embMmrTopk(s: SparkSession, dir: String, c: Int = 24, k: Int = 8,
      lamE1: Int = 7, muE1: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // stream-side repartition, same discipline as embTopk: the BNLJ's
    // parallelism is the corpus side's split count
    val shufflePartitions =
      s.conf.get("spark.sql.shuffle.partitions").toInt
    val pairs = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .repartition(shufflePartitions)
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val topc = udaf(new TopKByCos(c))
    val cand = pairs.groupBy(col("query_id"))
      .agg(topc(col("neighbor_id"), col("cos_sim")).as("nbrs"))
      .select(col("query_id"), explode(col("nbrs")).as("nbr"))
      .select(col("query_id"), col("nbr.neighbor_id").as("vec_id"),
        col("nbr.cos_sim").as("rel"))
    // the float→double cast feeds only MMR's pairwise stage, so it
    // runs AFTER the broadcast candidate join — |queries|×c rows, not
    // one converted array per corpus row (same discipline as
    // AnnIndex.servePqMmr's post-join qv8 transform)
    val packed = emb.select(col("vec_id"), col("embedding"))
      .join(broadcast(cand), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"), col("rel"),
        col("embedding").cast(ArrayType(DoubleType)).as("emb"))
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("vec_id"), col("rel"), col("emb"))).as("cands"))
    packed
      .select(col("query_id"), explode(mmrSelect(col("cands"), k, lamE1, muE1)).as("m"))
      .select(col("query_id"), col("m.vec_id").as("vec_id"),
        col("m.rank").as("rank"), col("m.rel_cos").as("rel_cos"),
        col("m.mmr_score_e7").as("mmr_score_e7"))
      .orderBy(col("query_id"), col("rank"))
  }
}
