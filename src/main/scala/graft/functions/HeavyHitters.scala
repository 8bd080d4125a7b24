package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters summary (Misra-Gries "frequent" sketch with
  * batched shrink), the frequency member of the sketch family next to
  * HLL distinct counts and KLL quantiles: per-partition summaries of at
  * most 2k counters merge associatively into one ≤2k-counter state, and
  * the classic mergeable-summaries analysis bounds every item's total
  * undercount by N/k — so the final key set is a GUARANTEED superset of
  * every token with true frequency > N/k, independent of row order or
  * partitioning.
  *
  * That superset is the point: exact heavy hitters over 100 TB of
  * tokens WITHOUT a full-vocabulary shuffle. Pass 1 runs this aggregate
  * (O(k) state per task, one tiny merged row out); pass 2 re-counts the
  * ≤2k candidate tokens exactly behind a broadcast semi-join and applies
  * the report threshold to EXACT counts. Each pass is one scan with
  * map-side partial aggregation; the only shuffled rows in pass 2 are
  * candidate-token pairs. The final output is therefore deterministic
  * (order-dependent MG counts never reach it — only the candidate SET,
  * which the N/k guarantee fixes a superset floor under and the exact
  * filter prunes identically from any superset), which is what lets a
  * DuckDB oracle state it from the base table with a plain GROUP BY.
  *
  * A TypedImperativeAggregate rather than a Column formulation because
  * the summary is inherently stateful sequential compute — the same
  * class Spark's own datasketches aggregates (`hll_sketch_agg`,
  * `kll_sketch_agg_double`) are built on; it participates in partial
  * aggregation (Partial/Merge/Final) like any builtin.
  *
  * Shrink discipline: the map grows to at most 2k entries; on overflow
  * it subtracts the (k+1)-th largest count from every entry and drops
  * the non-positive ones, leaving ≤ k survivors. Each shrink removes at
  * least k·t mass for a decrement of t, so cumulative decrements per
  * item stay ≤ N/k (the textbook bound) while updates stay amortized
  * O(1) — no per-increment full-map decrement walk.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "MisraGriesAgg capacity must be >= 1")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def add(buf: java.util.HashMap[String, Long], tok: String,
      c: Long): Unit = {
    buf.merge(tok, c, (a, b) => a + b)
    if (buf.size > 2 * k) shrink(buf)
  }

  /** Subtract the (k+1)-th largest count from all entries, drop ≤0. */
  private def shrink(buf: java.util.HashMap[String, Long]): Unit = {
    val counts = new Array[Long](buf.size)
    val it0 = buf.values().iterator()
    var i = 0
    while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val t = counts(counts.length - (k + 1)) // (k+1)-th largest
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - t
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey, e.getValue)
    }
    buf
  }

  /** The candidate key set, binary-UTF8 sorted for a deterministic
    * array layout (the SET is what downstream consumes; the
    * order-dependent residual counts deliberately do not escape).
    */
  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[UTF8String](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = UTF8String.fromString(it.next()); i += 1 }
    java.util.Arrays.sort(keys, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object HeavyHitters {
  /** `misra_gries(tok, k)` as an aggregate Column: the ≤2k-token
    * candidate superset of every token with frequency > N/k.
    */
  def misraGries(tok: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(tok), k).toAggregateExpression())
}
