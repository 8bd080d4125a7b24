package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Count-Min sketch — the POINT-FREQUENCY member of the
  * sketch family (HLL distinct counts, KLL quantiles, Misra-Gries
  * heavy-hitter candidates): a d×w counter matrix where item x
  * increments cell (i, h_i(x)) for each of the d hash rows, and its
  * frequency estimate is the MINIMUM of its d cells — an estimate that
  * never undercounts and overcounts by at most 2N/w with probability
  * 1 − 2^−d (the classic CM bound).
  *
  * Mergeability is element-wise addition of the counter matrices, so
  * the aggregate participates in map-side partial aggregation like any
  * builtin: per-task O(d·w) state, one small merged row out, NO
  * full-vocabulary shuffle — the same 100 TB shape as the MG pass. The
  * difference in role: MG yields the candidate SET above a frequency
  * floor; CM answers frequency QUERIES for any given item after the
  * fact (the "how common is this token/url/ngram" primitive a corpus
  * pipeline asks of data it has already summarized).
  *
  * Unlike the randomized HLL/KLL sketches, the hash rows here are
  * FIXED (h_i(x) = hash60("cm" + i + ":" + x) mod w — the repo-wide
  * md5-prefix hash), so the whole counter matrix is a deterministic,
  * order-independent function of the token multiset: a DuckDB oracle
  * replays the sketch cell-for-cell from the base table, making CM the
  * sketch whose ESTIMATES are full-hash certified rather than
  * band-certified.
  */
case class CountMinAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with UnaryLike[Expression] {

  require(d >= 1 && w >= 2, "CountMinAgg needs d >= 1 hash rows, w >= 2 cells")

  // declare the string contract so a non-string column coerces (or
  // fails analysis) instead of ClassCastException-ing at execution
  override def inputTypes: Seq[ColumnBridge.InputType] = Seq(StringType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  private def add(buf: Array[Long], tok: String, c: Long): Unit = {
    var i = 0
    while (i < d) {
      val cell = (TextHash.hash60(s"cm$i:$tok") % w).toInt
      buf(i * w + cell) += c
      i += 1
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMin {
  /** `count_min(tok, d, w)` as an aggregate Column: the flattened d×w
    * counter matrix (row-major), mergeable across partitions.
    */
  def countMin(tok: Column, d: Int, w: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(tok), d, w).toAggregateExpression())
}
