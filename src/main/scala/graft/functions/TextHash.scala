package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{column => _, _}
import org.apache.spark.sql.types._

/** Deterministic 60-bit text hashing used by fingerprinting, SimHash and
  * MinHash. The hash is the first 15 hex digits of MD5 interpreted as an
  * integer — chosen because it is reproducible verbatim in any SQL
  * engine as `('0x' || substr(md5(s), 1, 15))::BIGINT` (DuckDB) /
  * `conv(substr(md5(s), 1, 15), 16, 10)` (Spark SQL), which is what the
  * correctness oracle does. 60 bits keeps every value positive in an
  * int64 in every engine.
  */
object TextHash {
  final val Bits = 60

  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of MD5(s), as a non-negative long. */
  def hash60(s: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(s)
    // first 8 bytes big-endian, dropping the low nibble = first 15 hex digits
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hash60(s: String): Long = hash60(s.getBytes("UTF-8"))

  /** SimHash over a token array: for each of the 60 hash bits, sum ±1
    * across tokens; output bit j is set iff the sum is positive.
    * One pass, O(tokens), no shuffle — a narrow per-row fingerprint that
    * scales to any corpus size.
    */
  def simhash60(tokens: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash60(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** MinHash function family: ONE content hash per element, and the k
    * functions derived by bit-rotation + XOR with per-function constants
    * (both bijections on the 60-bit space, so each min is a valid
    * permutation-min sample). One MD5 per element instead of k — the
    * difference between 1× and 16× hash throughput on a 100 TB corpus —
    * and still reproducible verbatim in SQL (shift/or/xor only, no
    * overflow: every intermediate stays under 2^60).
    */
  def rotr60(h: Long, r: Int): Long =
    if (r == 0) h else (h >>> r) | ((h & ((1L << r) - 1)) << (Bits - r))

  /** Rotation amount for function f (never 0 for f in 0..59). */
  def mhRot(f: Int): Int = (f * 7 + 3) % Bits

  /** XOR constant for function f: hash60("mh|" + f). */
  def mhConst(f: Int): Long = hash60("mh|" + f)

  /** Cosine similarity with double accumulation, sequential fold order
    * (mirrors dot/(√sa·√sb) as separate IEEE ops). `aFloat`/`bFloat`
    * pick the element getter — FLOAT[] corpus columns and DOUBLE[]
    * derived columns (centroids) share one kernel; the flags are baked
    * as literals at codegen so the JIT hoists the branch out of the
    * loop.
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; sa += x * x; sb += y * y
      i += 1
    }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  def cosine(a: ArrayData, b: ArrayData): Double = cosine(a, b, true, true)

  /** Plain dot product, same fold order as `cosine`'s dot accumulator
    * (bit-identical to it, and to a SQL engine's sequential
    * list_dot_product fold). Lets the O(n²) exact-dedup path precompute
    * per-vector norms ONCE and pay only one multiply-add per dimension
    * per pair — cosine() recomputes both self-products per pair, 3× the
    * flops where the pair count, not the vector count, dominates.
    */
  def dotProduct(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  /** Integer dot product with LONG accumulation — the pair kernel of the
    * int8-quantized ANN paths (`emb_quantized_topk`, the SQ8 rescore
    * tier). Inputs are integer-typed arrays (the `kind` flags pick the
    * getter, baked as codegen literals: 0=byte 1=short 2=int 3=long), and
    * every intermediate is exact — the worst case (dim × 127²) is far
    * below 2^63 — so the result is engine-independent regardless of fold
    * order, which is what lets the DuckDB oracle certify the quantized
    * ranking. Replaces the interpreted aggregate(zip_with(...)) column
    * formulation that allocated an array and evaluated two lambdas per
    * candidate pair.
    *
    * Edge semantics match the sibling cosine/dotProduct kernels, NOT
    * the zip_with fold they replace: the fold runs over min(len_a,
    * len_b) (mismatched tails ignored) and a NULL ELEMENT reads as 0
    * through the primitive getter (a NULL array still yields NULL via
    * the expressions' null-intolerant contract). The engine's callers
    * feed same-length non-null quantized arrays, where the two
    * formulations are identical.
    */
  def intDot(a: ArrayData, b: ArrayData, aKind: Int, bKind: Int): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      val x: Long = aKind match {
        case 0 => a.getByte(i).toLong
        case 1 => a.getShort(i).toLong
        case 2 => a.getInt(i).toLong
        case _ => a.getLong(i)
      }
      val y: Long = bKind match {
        case 0 => b.getByte(i).toLong
        case 1 => b.getShort(i).toLong
        case 2 => b.getInt(i).toLong
        case _ => b.getLong(i)
      }
      dot += x * y
      i += 1
    }
    dot
  }

  /** Distinct space-joined n-grams over a token array (first-seen order). */
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val sb = new StringBuilder(64)
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** 60-bit hash of the word n-gram STARTING AT EACH POSITION (one
    * element per start, duplicates kept — unlike `shingles`, which is a
    * set). The positional form is what substring-level dedup needs: a
    * flagged hash maps back to the exact token span [pos, pos+n) it
    * covers. Hashing in place skips materializing the gram strings.
    */
  def gramHashes(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val sb = new StringBuilder(64)
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = hash60(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing selection (Schleimer/Wilkerson/Aiken 2003) over a
    * positional hash stream: every window of `w` consecutive hashes
    * selects its RIGHTMOST minimum; returns the DISTINCT selected
    * positions (1-based, to pair with SQL `element_at`) in increasing
    * order. Short streams (0 < n < w) winnow one whole-array window.
    * O(n) via the monotonic deque — popping `>=` from the back makes the
    * newer of two equal hashes win, which IS the rightmost-min tiebreak;
    * the per-window selection is non-decreasing as the window slides, so
    * dedup is append-if-changed.
    */
  def winnowPositions(hashes: ArrayData, w: Int): ArrayData = {
    // w ≤ 0 would read never-written deque slots and return garbage
    // positions silently; fail loudly instead (one branch per row)
    require(w >= 1, s"winnow window must be >= 1, got $w")
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val wlen = math.min(w, n)
    val deque = new Array[Int](n) // candidate indices, window [head, tail)
    var head = 0
    var tail = 0
    val out = new java.util.ArrayList[Any](n / w + 2)
    var last = -1
    var i = 0
    while (i < n) {
      val v = hashes.getLong(i)
      while (tail > head && hashes.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - wlen) head += 1
      if (i >= wlen - 1) {
        val p = deque(head)
        if (p != last) { out.add(p + 1); last = p }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One-pass gram statistics (see GramStatsExpr): hash-count the word
    * n-grams, then a single map walk yields the mode count, the
    * tiebroken mode gram (binary-UTF8-smallest among max-count grams —
    * identical to array_sort order and to SQL's `ORDER BY g ASC`) and
    * the Σ count·numChars mass of duplicated grams. `numChars` matches
    * both engines' character (not byte) length semantics.
    */
  def gramStats(tokens: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    val len = tokens.numElements()
    var best = 0L
    var bestg: UTF8String = UTF8String.fromString("")
    var dup = 0L
    if (len >= n) {
      val counts = new java.util.HashMap[UTF8String, Array[Long]]()
      val sb = new StringBuilder(64)
      var i = 0
      while (i <= len - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          j += 1
        }
        val g = UTF8String.fromString(sb.toString)
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
        i += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val g = e.getKey
        val c = e.getValue()(0)
        if (c > best || (c == best && g.compareTo(bestg) < 0)) {
          best = c; bestg = g
        }
        if (c >= 2L) dup += c * g.numChars()
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestg, dup))
  }

  def minhashSig(elems: ArrayData, k: Int): ArrayData = {
    val rots = Array.tabulate(k)(mhRot)
    val consts = Array.tabulate(k)(mhConst)
    val sig = Array.fill[Long](k)(Long.MaxValue)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      if (!elems.isNullAt(i)) {
        val h = hash60(elems.getUTF8String(i).getBytes)
        var f = 0
        while (f < k) {
          val v = rotr60(h, rots(f)) ^ consts(f)
          if (v < sig(f)) sig(f) = v
          f += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Kernel of [[SpanCutExpr]]: kept tokens after deleting 0-based
    * index ranges [s, e) (spans = array<struct<s:long, e:long>>).
    */
  def spanCut(toks: ArrayData, spans: ArrayData): ArrayData = {
    val m = spans.numElements()
    val n = toks.numElements()
    val s = new Array[Long](m)
    val e = new Array[Long](m)
    var j = 0
    while (j < m) {
      val r = spans.getStruct(j, 2)
      s(j) = r.getLong(0)
      e(j) = r.getLong(1)
      j += 1
    }
    // insertion sort by start — span lists are per-doc and tiny
    j = 1
    while (j < m) {
      val (sj, ej) = (s(j), e(j))
      var p = j - 1
      while (p >= 0 && s(p) > sj) { s(p + 1) = s(p); e(p + 1) = e(p); p -= 1 }
      s(p + 1) = sj; e(p + 1) = ej
      j += 1
    }
    val kept = new java.util.ArrayList[AnyRef](n)
    var si = 0
    var i = 0
    while (i < n) {
      while (si < m && e(si) <= i) si += 1
      if (!(si < m && i >= s(si) && i < e(si)))
        kept.add(toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(kept.toArray)
  }
}

/** `simhash60(tokens)` as a native Catalyst expression with codegen —
  * stays inside WholeStageCodegen (no UDF/serialization boundary).
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash60(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash60($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}

/** `shingles(tokens, n)` as a native Catalyst expression: distinct
  * space-joined word n-grams in first-seen order. The pure-Column
  * formulation (transform over sequence + slice + concat_ws +
  * array_distinct) is semantically identical but ~10× slower — the
  * nested higher-order functions defeat codegen and allocate per slice.
  * Shingle output is consumed as a SET everywhere (explode/intersect/
  * union), so element order is unobservable.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** Cosine similarity of two float-array embeddings as a native binary
  * expression. Accumulates in double with the same sequential fold the
  * SQL oracle uses (dot / (√‖a‖ · √‖b‖)), so results stay bit-comparable
  * across engines; ~10× faster than the aggregate(zip_with(...)) column
  * formulation, which interprets a lambda per element.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.cosine($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(a, b)` — the norm-precomputed pair kernel of the exact
  * O(n²) dedup path (see TextHash.dotProduct's scaladoc).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.dotProduct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.dotProduct($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** `int_dot(a, b)` — exact integer dot product (LONG accumulation) of
  * two integer-typed arrays; the codegen'd sibling of `DotProductExpr`
  * for the int8-quantized pair loops. Element kinds are resolved from
  * the child types at planning and baked as codegen literals (the JIT
  * hoists the branch out of the loop, same pattern as CosineSimExpr's
  * float flags).
  */
case class IntDotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  private def kind(e: Expression): Int = e.dataType match {
    case ArrayType(ByteType, _) => 0
    case ArrayType(ShortType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case ArrayType(LongType, _) => 3
    case other => throw new IllegalArgumentException(
      s"int_dot expects integer-typed arrays, got ${other.sql}")
  }
  // resolved once per plan, not re-pattern-matched per interpreted row
  @transient private lazy val leftKind: Int = kind(left)
  @transient private lazy val rightKind: Int = kind(right)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int_dot expects two integer-typed arrays, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.intDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftKind, rightKind)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.intDot($a, $b, $leftKind, $rightKind)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)
}

/** `gram_hashes(tokens, n)` as a native Catalyst expression with
  * codegen — positional n-gram hashes for substring-level dedup.
  */
/** One-pass gram statistics for the repetition signals
  * (`TextAnalysis.txRepetition`): over the word n-grams of a token
  * array, the mode count, the mode gram (ties → lexicographically
  * smallest, binary UTF8 order — the same tiebreak as a
  * (count DESC, gram ASC) SQL rank), and the duplicated char mass
  * Σ count·numChars over grams with count ≥ 2. The interpreted
  * sort+fold column formulation of the same statistics ran ~2.3 ms per
  * ~60-token doc (lambda interpretation per element); this native
  * hash-count pass is the 100 TB-viable form.
  */
case class GramStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("best", LongType, nullable = false),
    StructField("bestg", StringType, nullable = false),
    StructField("dup", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    TextHash.gramStats(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.gramStats($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): GramStatsExpr =
    copy(child = newChild)
}

/** Winnowed fingerprint positions (TextAnalysis.txWinnow) as one native
  * pass — replaces an O(windows · w²) interpreted HOF argmin (which read
  * ~290 s on the sf0.1 corpus) with the O(n) monotonic deque.
  */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.winnowPositions(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.winnowPositions($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

case class GramHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.gramHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.gramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

/** `minhash_sig(elems, k)` as a native Catalyst expression with codegen. */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Sign-random-projection LSH bucketing as one native pass
  * (similarity.Similarity's scale path). Plane p's ±1 component for
  * dimension d is a splitmix64 mix of (p, d) — REPLICATED BIT-FOR-BIT
  * from the Column formulation it replaces (same golden-ratio constant,
  * same shift/multiply chain, same sequential double accumulation), so
  * bucket assignments are unchanged while the 64·planes interpreted
  * lambda evaluations per row collapse into one codegen'd loop.
  */
object LshHash {
  /** Deterministic ±1 for (plane, dimension) — splitmix64 top bit. */
  def planeSign(p: Int, d: Long): Double = {
    val z = d + p.toLong * 0x9e3779b97f4a7c15L
    val m1 = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    val m2 = (m1 ^ (m1 >>> 27)) * 0x94d049bb133111ebL
    if (((m2 ^ (m2 >>> 31)) >>> 63) == 0L) 1.0 else -1.0
  }

  /** One bucket id per hash table: table t's bucket bit j is the sign of
    * the projection onto plane planeOffset+t·planesPerTable+j. Float
    * embedding, double accumulation in element order. `planeOffset`
    * selects a disjoint plane family (used by the oversized-bucket
    * splitter so split bits never correlate with the base bucket bits);
    * offset 0 is bit-compatible with the original allocation.
    */
  def lshBuckets(emb: ArrayData, planesPerTable: Int, nTables: Int,
      planeOffset: Int = 0): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < planesPerTable) {
        val p = planeOffset + t * planesPerTable + j
        var acc = 0.0
        var d = 0
        while (d < n) { acc += emb.getFloat(d).toDouble * planeSign(p, d.toLong); d += 1 }
        if (acc > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `lsh_buckets(embedding, planesPerTable, nTables)` as a native
  * codegen'd expression → array of one bucket id per hash table.
  */
case class LshBucketsExpr(child: Expression, planesPerTable: Int, nTables: Int,
    planeOffset: Int = 0)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    LshHash.lshBuckets(input.asInstanceOf[ArrayData], planesPerTable, nTables,
      planeOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshHash.lshBuckets($c, $planesPerTable, $nTables, $planeOffset)")
  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

/** `span_cut(tokens, spans)` — kept tokens after deleting the 0-based
  * index ranges [s, e): token i survives iff no span covers it.
  * Semantically identical to the HOF
  * `filter(toks, (_, i) => !exists(spans, p => i >= p.s && i < p.e))`,
  * but codegen'd: higher-order functions don't participate in codegen,
  * so the HOF form drops the WHOLE corpus-rewrite projection to the
  * interpreted path (per-token lambda re-evaluation — the
  * dedup_exact_runs_apply cpu tax, r14 verdict #4). The kernel sorts
  * the spans by start (collect_list order is arbitrary) and sweeps
  * tokens and spans together — exact for ANY span set: a span skipped
  * because its end ≤ i can never cover a later index, and while the
  * pointer holds span j, any candidate later span t has s(t) ≥ s(j),
  * so "not covered by j" (i < s(j)) implies "not covered by t".
  * Kept elements are the input's UTF8String views (same aliasing
  * contract as the built-in ArrayFilter it replaces).
  */
case class SpanCutExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = left.dataType
  override protected def nullSafeEval(t: Any, sp: Any): Any =
    TextHash.spanCut(t.asInstanceOf[ArrayData], sp.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, sp) => s"graft.functions.TextHash.spanCut($t, $sp)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCutExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level text primitives shared by TextAnalysis / Dedup.
  * Everything here is built from codegen'd builtins or the native
  * expressions above — no Scala UDF closures anywhere.
  */
object TextFunctions {
  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Distinct word n-gram shingles (space-joined), via the native
    * ShinglesExpr (set semantics; see its scaladoc for why not the
    * pure-Column formulation).
    */
  def shingles(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(tokens(text)), n))

  /** 60-bit MD5-derived content hash (SQL-reproducible, see TextHash). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  def simhash60(tokensCol: Column): Column =
    ColumnBridge.column(SimHash60Expr(ColumnBridge.expression(tokensCol)))

  def minhashSig(elemsCol: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(elemsCol), k))

  /** Positional n-gram hashes (one per start index, duplicates kept). */
  def gramHashes(tokensCol: Column, n: Int): Column =
    ColumnBridge.column(GramHashesExpr(ColumnBridge.expression(tokensCol), n))

  /** One-pass n-gram mode/duplication stats (repetition signals). */
  def gramStats(tokensCol: Column, n: Int): Column =
    ColumnBridge.column(GramStatsExpr(ColumnBridge.expression(tokensCol), n))

  /** Distinct winnow-selected 1-based positions over a positional hash
    * array (rightmost-min per w-window; see TextHash.winnowPositions).
    */
  def winnowPositions(hashesCol: Column, w: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(hashesCol), w))

  /** The document's winnowed fingerprint SET: distinct hashes at the
    * winnow-selected positions. One source of truth for the MOSS
    * selection semantics shared by tx_winnow and dedup_winnow. The
    * two-arg form takes already-selected positions so a caller that
    * also reports them (tx_winnow's n_prints) runs the deque once.
    */
  def winnowFingerprints(hashesCol: Column, w: Int): Column =
    winnowFingerprints(hashesCol, winnowPositions(hashesCol, w))

  def winnowFingerprints(hashesCol: Column, posCol: Column): Column =
    array_distinct(transform(posCol, p => element_at(hashesCol, p)))

  /** Count of tokens found in a (small, broadcast-as-literal) stopword set. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Kept tokens after deleting index spans [s, e) — native SpanCutExpr
    * (see its scaladoc for why not the filter × exists HOF).
    */
  def spanCut(toksCol: Column, spansCol: Column): Column =
    ColumnBridge.column(SpanCutExpr(
      ColumnBridge.expression(toksCol), ColumnBridge.expression(spansCol)))
}
