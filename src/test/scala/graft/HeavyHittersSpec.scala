package graft

import scala.util.Random

import graft.analytics.TextAnalysis
import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._

/** The Misra-Gries heavy-hitters surface: the mergeable-summary
  * coverage guarantee (candidates ⊇ every token above N/k), the
  * partitioning-invariance of the FINAL exact-filtered output, and the
  * bounded summary size — under fuzzed Zipf-ish corpora whose
  * vocabulary far exceeds the sketch capacity, so the shrink path and
  * the partial-merge path both actually run.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish token stream: token i drawn with weight ∝ 1/(i+1), vocab
    * `vocab` ≫ any capacity under test, grouped into `docs` documents.
    */
  private def genDocs(seed: Int, vocab: Int, nTokens: Int,
      docs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val weights = Array.tabulate(vocab)(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val toks = Seq.fill(nTokens) {
      val x = rnd.nextDouble() * total
      val i = {
        val p = java.util.Arrays.binarySearch(cum, x)
        if (p >= 0) p else -p - 1
      }
      s"w$i"
    }
    toks.grouped(math.max(1, nTokens / docs)).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
  }

  private def exactHeavy(toks: Seq[String], pct: Int): Seq[(String, Long, Double)] = {
    val n = toks.size.toLong
    toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * 100L > n * pct }
      .map { case (t, c) =>
        (t, c, BigDecimal(c.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (t, c, _) => (-c, t) }
  }

  test("MG candidate set covers every token above N/k, size stays <= 2k") {
    for (seed <- Seq(11, 12); k <- Seq(16, 64)) {
      val docs = genDocs(seed, vocab = 2000, nTokens = 20000, docs = 40)
      val toks = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      val n = toks.size.toLong
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val mustHave = counts.filter { case (_, c) => c * k > n }.keySet

      val cands = docs.toDF("doc_id", "text").repartition(7)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .agg(HeavyHitters.misraGries(col("tok"), k).as("c"))
        .as[Seq[String]].head().toSet

      assert(cands.size <= 2 * k, s"seed=$seed k=$k size=${cands.size}")
      assert(mustHave.subsetOf(cands),
        s"seed=$seed k=$k missed=${mustHave -- cands}")
    }
  }

  test("two-pass exact heavy hitters == full GROUP BY, any partitioning") {
    for (seed <- Seq(21, 22)) {
      val docs = genDocs(seed, vocab = 3000, nTokens = 30000, docs = 60)
      val toks = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      val want = exactHeavy(toks, pct = 1)
      for (parts <- Seq(1, 7)) {
        val got = TextAnalysis.txHeavyHittersDf(
            docs.toDF("doc_id", "text").repartition(parts),
            capacity = 64, pct = 1)
          .as[(String, Long, Double)].collect().toSeq
        assert(got == want,
          s"seed=$seed parts=$parts got=${got.take(5)} want=${want.take(5)}")
      }
    }
  }

  test("capacity at the guarantee edge still yields the exact answer") {
    // threshold 1% with capacity 101: N/k = N/101 < N/100, so the
    // superset guarantee holds with the thinnest legal margin
    val docs = genDocs(31, vocab = 5000, nTokens = 40000, docs = 80)
    val toks = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
    val want = exactHeavy(toks, pct = 1)
    val got = TextAnalysis.txHeavyHittersDf(
        docs.toDF("doc_id", "text").repartition(5), capacity = 101, pct = 1)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("grouped (per-source) two-pass == full grouped GROUP BY") {
    val rnd = new Random(41)
    // three sources with DIFFERENT vocab skews and sizes, so per-group
    // summaries see different totals and the small group's heavy set
    // differs from the pooled one
    val docs = (for (src <- 0 until 3) yield {
      val d = genDocs(100 + src, vocab = 1000 * (src + 1),
        nTokens = 8000 * (src + 1), docs = 20)
      d.map { case (id, text) => (id + src * 1000L, text, s"s$src") }
    }).flatten.sortBy(_ => rnd.nextDouble())
    val df = docs.toDF("doc_id", "text", "source").repartition(6)

    val want = docs.groupBy(_._3).toSeq.flatMap { case (src, ds) =>
      val toks = ds.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      val n = toks.size.toLong
      toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .filter { case (_, c) => c * 100L > n * 5L }
        .map { case (t, c) =>
          (src, t, c, BigDecimal(c.toDouble / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.sortBy { case (s, t, c, _) => (s, -c, t) }

    val got = TextAnalysis.txHeavyHittersBySourceDf(df, capacity = 64, pct = 5)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == want, s"got=${got.take(5)} want=${want.take(5)}")
  }

  test("registered query runs at sf0.001 and matches its own exact twin") {
    val got = TextAnalysis.txHeavyHitters(spark, Sf0001)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val toks = Tables.documents(spark, Sf0001)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .as[String].collect().toSeq
    assert(got == exactHeavy(toks, pct = 1))
  }

  // ---- Count-Min: the point-frequency sibling of the MG candidate set

  test("count-min never undercounts; every hash row conserves total mass") {
    val (d, w) = (4, 256)
    val docs = genDocs(seed = 77, vocab = 2000, nTokens = 30000, docs = 40)
    val df = docs.toDF("doc_id", "text").repartition(7)
    val toks = df.select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val sk = toks.agg(graft.functions.CountMin.countMin(col("tok"), d, w))
      .head.getSeq[Long](0).toArray
    assert(sk.length == d * w)
    val exact = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = exact.values.sum
    (0 until d).foreach { i =>
      assert(sk.slice(i * w, (i + 1) * w).sum == n,
        s"hash row $i does not conserve mass")
    }
    exact.foreach { case (tok, c) =>
      val est = (0 until d).map { i =>
        sk(i * w + (graft.functions.TextHash.hash60(s"cm$i:$tok") % w).toInt)
      }.min
      assert(est >= c, s"CM undercounts $tok: est=$est exact=$c")
    }
  }

  test("count-min is partitioning-invariant (mergeable matrix)") {
    val docs = genDocs(seed = 91, vocab = 500, nTokens = 8000, docs = 16)
      .toDF("doc_id", "text")
    def matrixOf(parts: Int): Seq[Long] = docs.repartition(parts)
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .agg(graft.functions.CountMin.countMin(col("tok"), 4, 128))
      .head.getSeq[Long](0)
    assert(matrixOf(1) == matrixOf(13))
  }

  test("count-min under Structured Streaming: multi-batch state == batch matrix") {
    // the mergeability claim end-to-end: the aggregate's streaming
    // state (update + merge across micro-batches, complete mode) must
    // land on the exact matrix the one-shot batch aggregate produces
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("tok")
      .agg(graft.functions.CountMin.countMin(col("tok"), 4, 64).as("m"))
      .writeStream.format("memory").queryName("cm_stream")
      .outputMode("complete").start()
    val b1 = Seq.tabulate(500)(i => s"w${i % 11}")
    val b2 = Seq.tabulate(300)(i => s"w${i % 7}")
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT m FROM cm_stream")
      .head.getSeq[Long](0)
    val batch = (b1 ++ b2).toDF("tok")
      .agg(graft.functions.CountMin.countMin(col("tok"), 4, 64))
      .head.getSeq[Long](0)
    assert(streamed == batch)
  }

  test("tx_freq_cm: panel = top-10 heavy hitters, overcount >= 0 everywhere") {
    val rows = TextAnalysis.txFreqCm(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact_n"))
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cm_est") - r.getAs[Long]("exact_n"))
    }
    val panel = TextAnalysis.txHeavyHitters(spark, Sf0001).limit(10)
      .select(col("tok")).as[String].collect().toSet
    assert(rows.map(_.getAs[String]("tok")).toSet == panel)
  }
}
