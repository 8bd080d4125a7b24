package graft

import graft.similarity.Hybrid
import org.apache.spark.sql.functions._

/** Hybrid retrieval (BM25 + cosine, RRF-fused): the DuckDB gate
  * certifies exact values at all three scales; this spec pins the
  * SEMANTICS on a planted corpus — a document that tops BOTH legs must
  * out-fuse every single-leg winner — plus the structural contract on
  * the real fixture.
  */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("a dual-leg winner out-fuses the single-leg winners") {
    // query 0: doc 15 matches it in BOTH legs, 16 lexically only,
    // 17 densely only; 10-14 are noise in both spaces
    val texts = Seq(
      0L -> "alpha beta gamma delta",
      1L -> "one red word", 2L -> "two green words", 3L -> "three blue items",
      4L -> "four small stones", 5L -> "five tall trees", 6L -> "six warm days",
      7L -> "seven cold nights", 8L -> "eight long roads", 9L -> "nine old maps",
      10L -> "noise nautilus nimbus", 11L -> "quark quill quay",
      12L -> "rustle rampart rook", 13L -> "sable sprocket sphinx",
      14L -> "tundra tapir trellis",
      15L -> "alpha beta gamma delta", // both legs
      16L -> "alpha beta gamma delta", // lexical only
      17L -> "zeta eta theta iota")    // dense only
    val vecOf: Long => Array[Float] = {
      case 0L  => Array(1f, 0f, 0f, 0f)
      case 15L => Array(2f, 0f, 0f, 0f) // cosine 1 with the query
      case 17L => Array(1f, 0f, 0f, 0f)
      case 16L => Array(0f, 1f, 0f, 0f)
      case i   => Array(0f, 0f, 1f, i.toFloat / 100f)
    }
    val docs = texts.toDF("doc_id", "text")
    val emb = texts.map { case (id, _) => (id, vecOf(id)) }
      .toDF("vec_id", "embedding")
    val rows = Hybrid.hybridTopkDf(docs, emb, k = 5, c = 20)
      .filter(col("query_id") === 0).collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
    val top = rows.head
    assert(top.getAs[Long]("doc_id") == 15L, s"rank 1 = ${top}")
    assert(top.getAs[Boolean]("in_lexical") && top.getAs[Boolean]("in_vector"))
    val top4 = rows.take(4).map(_.getAs[Long]("doc_id")).toSet
    assert(Set(16L, 17L).subsetOf(top4),
      s"single-leg winners missing from the fusion head: ${rows.toSeq}")
  }

  test("snippet window covers a planted query-term cluster at the earliest max start") {
    // doc 15: 40 filler tokens, then the query's 4 terms at positions
    // 41-44, then 10 more fillers — every 32-window with all 4 terms
    // has start in [13, 41]; earliest-tie contract picks 13
    val filler = (1 to 40).map(i => s"f$i").mkString(" ")
    val tail = (1 to 10).map(i => s"g$i").mkString(" ")
    val texts = Seq(
      0L -> "alpha beta gamma delta",
      1L -> "one red word", 2L -> "two green words", 3L -> "three blue items",
      4L -> "four small stones", 5L -> "five tall trees", 6L -> "six warm days",
      7L -> "seven cold nights", 8L -> "eight long roads", 9L -> "nine old maps",
      10L -> "noise nautilus nimbus", 11L -> "quark quill quay",
      15L -> s"$filler alpha beta gamma delta $tail")
    val emb = texts.map { case (id, _) =>
      (id, if (id == 0L || id == 15L) Array(1f, 0f, 0f, 0f)
           else Array(0f, 0f, 1f, id.toFloat / 100f))
    }.toDF("vec_id", "embedding")
    val rows = Hybrid.hybridSnippetsDf(texts.toDF("doc_id", "text"), emb,
        k = 5, w = 32)
      .filter(col("query_id") === 0 && col("doc_id") === 15).collect()
    assert(rows.length == 1, "planted dual-leg doc missing from the hit set")
    val r = rows.head
    assert(r.getAs[Long]("snippet_start") == 13L, r.toString)
    assert(r.getAs[Long]("n_matched") == 4L)
    assert(r.getAs[String]("snippet").contains("alpha beta gamma delta"))
    assert(r.getAs[String]("snippet").split(" ").length == 32)
  }

  test("persisted lexical index: documents-free serve, rebuild-deterministic") {
    val served = graft.store.TextIndex.lexBm25Serve(spark, Sf0001)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "lexical serve re-tokenizes the corpus")
    // the panel's term set must push into the candidate postings scan
    // as a parquet IN filter so the token-sorted row groups skip — the
    // property that bounds serve I/O to the queried vocabulary's slice
    assert(plan.contains("In(tok") || plan.contains("in(tok"),
      s"query terms not pushed into the postings scan:\n$plan")
    val rows = served.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("query_id")).distinct.length == 10)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to g.length))
      // ranked by (bm25 desc, doc_id): scores non-increasing
      val scores = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("bm25"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // build determinism: a second root built from the same corpus
    // serves byte-identical results
    val tmp = java.nio.file.Files.createTempDirectory("lexidx").toString + "/i"
    graft.store.TextIndex.build(Tables.documents(spark, Sf0001), tmp)
    assert(graft.store.TextIndex.serveBm25(spark, tmp).collect().toSeq ==
      rows.toSeq)
  }

  test("lexical streaming append: exactly-once, append ≡ full rebuild") {
    import graft.store.TextIndex
    val docs = Tables.documents(spark, Sf0001)
    val n = docs.count()
    val half = n / 2
    val base = docs.filter(col("doc_id") < half)
    val delta = docs.filter(col("doc_id") >= half)
    val root = java.nio.file.Files.createTempDirectory("lexstream")
      .toString + "/idx"
    TextIndex.build(base, root)
    // full-build reference (the additive-stats contract: exact equality)
    val refRoot = java.nio.file.Files.createTempDirectory("lexref")
      .toString + "/idx"
    TextIndex.build(docs, refRoot)
    val deltaDir = java.nio.file.Files.createTempDirectory("lex_delta")
      .toString + "/files"
    delta.write.parquet(deltaDir)
    val ckpt = java.nio.file.Files.createTempDirectory("lex_ckpt").toString
    val q = TextIndex.startAppendSink(
      spark.readStream.schema(docs.schema).parquet(deltaDir), root, ckpt)
    q.processAllAvailable()
    q.stop()
    assert(TextIndex.serveBm25(spark, root).collect().toSeq ==
      TextIndex.serveBm25(spark, refRoot).collect().toSeq)
    // replay short-circuits; torn promote rolls back by prefix
    TextIndex.appendBatch(delta, root, 0L)
    val extra = docs.filter(col("doc_id") < 2)
      .select((col("doc_id") + 70001L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    TextIndex.appendBatch(extra, root, 1L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_committed/batch-1"), false)
    TextIndex.appendBatch(extra, root, 1L)
    val dlRows = spark.read.parquet(s"$root/dl")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
    assert(dlRows.count() == n + 2, "append lost or duplicated documents")
    assert(dlRows.filter(col("c") =!= 1).count() == 0)
    // stats deltas sum to the true totals
    val st = spark.read.parquet(s"$root/stats")
      .agg(sum(col("n_docs"))).head.getLong(0)
    assert(st == n + 2)
  }

  test("retrieval metrics: bounded, consistent with their definitions") {
    val rows = Hybrid.retrievalMetrics(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSeq == (0L until 10L))
    rows.foreach { r =>
      val p = r.getAs[Double]("precision_at_5")
      val mrr = r.getAs[Double]("mrr")
      val ndcg = r.getAs[Double]("ndcg_at_5")
      assert(p >= 0 && p <= 1 && mrr >= 0 && mrr <= 1 && ndcg >= 0 && ndcg <= 1)
      // precision@5 is a count over 5; MRR is 0 or a unit fraction 1/r
      assert(math.abs(p * 5 - math.rint(p * 5)) < 1e-9)
      assert(mrr == 0.0 ||
        (1 to 5).exists(rk => math.abs(mrr - math.rint(1e6 / rk) / 1e6) < 1e-9))
      // zero hits <=> zero everywhere
      assert((p == 0.0) == (mrr == 0.0) && (p == 0.0) == (ndcg == 0.0))
    }
  }

  test("index-served hybrid: no base-table scan on either leg") {
    val served = graft.similarity.Hybrid.hybridServe(spark, Sf0001)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "index-served hybrid re-tokenizes the corpus")
    assert(!plan.contains("embeddings.parquet"),
      "index-served hybrid scans the embeddings")
    val rows = served.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_lexical") || r.getAs[Boolean]("in_vector"))
    }
  }

  test("BM25 leg == naive Scala reference across seeded Zipf corpora") {
    // the arithmetic differential: the distributed inverted-index BM25
    // must equal a straight-line Scala recompute (same double ops in
    // the same order) on corpora with repeated terms, short docs, and
    // vocab skew — not just the fixture
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 3) {
      val nDocs = 14 + trial * 3
      val vocab = 12 + trial * 5
      val texts = (0L until nDocs.toLong).map { id =>
        val len = 3 + rnd.nextInt(12)
        id -> Seq.fill(len)(s"z${math.min(rnd.nextInt(vocab), rnd.nextInt(vocab))}")
          .mkString(" ")
      }
      val emb = texts.map { case (id, _) =>
        (id, Array(1f, id.toFloat, 0f, 1f))
      }.toDF("vec_id", "embedding")
      val got = Hybrid.hybridTopkDf(texts.toDF("doc_id", "text"), emb,
          k = 5, c = 1000)  // c wide-open so fusion == both full rankings
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Double]("rrf_score")))
      // naive reference
      val toks = texts.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
      val n = texts.size.toDouble
      val dl = toks.view.mapValues(_.size.toLong).toMap
      val sumDl = dl.values.sum.toDouble
      val df = toks.values.flatMap(_.distinct).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      def bm25(q: Long, d: Long): Double = {
        val qset = toks(q).toSet
        val s = toks(d).groupBy(identity).view.mapValues(_.size).toSeq
          .filter { case (t, _) => qset(t) }
          .map { case (t, tf) =>
            val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
            idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl(d) * n / sumDl))
          }.sum
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      def rank(scored: Seq[(Long, Double)]): Map[Long, Int] =
        scored.sortBy { case (d, s) => (-s, d) }
          .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
      val want = (0L until math.min(10L, nDocs.toLong)).flatMap { q =>
        val others = texts.map(_._1).filter(_ != q)
        // only docs sharing >= 1 term carry a lexical rank (absent
        // from the inverted-index join otherwise)
        val lexRank = rank(
          others.filter(d => toks(d).exists(toks(q).toSet))
            .map(d => d -> bm25(q, d)))
        val cosRank = rank(
          others.map { d =>
            val (a, b) = (Array(1f, q.toFloat, 0f, 1f), Array(1f, d.toFloat, 0f, 1f))
            val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
            val c = dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
              math.sqrt(b.map(x => x.toDouble * x).sum))
            d -> BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          })
        others.map { d =>
          val lex = lexRank.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          val rrf = BigDecimal(lex + 1.0 / (60 + cosRank(d)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (q, d, rrf)
        }.sortBy(t => (-t._3, t._2)).take(5)
      }
      assert(got.toSeq == want.toSeq, s"trial $trial diverged")
    }
  }

  test("fixture contract: full panel, every hit from at least one leg") {
    val rows = Hybrid.hybridTopk(spark, Sf0001).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("query_id")).distinct.sorted.toSeq ==
      (0L until 10L))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_lexical") || r.getAs[Boolean]("in_vector"))
      val s = r.getAs[Double]("rrf_score")
      assert(s > 0 && s <= 2.0 / 61 + 1e-9)
    }
  }

  test("hybrid dial: cheapest rung meeting target, honest fallback") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("hyd_dial").toString
    Seq(
      (5, 60, 1.0, 0.20), (10, 60, 1.0, 0.50), (20, 10, 1.0, 0.58),
      (20, 60, 1.5, 0.60))
      .toDF("c", "rrf_k", "w_lex", "mean_ndcg")
      .write.mode("overwrite").parquet(s"$root/dial")
    // cheapest meeting 0.4 is c=10 (the c=5 rung misses the bar even
    // though it is cheaper; both c=20 rungs meet it but cost more)
    assert(Hybrid.resolveHybridRung(spark, root, 0.4) == ((10, 60, 1.0)))
    // within one cost tier, rrf_k breaks the tie (both c=20 rungs meet)
    assert(Hybrid.resolveHybridRung(spark, root, 0.55) == ((20, 10, 1.0)))
    // unreachable target: fall back to the best-measured rung
    assert(Hybrid.resolveHybridRung(spark, root, 0.99) == ((20, 60, 1.5)))
  }

  test("dialed serve: resolved rung applied to the same served legs") {
    val dialed = Hybrid.hybridServeDialed(spark, Sf0001).collect()
    assert(dialed.length == 50)
    // plan-shape pin: same column contract as hybrid_serve, and every
    // hit still comes from at least one (cut) leg
    dialed.foreach { r =>
      assert(r.getAs[Boolean]("in_lexical") || r.getAs[Boolean]("in_vector"))
    }
    val stats = Hybrid.hybridDialStats(spark, Sf0001).collect()
    assert(stats.length == Hybrid.HybridRungs.length)
    assert(stats.forall(_.getAs[Long]("n_queries") == 10L))
  }
}
