package graft

import graft.analytics.TextAnalysis
import graft.functions.TextFunctions.{hash60, tokens}
import org.apache.spark.sql.functions._

/** The hashed-bucket model family: DSIR importance weights + resample
  * and the hashed-NB language classifier. The oracle gate certifies the
  * numbers against DuckDB; these specs pin the semantic invariants the
  * hashes alone don't explain.
  */
class DsirSpec extends SparkSpec {

  test("tx_dsir_weights: one row per tokenized doc, n_grams = 2T-1, and " +
      "the native gram kernel matches a pure-Column reimplementation") {
    import spark.implicits._
    val got = TextAnalysis.txDsirWeights(spark, Sf0001)
    val docs = Tables.documents(spark, Sf0001)
    val expected = docs.filter(size(tokens($"text")) >= 1).count()
    assert(got.count() == expected)
    // n_grams: T unigrams + (T-1) bigrams for T >= 1
    val bad = got.join(docs, Seq("doc_id"))
      .filter($"n_grams" =!= (size(tokens($"text")) * 2 - 1).cast("long"))
      .count()
    assert(bad == 0)

    // twin: same math with grams built from pure Column ops (md5 of the
    // joined strings) instead of GramHashesExpr — certifies the native
    // kernel's hashes AND the plan's arithmetic in one comparison
    val toks = tokens($"text")
    val uni = transform(toks, t => t)
    val bi = when(size(toks) >= 2,
      zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat_ws(" ", a, b))).otherwise(array().cast("array<string>"))
    val grams = graft.Par.spread(docs.select($"doc_id", $"lang", $"text"))
      .select($"doc_id", $"lang",
        explode(concat(uni, bi)).as("gram"))
      .select($"doc_id", $"lang", pmod(hash60($"gram"), lit(1024L)).as("bucket"))
    val model = grams.groupBy($"bucket").agg(
      count(lit(1)).as("c_all"),
      sum(when($"lang" === "en", 1L).otherwise(0L)).as("c_t"))
    val totals = model.agg(sum($"c_all").as("n_all"), sum($"c_t").as("n_t"))
    val lr = model.crossJoin(broadcast(totals)).select($"bucket",
      ((log(2.0, ($"c_t" + lit(1L)).cast("double")) -
        log(2.0, ($"n_t" + lit(1024L)).cast("double"))) -
       (log(2.0, ($"c_all" + lit(1L)).cast("double")) -
        log(2.0, ($"n_all" + lit(1024L)).cast("double")))).as("lr"))
    val want = grams.join(broadcast(lr), Seq("bucket"))
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_grams"), sum($"lr").as("s"))
      .select($"doc_id", $"lang", $"n_grams",
        round($"s", 6).as("log2_weight"),
        round($"s" / $"n_grams", 6).as("bits_per_gram"))
      .orderBy($"doc_id")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("tx_dsir_select: keeps exactly ceil(n/5) docs, a subset of the " +
      "weighted corpus, deterministically") {
    import spark.implicits._
    val sel = TextAnalysis.txDsirSelect(spark, Sf0001)
    val weights = TextAnalysis.txDsirWeights(spark, Sf0001)
    val n = weights.count()
    assert(sel.count() == (n + 4) / 5)
    // selected rows carry the same (doc_id, lang, n_grams, log2_weight)
    val joined = sel.select($"doc_id", $"log2_weight".as("w_sel"))
      .join(weights.select($"doc_id", $"log2_weight"), Seq("doc_id"))
    assert(joined.count() == sel.count())
    assert(joined.filter($"w_sel" =!= $"log2_weight").count() == 0)
    // content-addressed noise: the same sample on a re-run
    assert(sel.collect().toSeq ==
      TextAnalysis.txDsirSelect(spark, Sf0001).collect().toSeq)
  }

  test("tx_dsir_incremental: each delivery equals the batch operator on " +
      "its model-so-far sub-corpus, bit-for-bit") {
    import spark.implicits._
    val inc = TextAnalysis.txDsirIncremental(spark, Sf0001)
    val docs = Tables.documents(spark, Sf0001)
    // delivery 1: evens scored under the evens-only model == the batch
    // weights of the even sub-corpus; delivery 2: odds under the full
    // model == the full-corpus batch weights restricted to odds. The
    // counter fold is exact integers, so equality is exact, not ~1e-6.
    val d1 = inc.filter($"delivery" === 1)
      .select($"doc_id", $"lang", $"n_grams", $"log2_weight", $"bits_per_gram")
      .orderBy($"doc_id")
    val w1 = TextAnalysis.txDsirWeightsDf(docs.filter($"doc_id" % 2 === 0))
    assert(d1.collect().toSeq == w1.collect().toSeq)
    val d2 = inc.filter($"delivery" === 2)
      .select($"doc_id", $"lang", $"n_grams", $"log2_weight", $"bits_per_gram")
      .orderBy($"doc_id")
    val w2 = TextAnalysis.txDsirWeightsDf(docs)
      .filter($"doc_id" % 2 === 1).orderBy($"doc_id")
    assert(d2.collect().toSeq == w2.collect().toSeq)
    assert(d1.count() > 0 && d2.count() > 0)
  }

  test("startDsirSink: 6 deliveries with compaction — one folded " +
      "segment left, score-at-arrival parity through the compact") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"lang", $"text")
    val root = java.nio.file.Files.createTempDirectory("dsir_longrun").toString
    val (feed, out, idx, ckpt) = (s"$root/feed", s"$root/out", s"$root/idx",
      s"$root/ckpt")
    docs.filter($"doc_id" % 6 === 0).coalesce(1).write.parquet(feed)
    val q = graft.analytics.TextAnalysis.startDsirSink(
      spark.readStream.schema(docs.schema).parquet(feed), out, idx, ckpt,
      compactEvery = 3)
    try {
      q.processAllAvailable()
      (1 to 5).foreach { j =>
        docs.filter($"doc_id" % 6 === j).coalesce(1)
          .write.mode("append").parquet(feed)
        q.processAllAvailable()
      }
    } finally q.stop()
    // compaction at batch ids 2 and 5 folds everything: exactly one
    // seg_compact_* directory remains (bounded listing for a long-lived
    // sink), and the model fold through it still reproduces the batch
    // operator: delivery d scores slice d-1 under slices 0..d-1
    val dirs = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("seg_"))
    assert(dirs.length == 1 && dirs.head.startsWith("seg_compact_"), dirs.toSeq)
    val inc = spark.read.option("recursiveFileLookup", "true").parquet(out)
    for (d <- Seq(3, 6)) {
      val got = inc.filter($"delivery" === d)
        .select($"doc_id", $"lang", $"n_grams", $"log2_weight",
          $"bits_per_gram")
        .orderBy($"doc_id")
      val want = graft.analytics.TextAnalysis
        .txDsirWeightsDf(docs.filter($"doc_id" % 6 <= d - 1))
        .filter($"doc_id" % 6 === d - 1).orderBy($"doc_id")
      assert(got.collect().toSeq == want.collect().toSeq, s"delivery $d")
    }
  }

  test("tx_nb_langid: matrix counts the whole test split; separable " +
      "corpus classifies perfectly") {
    import spark.implicits._
    val cm = TextAnalysis.txNbLangid(spark, Sf0001)
    val testN = Tables.documents(spark, Sf0001)
      .filter(pmod(hash60(concat(lit("epoch0|"), $"doc_id".cast("string"))),
        lit(100L)) >= 95)
      .count()
    assert(cm.agg(sum($"n_docs")).head().getLong(0) == testN)
    assert(testN > 0)

    // disjoint-vocabulary corpus: every lang has its own word set, so
    // the smoothed class-conditional of the true lang dominates any
    // bucket-collision noise and the confusion matrix must be diagonal
    val langs = Seq("aa", "bb", "cc", "dd", "ee")
    val corpus = (0 until 400).map { i =>
      val l = langs(i % 5)
      val words = (0 until 30).map(j => s"${l}_w${(i * 7 + j * 3) % 12}")
      (i.toLong, words.mkString(" "), l)
    }.toDF("doc_id", "text", "lang")
    val m = TextAnalysis.txNbLangidDf(corpus).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[String]("true_lang") == r.getAs[String]("pred_lang"), r)
    }
    assert(m.map(_.getAs[Long]("n_docs")).sum > 0)
  }
}
