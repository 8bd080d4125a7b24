package graft

import scala.util.Random

import graft.analytics.TextAnalysis
import org.apache.spark.sql.functions._

/** Seeded randomized properties for the DSIR bucket-model family — the
  * claims the 2-delivery parity test can't cover:
  *
  *  - SLICING INVARIANCE of the durable sink: for ANY partition of a
  *    random corpus into k deliveries, the last delivery's scores equal
  *    the batch operator on the union restricted to that slice (the
  *    additive counter fold is associative and exact, so delivery
  *    boundaries must be unobservable in the final model), and every
  *    intermediate delivery equals the batch operator on its prefix.
  *  - PARTITIONING INDEPENDENCE of the batch operators: re-running
  *    under a different shuffle-partition count and input layout yields
  *    the identical result rows (the engine-order-free claim the DuckDB
  *    hash gate makes cross-engine, asserted here within-engine).
  *
  * Seeds fixed: failures reproduce. The bit-equality assertions lean
  * on the family's 6-dp rounding absorbing aggregation-order float
  * differences — true unless a doc's raw sum lands within ~1e-12 of a
  * 0.5e-6 rounding boundary, which is corpus-dependent; THESE corpora
  * are pinned by seed and verified clear, so a failure after a corpus
  * or seed change should first suspect a new boundary collision, not
  * the operators.
  */
class DsirFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val langs = Seq("en", "de", "es", "fr", "zh")

  private def genCorpus(seed: Int, n: Int): Seq[(Long, String, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 50).map(i => s"w$i")
    (0 until n).map { i =>
      val len = 5 + rnd.nextInt(60)
      (i.toLong,
        (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "),
        langs(rnd.nextInt(langs.length)))
    }
  }

  test("dsir sink: arbitrary slicing is unobservable — every delivery " +
      "equals the batch operator on its prefix corpus") {
    val corpus = genCorpus(17, 120)
    val docs = corpus.toDF("doc_id", "text", "lang")
      .select($"doc_id", $"lang", $"text").persist()
    val rnd = new Random(31)
    // a random 4-slice partition by doc: slice = rnd per doc, fixed seed
    val slice = corpus.map(c => c._1 -> rnd.nextInt(4)).toMap
    val sliceDf = slice.toSeq.toDF("doc_id", "slice")
    val tagged = docs.join(sliceDf, Seq("doc_id")).persist()
    val root = java.nio.file.Files.createTempDirectory("dsir_fuzz").toString
    val feed = s"$root/feed"
    // single-file deliveries: multi-file appends race the running
    // query's poll (partial listing splits a delivery — the flake that
    // exposed the fix now applied to every incremental feed)
    tagged.filter($"slice" === 0).select($"doc_id", $"lang", $"text")
      .coalesce(1).write.parquet(feed)
    val q = TextAnalysis.startDsirSink(
      spark.readStream.schema(docs.schema).parquet(feed),
      s"$root/out", s"$root/idx", s"$root/ckpt")
    try {
      q.processAllAvailable()
      (1 to 3).foreach { j =>
        tagged.filter($"slice" === j).select($"doc_id", $"lang", $"text")
          .coalesce(1).write.mode("append").parquet(feed)
        q.processAllAvailable()
      }
    } finally q.stop()
    val inc = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/out").persist()
    for (d <- 1 to 4) {
      val prefixIds = slice.filter(_._2 <= d - 1).keySet.toSeq.toDF("doc_id")
      val sliceIds = slice.filter(_._2 == d - 1).keySet
      val got = inc.filter($"delivery" === d)
        .select($"doc_id", $"lang", $"n_grams", $"log2_weight",
          $"bits_per_gram")
        .orderBy($"doc_id")
      val want = TextAnalysis.txDsirWeightsDf(
          docs.join(prefixIds, Seq("doc_id")))
        .filter($"doc_id".isin(sliceIds.toSeq: _*))
        .orderBy($"doc_id")
      assert(got.collect().toSeq == want.collect().toSeq, s"delivery $d")
      assert(got.count() > 0, s"delivery $d empty — slicing degenerate")
    }
    inc.unpersist(); tagged.unpersist(); docs.unpersist()
  }

  test("manifest feed: a 4-file delivery lands as ONE micro-batch — " +
      "whole-delivery stamps, scores equal the prefix batch operator") {
    import graft.streaming.ManifestFeed
    val corpus = genCorpus(41, 100)
    val docs = corpus.toDF("doc_id", "text", "lang")
      .select($"doc_id", $"lang", $"text").persist()
    val rnd = new Random(43)
    val slice = corpus.map(c => c._1 -> rnd.nextInt(3)).toMap
    val sliceDf = slice.toSeq.toDF("doc_id", "slice")
    val tagged = docs.join(sliceDf, Seq("doc_id")).persist()
    val root = java.nio.file.Files.createTempDirectory("dsir_mf").toString
    def part(j: Int) =
      tagged.filter($"slice" === j).select($"doc_id", $"lang", $"text")
    // every delivery is FOUR part files, atomically published by its
    // single-file manifest — the r14 verdict #6 mechanism under test
    ManifestFeed.deliver(part(0), root, 0L, 4)
    val q = ManifestFeed.start(spark, root, docs.schema, s"$root/ckpt") {
      (batch, id) => TextAnalysis.dsirCommit(batch, s"$root/out",
        s"$root/idx", id)
    }
    try {
      q.processAllAvailable()
      ManifestFeed.deliver(part(1), root, 1L, 4)
      q.processAllAvailable()
      ManifestFeed.deliver(part(2), root, 2L, 4)
      q.processAllAvailable()
    } finally q.stop()
    // the deliveries really were multi-file (the convention this
    // mechanism replaces could not have produced this layout). The
    // data dir is resolved FROM THE MANIFEST — since the ADVICE-r15
    // race fix it is per-attempt nonce'd, and the manifest line is
    // the one contractual pointer to it.
    (0 to 2).foreach { d =>
      val dataDir = java.nio.file.Files
        .readString(java.nio.file.Paths.get(s"$root/feed/m$d.txt")).trim
      val parts = new java.io.File(dataDir).listFiles
        .count(_.getName.startsWith("part-"))
      assert(parts == 4, s"delivery $d wrote $parts part files, wanted 4")
    }
    val inc = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/out").persist()
    // atomicity: every slice carries exactly ONE delivery stamp (a
    // split delivery would scatter a slice across two stamps), the
    // stamps are 1..3 in publish order, and each delivery's scores
    // equal the batch operator on its prefix corpus (slicing-invariance
    // re-asserted through the manifest path)
    for (d <- 1 to 3) {
      val sliceIds = slice.filter(_._2 == d - 1).keySet
      val got = inc.filter($"doc_id".isin(sliceIds.toSeq: _*))
      assert(got.select($"delivery").distinct().collect().toSeq
        .map(_.getLong(0)) == Seq(d.toLong), s"slice ${d - 1} split/shifted")
      val prefixIds = slice.filter(_._2 <= d - 1).keySet.toSeq.toDF("doc_id")
      val want = TextAnalysis.txDsirWeightsDf(
          docs.join(prefixIds, Seq("doc_id")))
        .filter($"doc_id".isin(sliceIds.toSeq: _*))
        .orderBy($"doc_id")
      val gotRows = got.select($"doc_id", $"lang", $"n_grams",
        $"log2_weight", $"bits_per_gram").orderBy($"doc_id")
      assert(gotRows.collect().toSeq == want.collect().toSeq, s"delivery $d")
      assert(sliceIds.nonEmpty, s"slice ${d - 1} degenerate")
    }
    inc.unpersist(); tagged.unpersist(); docs.unpersist()
  }

  test("batch operators are partitioning-independent: different shuffle " +
      "widths and input layouts yield identical rows") {
    val docs = genCorpus(23, 150).toDF("doc_id", "text", "lang")
      .select($"doc_id", $"lang", $"text")
    def all(df: org.apache.spark.sql.DataFrame) = Seq(
      TextAnalysis.txDsirWeightsDf(df).collect().toSeq,
      TextAnalysis.txDsirSelectDf(df).collect().toSeq,
      TextAnalysis.txNbLangidDf(df).collect().toSeq)
    val a = all(docs.repartition(1))
    val b = all(docs.repartition(17, $"lang"))
    val c = withShufflePartitions(7) { all(docs.repartition(32)) }
    assert(a == b && b == c)
  }

  private def withShufflePartitions[T](n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, old)
  }
}
