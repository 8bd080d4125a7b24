package graft

import graft.dedup.Dedup
import graft.functions.{TextFunctions, TextHash}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class TextHashSpec extends SparkSpec {
  import spark.implicits._

  test("hash60 (Scala) equals the conv(md5) column path") {
    val samples = Seq("", "a", "the quick brown fox", "spark", "ümlaut µ")
    val viaCol = samples.toDF("s")
      .select(TextFunctions.hash60(col("s"))).as[Long].collect()
    val viaScala = samples.map(TextHash.hash60)
    assert(viaCol.toSeq == viaScala)
  }

  test("intDot: exact integer dot over byte/long arrays, codegen and SQL paths agree") {
    // long arrays (the floor()-quantized shape embQuantizedTopk feeds)
    val viaLong = Seq((Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)))
      .toDF("a", "b").select(Similarity.intDot(col("a"), col("b"))).as[Long].head()
    assert(viaLong == 1 * 4 + -2 * 5 + 3 * -6)
    // byte arrays (the stored SQ8 shape — ARRAY<TINYINT>, not BINARY:
    // Seq[Byte], since Array[Byte] encodes as BINARY), kinds byte×long
    val bytes = Seq((Seq[Byte](127, -128, 1), Seq(2L, 3L, -4L))).toDF("a", "b")
    assert(bytes.select(Similarity.intDot(col("a"), col("b"))).as[Long].head()
      == 127L * 2 - 128L * 3 - 4L)
    // worst-case magnitude stays exact in the LONG accumulator
    val big = Seq((Seq.fill(4096)(127L), Seq.fill(4096)(127L))).toDF("a", "b")
    assert(big.select(Similarity.intDot(col("a"), col("b"))).as[Long].head()
      == 4096L * 127 * 127)
    // registered SQL twin
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_int_dot(array(1L,2L,3L), array(4L,5L,6L))")
      .as[Long].head() == 32L)
    // self-dot equals the norm path sq8Of relies on
    val sd = Seq(Seq(-3L, 4L)).toDF("a")
      .select(Similarity.intDot(col("a"), col("a"))).as[Long].head()
    assert(sd == 25L)
  }

  test("simhash60: empty → 0; identical token lists → identical; near-dup close") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),       // identical
      (3L, "a b c d e f g h i k"),       // one token changed
      (4L, "zz yy xx ww vv uu tt ss")    // unrelated
    ).toDF("id", "text")
      .select(col("id"), TextFunctions.simhash60(TextFunctions.tokens(col("text"))).as("fp"))
    val fp = df.as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    val near = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val far  = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(near < far, s"near=$near far=$far")
    val empty = Seq((1L, "")).toDF("id", "text")
      .select(TextFunctions.simhash60(TextFunctions.tokens(col("text")))).as[Long].head()
    assert(empty == 0L)
  }

  test("minhash signature estimates Jaccard within tolerance") {
    val a = (1 to 40).map(i => s"tok$i")
    val b = (1 to 30).map(i => s"tok$i") ++ (100 to 109).map(i => s"tok$i")
    // true jaccard = 30 / 50 = 0.6
    val df = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.minhashSig(TextFunctions.tokens(col("text")), 64).as("sig"))
    val sigs = df.as[(Long, Seq[Long])].collect().toMap
    val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 64.0
    assert(math.abs(est - 0.6) < 0.2, s"est=$est")
  }

  test("all three near-dup detectors find the 25 planted pairs at sf0.01") {
    val ngram = Dedup.dedupNgramJaccard(spark, Sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(ngram.size == 25)
    val minhash = Dedup.dedupMinhashLsh(spark, Sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(minhash == ngram, "MinHash-LSH must recover the exact-Jaccard pairs")
    val simhash = Dedup.dedupSimhash(spark, Sf001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // simhash is the coarsest detector: at hamming ≤ 4 it recovers the
    // planted pairs whose fingerprints flipped ≤ 4 bits (20 of 25 here)
    // with only a handful of false candidates from this low-entropy vocab
    assert((ngram intersect simhash).size >= 18, s"simhash found ${simhash.size}, overlap ${(ngram intersect simhash).size}")
    assert(simhash.size <= 60)
  }

  test("exact dedup report is consistent") {
    val r = Dedup.dedupExact(spark, Sf0001).collect().head
    val total = r.getAs[Long]("total_docs")
    val uniq = r.getAs[Long]("unique_texts")
    val dup = r.getAs[Long]("docs_in_dup_groups")
    assert(total >= uniq && dup >= 0)
  }

  test("embedding near-dup detector fires on planted near-identical vectors") {
    import spark.implicits._
    val v  = Seq.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v2 = v.updated(0, v(0) + 0.001f)                      // near-dup of v
    val w  = Seq.tabulate(64)(i => math.cos(3.0 * i).toFloat) // unrelated
    val emb = Seq((1L, v), (2L, v2), (3L, w)).toDF("vec_id", "embedding")
    val pairs = Similarity.dedupEmbeddingDf(emb, 0.95)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // the driver data has no planted embedding near-dups (max cos ≈ 0.51)
    assert(Similarity.dedupEmbedding(spark, Sf001).count() == 0)
  }

  test("LSH buckets: identical vectors share a bucket, recall vs brute force is sane") {
    val buckets = Similarity.embLshBuckets(spark, Sf001)
    val n = buckets.count()
    assert(n == 500)
    val distinctBuckets = buckets.select("bucket").distinct().count()
    // 8 planes → ≤256 buckets; data should spread across many of them
    assert(distinctBuckets > 10 && distinctBuckets <= 256, s"buckets=$distinctBuckets")
  }

  test("IVF probe top-k: well-formed ranks, recall vs brute force reported") {
    import org.apache.spark.sql.functions.col
    val ivf = Similarity.embIvfTopk(spark, Sf001).collect()
    assert(ivf.length == 50) // 10 queries × top-5 (every probed pair of cells holds ≥5)
    // ranks are 1..5 per query, cosines non-increasing within a query
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      val cs = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // recall@5 vs the exact search — informational floor: probing 2 of
    // 10 cells must still find a decent share of the true neighbors
    val exact = Similarity.embTopk(spark, Sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = ivf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5=$recall")
  }

  test("boilerplate spans: planted shared spans give exact interval-union coverage") {
    def toks(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i")
    val span1 = (1 to 12).map(i => s"shared$i")   // 12 tokens → 5 flagged 8-grams
    val span2 = (1 to 8).map(i => s"block$i")     //  8 tokens → 1 flagged 8-gram
    val docs = Seq(
      // A and B share span1 inside distinct contexts → covered = 12 each
      (1L, (toks("a", 6) ++ span1 ++ toks("b", 6)).mkString(" ")),
      (2L, (toks("c", 6) ++ span1 ++ toks("d", 6)).mkString(" ")),
      // D and E share TWO disjoint spans → two islands, covered = 12 + 8
      (3L, (toks("e", 4) ++ span1 ++ toks("f", 4) ++ span2 ++ toks("g", 4)).mkString(" ")),
      (4L, (toks("h", 4) ++ span1 ++ toks("i", 4) ++ span2 ++ toks("j", 4)).mkString(" ")),
      // unique doc → nothing flagged; short doc → no grams at all
      (5L, toks("k", 24).mkString(" ")),
      (6L, toks("m", 5).mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.analytics.TextAnalysis.txBoilerplateDf(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("covered_tokens"))).toMap
    assert(out(1L) == (17L, 12L)) // 24 tokens → 17 grams; span1 covered
    assert(out(2L) == (17L, 12L))
    assert(out(3L)._2 == 20L)     // 12 + 8, two islands
    assert(out(4L)._2 == 20L)
    assert(out(5L) == (17L, 0L))
    assert(out(6L) == (0L, 0L))

    // the APPLY step cuts exactly the flagged spans
    val cleaned = graft.analytics.TextAnalysis.txBoilerplateApplyDf(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_after"), r.getAs[String]("cleaned_text"))).toMap
    assert(cleaned(1L) == (12L, (toks("a", 6) ++ toks("b", 6)).mkString(" ")))
    assert(cleaned(3L) == (12L,
      (toks("e", 4) ++ toks("f", 4) ++ toks("g", 4)).mkString(" ")))
    assert(cleaned(5L) == (24L, toks("k", 24).mkString(" "))) // untouched
    assert(cleaned(6L) == (5L, toks("m", 5).mkString(" ")))
  }

  test("PII redaction: typed placeholders, counts before redaction, order email→ip→phone") {
    val docs = Seq(
      (1L, "mail a.b+c@sub.example.org and x@y.io twice"),
      (2L, "server 192.168.0.1 and 10.0.255.7 here"),
      (3L, "call 555-123-4567 now"),
      (4L, "mixed u1@ex.com at 10.0.0.1 dial 555-000-1111"),
      (5L, "clean text, no pii at all"),
      // version strings must NOT match the IP pattern (word boundary +
      // exactly four octets), 5-octet strings match only their prefix
      (6L, "v1.2.3 is fine but 1.2.3.4.5 has an ip prefix")
    ).toDF("doc_id", "text")
    val out = graft.analytics.TextAnalysis.txRedactDf(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"), r.getAs[Long]("n_phones")),
          r.getAs[String]("redacted_text"), r.getAs[Boolean]("pii_found"))).toMap
    assert(out(1L) == ((2L, 0L, 0L), "mail <EMAIL> and <EMAIL> twice", true))
    assert(out(2L) == ((0L, 2L, 0L), "server <IP> and <IP> here", true))
    assert(out(3L) == ((0L, 0L, 1L), "call <PHONE> now", true))
    assert(out(4L) == ((1L, 1L, 1L), "mixed <EMAIL> at <IP> dial <PHONE>", true))
    assert(out(5L) == ((0L, 0L, 0L), "clean text, no pii at all", false))
    assert(out(6L)._1._1 == 0L && out(6L)._3 == true)
  }

  test("containment catches an excerpt that jaccard misses") {
    import graft.functions.TextFunctions.shingles
    def words(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    // doc 2 = a verbatim 12-token excerpt of 100-token doc 1
    val docs = Seq(
      (1L, words("w", 1, 100)),
      (2L, words("w", 40, 51)),
      (3L, words("z", 1, 50))
    ).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
    val pair = sets.as("a").join(sets.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(col("b.sh"))).as("containment"))
      .head()
    assert(pair.getAs[Double]("jaccard") < 0.2)      // jaccard blind
    assert(pair.getAs[Double]("containment") == 1.0) // containment sees it
  }

  test("containment apply: no survivor is contained in a larger doc; excerpts die") {
    import graft.functions.TextFunctions.shingles
    val surv = graft.dedup.Dedup.dedupApplyContainment(spark, Sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val total = Tables.documents(spark, Sf001).count()
    assert(surv.size < total, "apply dropped nothing — planted excerpts should die")
    // keep-the-larger invariant: every >=0.8-contained-in-LARGER doc is
    // gone, so no surviving doc may have such a container at all
    val sizes = Tables.documents(spark, Sf001)
      .select(col("doc_id"), size(shingles(col("text"), 3)).as("n_sh"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val violating = graft.dedup.Dedup.dedupContainment(spark, Sf001)
      .collect()
      .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id")))
      .filter { case (x, y) =>
        surv(x) && (sizes(y) > sizes(x) || (sizes(y) == sizes(x) && y < x)) }
    assert(violating.isEmpty, s"survivors still contained: ${violating.take(5).toSeq}")
  }

  test("incremental dedup: within- and cross-delivery dups die, index accumulates") {
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val textA = words("alpha", 30); val textB = words("beta", 30)
    val d1 = Seq((1L, textA), (3L, textA), (5L, textB)).toDF("doc_id", "text")
    val d2 = Seq((2L, textB), (4L, words("gamma", 30))).toDF("doc_id", "text")
    val (s1, idx1) = graft.dedup.Dedup.incrementalStep(d1,
      graft.dedup.Dedup.emptyIndex(spark))
    // within delivery 1: doc 3 is a verbatim copy of doc 1 -> dropped
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
    assert(idx1.count() == 16) // 2 survivors x 8 band rows
    val (s2, idx2) = graft.dedup.Dedup.incrementalStep(d2, idx1)
    // cross delivery: doc 2 duplicates indexed doc 5 -> dropped; 4 is new
    assert(s2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(idx2.count() == 24)
    // the registered two-delivery simulation matches batch minhash dedup's
    // pair knowledge: no surviving pair is a near-dup
    val surv = graft.dedup.Dedup.dedupIncremental(spark, Sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = graft.dedup.Dedup.dedupMinhashLsh(spark, Sf001)
      .filter(col("est_jaccard") >= 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val bothSurvive = pairs.filter { case (a, b) => surv(a) && surv(b) }
    assert(bothSurvive.isEmpty, s"surviving near-dup pairs: ${bothSurvive.toSeq}")
  }

  test("chunk dedup catches paragraph reuse that doc-level jaccard misses") {
    def words(p: String, a: Int, b: Int) = (a to b).map(i => s"$p$i").mkString(" ")
    // doc 2 reuses doc 1's second chunk (tokens 49-112) verbatim inside
    // 300 otherwise-unrelated tokens: doc-level jaccard ≈ 64/550 << 0.5,
    // but the shared chunk aligns on both docs' stride-48 grid
    val shared = words("w", 49, 112)
    val docs = Seq(
      (1L, words("w", 1, 48) + " " + shared + " " + words("w", 113, 200)),
      (2L, words("x", 1, 48) + " " + shared + " " + words("y", 1, 200)),
      (3L, words("z", 1, 300))
    ).toDF("doc_id", "text")
    val chunks = docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), floor((size(col("toks")) - 1) / 48).cast("int"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("toks"), col("chunk_id") * 48 + 1, lit(64)), " ").as("chunk_text"))
    val got = graft.dedup.Dedup.dedupChunksDf(chunks)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_chunk_pairs")))
    // the only cross-doc chunk dup is docs 1↔2's shared paragraph
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)), s"got ${got.toSeq}")
    assert(got.head._3 >= 1)
    // while doc-level near-dup detection is blind to the pair
    val docPairs = graft.dedup.Dedup.dedupMinhashLshDf(docs).collect()
    assert(docPairs.isEmpty, s"doc-level pairs: ${docPairs.toSeq}")
  }

  test("decontamination flags exactly the train docs quoting the eval set") {
    val evalSet = Seq(
      (100L, (1 to 20).map(i => s"e$i").mkString(" ")),
      (101L, (1 to 20).map(i => s"f$i").mkString(" "))
    ).toDF("doc_id", "text")
    val quote = (5 to 14).map(i => s"e$i").mkString(" ") // 10 toks -> 3 8-grams
    val train = Seq(
      (1L, s"x1 x2 $quote y1 y2"),
      (2L, (1 to 30).map(i => s"t$i").mkString(" ")),     // clean
      // quotes BOTH eval docs: 8 toks of e (1 gram), 9 toks of f (2 grams)
      (3L, (3 to 10).map(i => s"e$i").mkString(" ") + " z " +
        (2 to 10).map(i => s"f$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.analytics.TextAnalysis.decontaminateDf(train, evalSet)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L, 1L), (3L, 3L, 2L)))
  }

  test("unigram surprisal: analytic bits/token on a hand-built corpus") {
    // corpus of 8 token instances: 'a'x4 in d1; four singletons in d2
    // d1: -(log2(4) - log2(8)) = 1 bit/token; d2: log2(8) = 3 bits/token
    val docs = Seq((1L, "a a a a"), (2L, "b c d e")).toDF("doc_id", "text")
      .createOrReplaceTempView("tmp_unigram")
    val inst = spark.table("tmp_unigram")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val vocab = inst.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).cast("double").as("total"))
    val got = inst.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(sum(-(log(2.0, col("c").cast("double")) - log(2.0, col("total"))))
        / count(lit(1)), 6).as("bits"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("bits")).toMap
    assert(got == Map(1L -> 1.0, 2L -> 3.0))
    // corpus invariant at sf0.001: common-token docs score lower than
    // the corpus-wide max; all scores positive and finite
    val corpus = graft.analytics.TextAnalysis.txUnigramBits(spark, Sf0001).collect()
    assert(corpus.forall { r =>
      val b = r.getAs[Double]("bits_per_token"); b > 0 && !b.isInfinite
    })
  }

  test("chunking: stride/overlap cover every token; non-overlap parts reconstruct the doc") {
    val out = graft.analytics.TextAnalysis.txChunk(spark, Sf0001)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(out.keySet == docs.filter(_._2.nonEmpty).keySet)
    out.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      val toks = docs(id)
      // chunk k starts at k*48 and holds min(64, n - 48k) tokens
      sorted.foreach { c =>
        val k = c.getAs[Long]("chunk_id").toInt
        val expect = toks.slice(k * 48, k * 48 + 64)
        assert(c.getAs[String]("chunk_text") == expect.mkString(" "))
        assert(c.getAs[Long]("n_chunk_tokens") == expect.length)
      }
      // dropping each chunk's 16-token overlap tail reconstructs the doc
      val rebuilt = sorted.flatMap { c =>
        val k = c.getAs[Long]("chunk_id").toInt
        toks.slice(k * 48, math.min(k * 48 + 48, toks.length))
      }
      assert(rebuilt.toSeq == toks)
    }
  }

  test("tf-idf keywords: rare terms beat ubiquitous ones, which score zero") {
    val docs = Seq(
      (1L, "x x common"), (2L, "y common"), (3L, "z common")
    ).toDF("doc_id", "text")
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokens
    // run the same pipeline the operator uses, over the hand corpus
    val inst = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = inst.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("tok"))
    val scored = tf.join(df, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("score", round(col("tf").cast("double") *
        (log(2.0, col("n_docs")) - log(2.0, col("df").cast("double"))), 6))
      .withColumn("rk", row_number().over(w))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("tok")) ->
        (r.getAs[Double]("score"), r.getAs[Int]("rk"))).toMap
    assert(scored((1L, "x"))._2 == 1 && scored((1L, "x"))._1 == 3.169925)
    assert(scored((1L, "common"))._1 == 0.0)
    assert(scored((2L, "y"))._2 == 1 && scored((3L, "z"))._2 == 1)
    // corpus run: exactly 3 keywords per doc, ranks 1..3
    val corpus = graft.analytics.TextAnalysis.txKeywords(spark, Sf0001).collect()
    val perDoc = corpus.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.values.forall(_.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L)))
  }

  test("weighted sample: long docs overrepresented, deterministic, top-k planned") {
    val s50 = graft.analytics.TextAnalysis.txWeightedSample(spark, Sf001)
    val rows = s50.collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 50L).toSeq)
    // weight = n_chars: the sample's mean length must exceed the corpus mean
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / 50
    val corpusMean = Tables.documents(spark, Sf001)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean * 1.1, s"sample $sampleMean corpus $corpusMean")
    // reproducible: same engine, fresh plan, identical sample
    val again = graft.analytics.TextAnalysis.txWeightedSample(spark, Sf001)
      .collect().map(_.toString).toSeq
    assert(again == rows.map(_.toString).toSeq)
    // the global cut is TakeOrderedAndProject, not a full sort
    assert(s50.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("epoch shuffle: a valid permutation, stable per seed, fresh per epoch") {
    val e0 = graft.analytics.TextAnalysis.txShuffle(spark, Sf001, "epoch0")
    val rows = e0.collect()
    assert(rows.length == 500)
    // (shard, pos) is a bijection: positions within each shard are 0..n-1
    rows.groupBy(_.getAs[Long]("shard")).values.foreach { g =>
      assert(g.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until g.length).toSeq)
    }
    // same seed → identical; different seed → a different permutation
    val again = graft.analytics.TextAnalysis.txShuffle(spark, Sf001, "epoch0")
      .collect().map(_.toString).sorted.toSeq
    assert(again == rows.map(_.toString).sorted.toSeq)
    val e1 = graft.analytics.TextAnalysis.txShuffle(spark, Sf001, "epoch1")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    val moved = rows.count(r => e1(r.getAs[Long]("doc_id")) !=
      (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
    assert(moved > 400, s"only $moved docs moved between epochs")
  }

  test("corpus mix: two-phase bucketed admission == naive per-language cumsum") {
    import graft.functions.TextFunctions.{hash60, tokens}
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val budget = 2000L
    val got = graft.analytics.TextAnalysis.corpusMix(spark, Sf001, budget)
    val rows = got.collect()
    assert(rows.forall(_.getAs[Long]("admit_offset") < budget))
    // every language here holds > budget tokens, so each is cut AND the
    // crossing doc is still admitted: admitted tokens land in
    // [budget, budget + max admitted doc)
    val perLang = got.groupBy("lang")
      .agg(sum("n_tokens").as("adm"), max("n_tokens").as("mx"))
      .collect()
    assert(perLang.length == 5)
    perLang.foreach { r =>
      val (adm, mx) = (r.getAs[Long]("adm"), r.getAs[Long]("mx"))
      assert(adm >= budget && adm < budget + mx, s"${r.getString(0)}: $adm")
    }
    // equivalence with the naive (whole-language window) formulation
    val docs = Tables.documents(spark, Sf001)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("h", hash60(col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h") % 256, col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("off") < budget)
      .select(col("doc_id"), col("off")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotMap = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("admit_offset")).toMap
    assert(gotMap == naive)
  }

  test("winnowPositions: equals brute-force rightmost-min over random streams") {
    // reference: per window, the rightmost index attaining the minimum
    def ref(h: Seq[Long], w: Int): Seq[Int] = {
      val n = h.length
      if (n == 0) Seq.empty
      else {
        val wlen = math.min(w, n)
        (0 to n - wlen).map { j =>
          val win = h.slice(j, j + wlen)
          j + win.lastIndexOf(win.min) + 1 // 1-based
        }.distinct
      }
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq.tabulate(60) { i =>
      val n = i % 12 match {
        case 0 => 0
        case 1 => 1
        case _ => rnd.nextInt(50) + 2
      }
      // tiny value range: duplicate-heavy streams stress the tiebreak
      val range = 1 + rnd.nextInt(6)
      (Seq.fill(n)(rnd.nextInt(range).toLong), 2 + rnd.nextInt(5))
    }
    cases.foreach { case (h, w) =>
      val got = Seq(Tuple1(h)).toDF("h")
        .select(TextFunctions.winnowPositions(col("h"), w)).as[Seq[Int]].head()
      assert(got == ref(h, w), s"h=$h w=$w")
    }
  }

  test("corpus_mix_temperature: exact isqrt budgets, naive-twin admission, sqrt flattening") {
    import org.apache.spark.sql.types.LongType
    val got = graft.analytics.TextAnalysis
      .corpusMixTemperature(spark, Sf0001).collect()
    val rows = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("lang"),
        size(TextFunctions.tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("h", TextFunctions.hash60(col("doc_id").cast("string")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mass = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val w = mass.view.mapValues(m => math.sqrt(m.toDouble).toLong).toMap
    val wsum = w.values.sum
    val budget = w.view.mapValues(x => 4000L * x / wsum).toMap
    got.groupBy(_.getAs[String]("lang")).foreach { case (l, g) =>
      assert(g.head.getAs[Long]("lang_budget") == budget(l), l)
      // admission rule: tokens BEFORE each admitted doc stay under budget
      assert(g.map(_.getAs[Long]("admit_offset")).max < budget(l), l)
    }
    // naive twin: one cumsum per language in (h % 256, h, id) order
    val naive = rows.groupBy(_._2).flatMap { case (l, ds) =>
      val sorted = ds.toSeq.sortBy { case (id, _, _, h) => (h % 256, h, id) }
      sorted.scanLeft(0L) { case (cum, (_, _, n, _)) => cum + n }
        .zip(sorted).collect { case (before, (id, _, _, _))
          if before < budget(l) => id }
    }.toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == naive)
    // α = 1/2 actually flattens: the heaviest language's budget share
    // never exceeds its mass share
    val top = mass.maxBy(_._2)._1
    assert(budget(top).toDouble / budget.values.sum <=
      mass(top).toDouble / mass.values.sum + 1e-12)
  }
}
