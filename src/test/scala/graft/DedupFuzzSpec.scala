package graft

import scala.util.Random

import graft.dedup.Dedup
import org.apache.spark.sql.functions.col

/** Seeded randomized differential tests for the document-dedup family —
  * beyond the hand-planted spec cases, random corpora with mutated
  * copies checked against brute-force Scala reference computations.
  * Seeds are fixed: failures reproduce.
  *
  * What each property pins:
  *  - minhash LSH pairs == the brute-force exact-Jaccard pair set
  *    (precision is exact by construction — candidates are re-verified
  *    with true Jaccard — so the property under test is banded-index
  *    RECALL; planted pairs sit at j ≥ 0.7 where the 8×2-band S-curve
  *    admits ≥ 99.7%, and the fixed seeds make the runs deterministic);
  *  - connected-component clustering == a plain union-find over the
  *    same pair graph, canonical = component min;
  *  - the apply invariant: after keep-canonical removal, re-running the
  *    detector finds NOTHING (the corpus is actually deduplicated).
  */
class DedupFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def genCorpus(seed: Int, nBase: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 40).map(i => s"w$i")
    val base = (0 until nBase).map { i =>
      val len = 40 + rnd.nextInt(40)
      (i.toLong,
        (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val planted = base.take(nBase / 4).map { case (id, text) =>
      val toks = text.split(" ")
      val muts = 1 + rnd.nextInt(2)
      (0 until muts).foreach(_ =>
        toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length)))
      (id + 1000L, toks.mkString(" "))
    }
    base ++ planted
  }

  private def shingleSet(text: String): Set[String] = {
    val t = text.split("\\s+").filter(_.nonEmpty)
    (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
  }

  private def truePairs(corpus: Seq[(Long, String)],
      tau: Double): Set[(Long, Long)] = {
    val sets = corpus.map { case (id, tx) => id -> shingleSet(tx) }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      if (sa & sb).size.toDouble / (sa | sb).size >= tau
    } yield (a, b)).toSet
  }

  test("minhash LSH == brute-force pair set across seeds") {
    for (seed <- Seq(1, 2, 3)) {
      val corpus = genCorpus(seed, 60)
      val got = Dedup.dedupMinhashLshDf(corpus.toDF("doc_id", "text"))
        .select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = truePairs(corpus, 0.5)
      assert(got == want,
        s"seed $seed: extra=${got -- want} missed=${want -- got}")
      assert(want.nonEmpty, s"seed $seed: degenerate corpus, nothing planted")
    }
  }

  test("clustering == union-find over the same pair graph") {
    val corpus = genCorpus(7, 60)
    val pairs = Dedup.dedupMinhashLshDf(corpus.toDF("doc_id", "text"))
      .select(col("doc_a"), col("doc_b")).persist()
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // plain union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val wantRep = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    val gotRep = Dedup.dedupClustersDf(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.unpersist()
    assert(gotRep == wantRep)
  }

  test("directed containment == brute force on planted excerpts") {
    for (seed <- Seq(5, 6)) {
      val rnd = new Random(seed)
      val vocab = (0 until 60).map(i => s"v$i")
      val base = (0 until 40).map { i =>
        val len = 60 + rnd.nextInt(40)
        (i.toLong,
          (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      // planted excerpts: contiguous slices of containers (containment
      // = 1.0 up to boundary shingles) + a few sub-threshold slices
      val excerpts = base.take(10).map { case (id, text) =>
        val toks = text.split(" ")
        val from = rnd.nextInt(toks.length / 2)
        val len = 15 + rnd.nextInt(15)
        (id + 500L, toks.slice(from, from + len).mkString(" "))
      }
      val corpus = base ++ excerpts
      // brute-force directed containment over distinct 3-gram shingles
      val sets = corpus.map { case (id, tx) => id -> shingleSet(tx) }.toMap
      val want = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
        c = (sa & sb).size.toDouble / sa.size if c >= 0.8
      } yield (a, b)).toSet // (contained, container)
      val (directed, cleanup) = Dedup.containmentDirectedDf(
        corpus.toDF("doc_id", "text"), maxDf = 10000)
      val got = directed.filter(col("containment") >= 0.8)
        .select(col("contained_id"), col("container_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      cleanup()
      assert(got == want,
        s"seed $seed: extra=${got -- want} missed=${want -- got}")
      assert(want.nonEmpty, s"seed $seed: degenerate plant")
    }
  }

  test("simhash banding == brute force over the same fingerprints") {
    // contract: pairs at hamming <= 4 that share at least one identical
    // 15-bit band — banding can only miss pairs whose >0 differing bits
    // spread across ALL bands, and the reference models that exactly
    for (seed <- Seq(8, 9)) {
      val rnd = new Random(seed)
      val vocab = (0 until 50).map(i => s"s$i")
      val base = (0 until 50).map { i =>
        val len = 40 + rnd.nextInt(40)
        (i.toLong,
          (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val copies = base.take(8).map { case (id, t) => (id + 500L, t) } // hamming 0
      val nearby = base.slice(8, 20).map { case (id, text) =>
        val toks = text.split(" ")
        toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
        (id + 500L, toks.mkString(" "))
      }
      val corpus = base ++ copies ++ nearby
      val df = corpus.toDF("doc_id", "text").persist()
      val fps = df.select(col("doc_id"),
          graft.functions.TextFunctions.simhash60(
            graft.functions.TextFunctions.tokens(col("text"))).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      def bandsOf(fp: Long): Seq[Long] =
        (0 until 4).map(b => (fp >> (b * 15)) & 32767L)
      val want = (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        if java.lang.Long.bitCount(fa ^ fb) <= 4
        if bandsOf(fa).zip(bandsOf(fb)).exists(p => p._1 == p._2)
      } yield (a, b)).toSet
      val got = Dedup.dedupSimhashDf(df)
        .select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      df.unpersist()
      assert(got == want,
        s"seed $seed: extra=${got -- want} missed=${want -- got}")
      assert(want.nonEmpty, s"seed $seed: degenerate plant")
    }
  }

  // reference winnow fingerprint set: positional 5-gram hash60s, each
  // w-window's rightmost minimum, distinct selected hashes
  private def refWinnowPrints(text: String, k: Int, w: Int): Set[Long] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) Set.empty
    else {
      val h = (0 to toks.length - k)
        .map(i => graft.functions.TextHash.hash60(toks.slice(i, i + k).mkString(" ")))
      val n = h.length
      val wlen = math.min(w, n)
      (0 to n - wlen).map { j =>
        val win = h.slice(j, j + wlen)
        h(j + win.lastIndexOf(win.min))
      }.toSet
    }
  }

  test("dedup_winnow fuzz: equals the brute-force winnow pair report") {
    for (seed <- 1 to 4) {
      val corpus = genCorpus(300 + seed, 24)
      val got = Dedup.dedupWinnowDf(corpus.toDF("doc_id", "text"), 5, 4, 64)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val prints = corpus.map { case (id, t) => id -> refWinnowPrints(t, 5, 4) }
      val dfc = prints.flatMap(_._2).groupBy(identity).map { case (g, v) => g -> v.size }
      val hot = dfc.collect { case (g, c) if c >= 2 && c <= 64 => g }.toSet
      val want = (for {
        (a, pa) <- prints
        (b, pb) <- prints if a < b
        shared = (pa intersect pb intersect hot).size if shared >= 1
      } yield (a, b) -> shared.toLong).toMap
      assert(got == want, s"seed=$seed")
      assert(want.nonEmpty, s"seed=$seed: degenerate plant")
    }
  }

  test("dedup_winnow: maxDf drops ubiquitous fingerprints; small groups pair fully") {
    // 70 byte-identical docs: every selected hash has df = 70 > 64, so
    // the boilerplate discipline yields ZERO pairs instead of 70·69/2
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val many = (0 until 70).map(i => (i.toLong, boiler))
    assert(Dedup.dedupWinnowDf(many.toDF("doc_id", "text"), 5, 4, 64).count() == 0)
    // the same text in 3 docs sits under the cap: all 3 pairs, and the
    // shared mass is the doc's full fingerprint set
    val got = Dedup.dedupWinnowDf(many.take(3).toDF("doc_id", "text"), 5, 4, 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val full = refWinnowPrints(boiler, 5, 4).size.toLong
    assert(got == Map((0L, 1L) -> full, (0L, 2L) -> full, (1L, 2L) -> full))
  }

  /** Brute-force exact-substring pair report (string grams, not
    * hashes — hash equality == string equality modulo 2^60 collisions,
    * which these corpora cannot reach): df-capped grams, matched
    * positions, diagonal islands, run = island + k − 1.
    */
  private def refExactRuns(corpus: Seq[(Long, String)], k: Int,
      maxDf: Int, minRun: Int): Map[(Long, Long), (Long, Long)] = {
    val grams = corpus.map { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      id -> (0 to toks.length - k).map(i => i -> toks.slice(i, i + k).mkString(" "))
    }
    val ddocs = grams.flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, v) => g -> v.size }
    val occ = grams.flatMap(_._2.map(_._2))
      .groupBy(identity).map { case (g, v) => g -> v.size }
    val keep = occ.keys.filter(g => ddocs(g) >= 2 && occ(g) <= maxDf).toSet
    val byDoc = grams.map { case (id, gs) => id -> gs.filter(p => keep(p._2)) }
    val rows = for {
      (a, ga) <- byDoc
      (b, gb) <- byDoc if a < b
      pairs = for { (pa, s1) <- ga; (pb, s2) <- gb if s1 == s2 } yield (pa, pb)
      if pairs.nonEmpty
    } yield {
      val runs = pairs.groupBy { case (pa, pb) => pa - pb }.values.flatMap { diag =>
        val pas = diag.map(_._1).sorted
        val islands = pas.foldLeft(List.empty[List[Int]]) {
          case (Nil, p) => List(List(p))
          case (h :: t, p) if p == h.head + 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
        islands.map(_.size + k - 1)
      }.toSeq
      (a, b) -> (runs.max.toLong, runs.count(_ >= minRun).toLong)
    }
    rows.filter(_._2._1 >= minRun).toMap
  }

  test("dedup_exact_runs: planted verbatim run reports its exact extent") {
    val run = (1 to 20).map(i => s"r$i").mkString(" ")
    val a = "x1 x2 x3 " + run + " y1 y2"
    val b = "z1 " + run + " q1 q2 q3"
    val got = Dedup.dedupExactRunsDf(Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
        8, 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // the shared extent is EXACTLY the 20 planted tokens, one run
    assert(got == Map((1L, 2L) -> (20L, 1L)))
    // a 12-token shared run sits below minRun=16 → no row
    val short = (1 to 12).map(i => s"s$i").mkString(" ")
    assert(Dedup.dedupExactRunsDf(
      Seq((1L, "x1 x2 " + short), (2L, short + " q1 q2"))
        .toDF("doc_id", "text"), 8, 64, 16).count() == 0)
  }

  test("dedup_exact_runs: maxDf splits ubiquitous grams; small groups pair fully") {
    // 70 byte-identical 20-token docs: every gram's df = 70 > 64 → the
    // stop-gram discipline yields ZERO pairs instead of 70·69/2
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val many = (0 until 70).map(i => (i.toLong, text))
    assert(Dedup.dedupExactRunsDf(many.toDF("doc_id", "text"), 8, 64, 16)
      .count() == 0)
    // 3 identical docs sit under the cap: all 3 pairs at the full
    // 20-token extent, one run each
    val got = Dedup.dedupExactRunsDf(many.take(3).toDF("doc_id", "text"),
        8, 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map((0L, 1L) -> (20L, 1L), (0L, 2L) -> (20L, 1L),
      (1L, 2L) -> (20L, 1L)))
  }

  test("dedup_exact_runs: occurrence cap bounds repetitive-doc fan-out") {
    // two docs sharing a MODERATE repeated-token run: "p"×30 per doc →
    // the single 8-gram occurs 23×2 = 46 ≤ 64 times and stays indexed.
    // A repeated-token region matches at EVERY alignment: diagonal d
    // carries a run of 30−|d| tokens, so max = 30 (d = 0) and 29
    // diagonals clear minRun=16 (|d| ≤ 14) — n_runs counts alignments,
    // not distinct regions, for self-similar content
    def rep(n: Int) = Seq.fill(n)("p").mkString(" ")
    val small = Seq((1L, rep(30)), (2L, rep(30))).toDF("doc_id", "text")
    val got = Dedup.dedupExactRunsDf(small, 8, 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map((1L, 2L) -> (30L, 29L)))
    // "p"×100 per doc: occ = 93×2 = 186 > 64 → the gram is CAPPED and
    // the pair vanishes — the bounded-join tradeoff, pinned (a
    // distinct-doc-only cap would admit df=2 and emit 93² matched
    // positions for one gram)
    val big = Seq((1L, rep(100)), (2L, rep(100))).toDF("doc_id", "text")
    assert(Dedup.dedupExactRunsDf(big, 8, 64, 16).count() == 0)
    assert(Dedup.dedupExactRunsApplyDf(big, 8, 64, 16)
      .agg(org.apache.spark.sql.functions.sum($"n_before" - $"n_after"))
      .head().getLong(0) == 0L)
  }

  test("dedup_exact_runs fuzz: equals the brute-force diagonal-island report") {
    for (seed <- 1 to 4) {
      val corpus = genCorpus(500 + seed, 24)
      val got = Dedup.dedupExactRunsDf(corpus.toDF("doc_id", "text"), 8, 64, 16)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val want = refExactRuns(corpus, 8, 64, 16)
      assert(got == want, s"seed=$seed")
      assert(want.nonEmpty, s"seed=$seed: degenerate plant")
    }
  }

  /** Brute-force keep-first rewrite: per pair, diagonal islands ≥
    * minRun give cut spans in the HIGHER doc; spans union-merge per
    * doc; rewrite drops covered positions.
    */
  private def refExactRunsApply(corpus: Seq[(Long, String)], k: Int,
      maxDf: Int, minRun: Int): Map[Long, (Long, Long, String)] = {
    val toksByDoc = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val grams = corpus.map { case (id, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      id -> (0 to toks.length - k).map(i => i -> toks.slice(i, i + k).mkString(" "))
    }
    val ddocs = grams.flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, v) => g -> v.size }
    val occ = grams.flatMap(_._2.map(_._2))
      .groupBy(identity).map { case (g, v) => g -> v.size }
    val keep = occ.keys.filter(g => ddocs(g) >= 2 && occ(g) <= maxDf).toSet
    val byDoc = grams.map { case (id, gs) => id -> gs.filter(p => keep(p._2)) }
    val spans0 = (for {
      (a, ga) <- byDoc
      (b, gb) <- byDoc if a < b
      pairs = for { (pa, s1) <- ga; (pb, s2) <- gb if s1 == s2 } yield (pa, pb)
      (_, diag) <- pairs.groupBy { case (pa, pb) => pa - pb }
      island <- {
        val sorted = diag.sortBy(_._1)
        sorted.foldLeft(List.empty[List[(Int, Int)]]) {
          case (Nil, p) => List(List(p))
          case (h :: t, p) if p._1 == h.head._1 + 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
      } if island.size + k - 1 >= minRun
    } yield {
      val pbs = island.map(_._2)
      (b, pbs.min, pbs.max + k)
    }).distinct
    val mergedByDoc = spans0.groupBy(_._1).map { case (id, sp) =>
      val sorted = sp.map(p => (p._2, p._3)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, (s, e)) => List((s, e))
        case ((ms, me) :: t, (s, e)) if s < me => (ms, math.max(me, e)) :: t
        case (acc, (s, e)) => (s, e) :: acc
      }.reverse
      id -> merged
    }
    toksByDoc.map { case (id, toks) =>
      val cuts = mergedByDoc.getOrElse(id, Nil)
      val kept = toks.zipWithIndex.collect {
        case (tk, i) if !cuts.exists(c => i >= c._1 && i < c._2) => tk
      }
      id -> (toks.length.toLong, kept.length.toLong, kept.mkString(" "))
    }
  }

  test("dedup_exact_runs_apply: keep-first cuts exactly the planted run") {
    val run = (1 to 20).map(i => s"r$i").mkString(" ")
    val a = "x1 x2 x3 " + run + " y1 y2"
    val b = "z1 " + run + " q1 q2 q3"
    val got = Dedup.dedupExactRunsApplyDf(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"), 8, 64, 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 (lower id) keeps its copy untouched; doc 2 loses exactly
    // the 20 planted tokens
    assert(got(1L) == (25L, 25L, a))
    assert(got(2L) == (24L, 4L, "z1 q1 q2 q3"))
  }

  test("dedup_exact_runs_apply: identical docs collapse to one surviving copy") {
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val three = (0 until 3).map(i => (i.toLong, text))
    val got = Dedup.dedupExactRunsApplyDf(three.toDF("doc_id", "text"), 8, 64, 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(0L) == (20L, 20L, text))
    assert(got(1L) == (20L, 0L, ""))
    assert(got(2L) == (20L, 0L, ""))
  }

  test("dedup_exact_runs_apply fuzz: equals the brute-force keep-first rewrite") {
    for (seed <- 1 to 4) {
      val corpus = genCorpus(700 + seed, 24)
      val got = Dedup.dedupExactRunsApplyDf(corpus.toDF("doc_id", "text"),
          8, 64, 16)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      val want = refExactRunsApply(corpus, 8, 64, 16)
      assert(got == want, s"seed=$seed")
      assert(want.exists(kv => kv._2._2 < kv._2._1),
        s"seed=$seed: degenerate plant — nothing was cut")
    }
  }

  test("apply invariant: the deduplicated corpus has no remaining pair") {
    val corpus = genCorpus(11, 60)
    val df = corpus.toDF("doc_id", "text").persist()
    val pairs = Dedup.dedupMinhashLshDf(df)
      .select(col("doc_a"), col("doc_b")).persist()
    val dropNear = Dedup.dedupClustersDf(pairs)
      .filter(!col("is_canonical")).select(col("doc_id"))
    val applied = df.join(dropNear, Seq("doc_id"), "left_anti").persist()
    assert(Dedup.dedupMinhashLshDf(applied).count() == 0)
    assert(applied.count() > 0)
    df.unpersist(); pairs.unpersist(); applied.unpersist()
  }
}
