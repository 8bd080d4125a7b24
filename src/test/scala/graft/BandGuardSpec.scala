package graft

import scala.util.Random

import graft.dedup.{BandGuard, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hot-band guard + exact pre-collapse (r17 verdict #1).
  *
  * Pins, in order:
  *  1. LOSSLESSNESS — the guarded pair generator emits EXACTLY the
  *     naive banded join's verified relation, on duplicate-heavy
  *     corpora, at the default cap AND with hotCap = 0 (every band
  *     forced through the 5×9 sub-split — the pigeonhole property
  *     exercised on every pair, including planted Hamming-4 pairs);
  *  2. the O(k) candidate pin — k exact copies of one asset generate
  *     ZERO rep-level band candidates (one representative), while the
  *     full pair OUTPUT is still the complete k·(k−1)/2 relation;
  *  3. the frame-keyed (video) variant of both;
  *  4. minhash collapse + cap semantics: the guarded detector equals
  *     the pre-r18 naive definition on a dup-heavy corpus, and with
  *     hotCap = 0 (every band dropped) emits ONLY the identical-text
  *     in-group pairs — the cap's loud, bounded failure mode;
  *  5. guarded incremental step: exact copies across deliveries die
  *     against the index, replay with the landed delta is idempotent.
  */
class BandGuardSpec extends SparkSpec {
  import spark.implicits._

  /** Random 60-bit fingerprints with planted duplicate groups and
    * near-dup (Hamming 1..4) satellites — satellites flip bits spread
    * across bands so some pairs share only a subset of bands.
    */
  private def fpCorpus(seed: Int, nBase: Int, dupGroups: Int,
      dupSize: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    def fp60() = rnd.nextLong() & ((1L << 60) - 1)
    val base = (0 until nBase).map(i => (i.toLong, fp60()))
    val dups = (0 until dupGroups).flatMap { g =>
      val src = base(rnd.nextInt(nBase))._2
      (0 until dupSize).map(j => (10000L + g * 100 + j, src))
    }
    val near = (0 until nBase / 2).map { i =>
      val src = base(rnd.nextInt(nBase))._2
      val flips = 1 + rnd.nextInt(4) // hamming 1..4
      val mutated = (0 until flips).foldLeft(src) { (f, _) =>
        f ^ (1L << rnd.nextInt(60))
      }
      (50000L + i, mutated)
    }
    base ++ dups ++ near
  }

  private def naivePairs(fps: DataFrame): Set[(Long, Long, Long)] =
    Dedup.bandedHammingPairs(
        graft.dedup.Dedup.bands60(fps.withColumnRenamed("fp", "f60"), "f60"),
        4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def guardedPairs(fps: DataFrame, hotCap: Int): Set[(Long, Long, Long)] =
    BandGuard.guardedHammingPairs(fps, "media_id", Nil, 4, hotCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("flat guarded pairs == naive banded join (default cap and hotCap=0)") {
    val fps = fpCorpus(seed = 7, nBase = 120, dupGroups = 6, dupSize = 5)
      .toDF("media_id", "fp")
    val expected = naivePairs(fps)
    assert(expected.nonEmpty, "corpus must plant verifiable pairs")
    assert(expected.exists(_._3 == 4), "corpus must plant Hamming-4 pairs")
    assert(guardedPairs(fps, BandGuard.HotBandCap) == expected)
    // hotCap = 0: EVERY band takes the sub-split path — the pigeonhole
    // losslessness exercised on every pair
    assert(guardedPairs(fps, 0) == expected)
  }

  test("k exact copies: zero rep-level candidates, complete pair output") {
    val k = 300
    val rnd = new Random(11)
    def fp60() = rnd.nextLong() & ((1L << 60) - 1)
    val distinctFps = (0 until 50).map(i => (i.toLong, fp60()))
    val copies = (0 until k).map(j => (1000L + j, distinctFps.head._2))
    val fps = (distinctFps.drop(1) ++ copies).toDF("media_id", "fp")
    // candidate work is O(reps²-bounded), not Θ(k²): 50 reps can pair
    // at most C(50,2) = 1225 times; the naive join would generate
    // ≥ C(300,2) = 44850 candidates from the copy group alone
    val cands = BandGuard.repCandidateCount(fps, "media_id", Nil)
    assert(cands <= 1225L, s"rep candidates exploded: $cands")
    // ...while the OUTPUT still carries every in-group pair
    val pairs = BandGuard.guardedHammingPairs(fps, "media_id", Nil, 4)
    val inGroup = pairs.filter(col("hamming") === 0).count()
    assert(inGroup >= k.toLong * (k - 1) / 2,
      s"in-group pairs incomplete: $inGroup")
    assert(pairs.count() == naivePairs(fps.select(col("media_id"), col("fp"))).size)
  }

  test("frame-keyed guarded pairs == naive frame-aligned join") {
    val rnd = new Random(23)
    def fp60() = rnd.nextLong() & ((1L << 60) - 1)
    val rows = (0 until 60).flatMap { m =>
      (0 until 3).map(f => (m.toLong, f, fp60()))
    } ++
      // planted: clip 100 duplicates clip 0 on frames 0,1 exactly
      Seq((100L, 0, 0L), (100L, 1, 0L)).map { case (m, f, _) =>
        (m, f, rnd.nextLong() & ((1L << 60) - 1))
      } ++
      // exact frame-level copies: five clips sharing one frame fp
      (0 until 5).map(j => (200L + j, 1, 0x123456789abcdL))
    val fps = rows.toDF("media_id", "frame_idx", "fp")
    val naive = {
      val bands = fps.select(col("media_id"), col("frame_idx"), col("fp"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("band_key",
          expr("shiftright(fp, band * 15)").bitwiseAND(lit(32767L)))
      bands.as("x").join(bands.as("y"),
          col("x.frame_idx") === col("y.frame_idx") &&
            col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("a"), col("y.media_id").as("b"),
          col("x.frame_idx").as("f"), col("x.fp").as("fa"), col("y.fp").as("fb"))
        .distinct()
        .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= 4)
        .select(col("a"), col("b"), col("f"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val guarded = BandGuard.guardedHammingPairs(
        fps, "media_id", Seq("frame_idx"), 4)
      .select(col("media_a"), col("media_b"), col("frame_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(naive.nonEmpty && guarded == naive)
    val guardedHot = BandGuard.guardedHammingPairs(
        fps, "media_id", Seq("frame_idx"), 4, hotCap = 0)
      .select(col("media_a"), col("media_b"), col("frame_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(guardedHot == naive)
  }

  test("minhash: collapse is exact; hotCap=0 degrades to in-group pairs only") {
    val rnd = new Random(31)
    val vocab = (0 until 30).map(i => s"w$i")
    def doc() = (0 until 50).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, doc()))
    val copies = (0 until 25).map(j => (1000L + j, base.head._2))
    val near = base.take(8).map { case (id, text) =>
      val toks = text.split(" "); toks(3) = "zz"
      (2000L + id, toks.mkString(" "))
    }
    val docs = (base ++ copies ++ near).toDF("doc_id", "text")
    // naive pre-r18 reference: signature/band join over ALL docs
    val naive = {
      import graft.functions.TextFunctions._
      val d = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), col("sh"),
          minhashSig(col("sh"), 16).as("sig"))
      val bands = d.select(col("doc_id"),
          explode(sequence(lit(0), lit(7))).as("band"), col("sig"))
        .withColumn("band_key", concat_ws("|",
          transform(slice(col("sig"), col("band") * 2 + 1, lit(2)),
            x => x.cast(org.apache.spark.sql.types.StringType))))
        .select(col("doc_id"), col("band"), col("band_key"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val guarded = Dedup.dedupMinhashLshDf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty && guarded == naive)
    // hotCap = 0 drops EVERY band: candidate generation is silenced and
    // only the collapse's in-group (identical text) pairs remain — the
    // cap's failure mode is bounded and visible, never a wrong pair
    val capped = Dedup.dedupMinhashLshDf(docs, hotCap = 0)
    val cappedPairs = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val copyIds = (copies.map(_._1) :+ base.head._1).toSet
    assert(cappedPairs.nonEmpty &&
      cappedPairs.forall { case (a, b) => copyIds(a) && copyIds(b) })
    assert(capped.filter(col("jaccard") =!= 1.0).count() == 0)
  }

  test("guarded incremental step: cross-delivery kill + replay idempotence") {
    val rnd = new Random(43)
    def fp60() = rnd.nextLong() & ((1L << 60) - 1)
    val baseFp = fp60()
    val d1 = ((0 until 30).map(i => (i.toLong, fp60())) :+ (900L, baseFp))
      .toDF("media_id", "phash60")
    val d2 = (Seq((1000L, baseFp), (1001L, baseFp), (1002L, baseFp ^ 1L)) ++
      (0 until 10).map(i => (1100L + i.toLong, fp60())))
      .toDF("media_id", "phash60")
    val (s1, delta1) = Dedup.phashStepDelta(d1, Dedup.phashEmptyIndex(spark))
    assert(s1.count() == 31) // distinct fps, nothing dies in delivery 1
    val (s2, delta2) = Dedup.phashStepDelta(d2, delta1)
    val surv2 = s2.select("media_id").as[Long].collect().toSet
    // 1000/1001 are exact copies of the INDEXED 900; 1002 is hamming-1
    assert(!surv2(1000L) && !surv2(1001L) && !surv2(1002L))
    assert(surv2.size == 10)
    // replay: delivery 2 against index that already holds its own delta
    val (s2r, _) = Dedup.phashStepDelta(d2, delta1.unionByName(delta2))
    assert(s2r.select("media_id").as[Long].collect().toSet == surv2)
  }
}
