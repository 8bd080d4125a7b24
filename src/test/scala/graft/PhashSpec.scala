package graft

import graft.dedup.Dedup
import graft.operators.Multimodal

/** Perceptual-hash image near-dup (r15 verdict #4): the dHash of a
  * really-PNG-round-tripped raster must equal the generating
  * arithmetic, planted retouches must sit inside the detector's
  * Hamming threshold, and the banded detector must find exactly the
  * pairs the arithmetic replay predicts.
  */
class PhashSpec extends SparkSpec {

  private def arithmeticFp(srcId: Long, planted: Boolean): Long = {
    val lv = (0 to 60).map(Multimodal.phashBlockLevel(srcId, _, planted))
    (0 until 60).foldLeft(0L)((fp, k) =>
      if (lv(k) > lv(k + 1)) fp | (1L << k) else fp)
  }

  test("dHash of the PNG round-tripped raster equals the generating arithmetic") {
    for (sid <- Seq(0L, 7L, 123L, 499L); pl <- Seq(false, true)) {
      val raster = Multimodal.phashRaster(sid, pl)
      assert(Multimodal.dhash60(raster) == arithmeticFp(sid, pl),
        s"raster dHash diverges from arithmetic for ($sid, $pl)")
    }
  }

  test("a planted 2-block retouch flips at most 4 bits and shares two full bands") {
    for (sid <- Seq(7L, 27L, 247L)) {
      val base = arithmeticFp(sid, planted = false)
      val re = arithmeticFp(sid, planted = true)
      val ham = java.lang.Long.bitCount(base ^ re)
      assert(ham <= 4, s"doc $sid retouch at hamming $ham > 4")
      // blocks 9 and 41 touch bits {8,9} and {40,41} only — bands 1
      // (bits 15-29) and 3 (bits 45-59) must be bit-identical, so band
      // candidacy is guaranteed
      assert((base >> 15 & 32767) == (re >> 15 & 32767))
      assert((base >> 45 & 32767) == (re >> 45 & 32767))
    }
  }

  test("JPEG recompression keeps every fingerprint inside the detector's reach") {
    import spark.implicits._
    val rows = Multimodal.mmPhashJpegSurvival(spark, Sf0001)
      .as[(Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2), "a recompressed copy left the Hamming threshold")
    assert(rows.forall(_._3), "a recompressed copy lost all four bands")
    // and the underlying distances are genuinely nonzero somewhere —
    // the audit must be exercising real lossy drift, not comparing a
    // fingerprint against itself through a secretly-lossless path
    val drift = (0L until 100L).map { sid =>
      val base = Multimodal.dhash60(Multimodal.phashRaster(sid, planted = false))
      val jf = Multimodal.dhash60(Multimodal.decodeJpegDirect(
        Multimodal.jpegBytesOf(Multimodal.phashRaster(sid, planted = false))))
      java.lang.Long.bitCount(base ^ jf)
    }
    assert(drift.exists(_ > 0), "JPEG path produced zero drift everywhere — lossless?")
    assert(drift.max <= 4)
  }

  test("incremental: every retouch dies against the fingerprint INDEX, never a re-decode") {
    import spark.implicits._
    val out = Dedup.dedupPhashIncremental(spark, Sf0001)
      .as[(Long, Long)].collect()
    val off = Multimodal.PhashPlantOffset
    // delivery 2 (the planted copies) must be fully deduplicated by
    // the cross-delivery index path: zero second-delivery survivors
    assert(!out.exists(_._2 == 2L),
      s"planted copies survived delivery 2: ${out.filter(_._2 == 2L).mkString(",")}")
    assert(out.forall(r => r._1 < off && r._2 == 1L))
    // delivery-1 survivors = bases minus within-delivery drops — and
    // the step's decisions must agree with the batch detector's pairs
    val fps = Multimodal.mmPhashFingerprints(spark, Sf0001)
    val baseDropped = Dedup.dedupPhashPairsDf(
        fps.filter($"media_id" < off))
      .select($"media_b").as[Long].collect().toSet
    val nBases = fps.filter($"media_id" < off).count()
    assert(out.length == nBases - baseDropped.size)
    assert(out.forall(r => !baseDropped.contains(r._1)))
    // replay idempotence: a batch whose own delta already landed must
    // not dedup against itself (the same-media_id exclusion)
    val d2 = fps.filter($"media_id" >= off)
    val (s2a, delta2) = Dedup.phashStepDelta(d2, Dedup.phashEmptyIndex(spark))
    val (s2b, _) = Dedup.phashStepDelta(d2, delta2)
    assert(s2a.select("media_id").as[Long].collect().sorted.toSeq ==
      s2b.select("media_id").as[Long].collect().sorted.toSeq,
      "replay against own delta changed decisions")
    graft.store.Checkpoints.free(spark)
  }

  test("durable phash commit: replay overwrites its own segments, decisions unchanged") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("phash_commit")
    val (out, idx) = (s"$root/out", s"$root/idx")
    val media = Multimodal.phashMediaCorpus(spark, Sf0001)
    val off = Multimodal.PhashPlantOffset
    Dedup.phashIncrementalCommit(media.filter($"media_id" < off), out, idx, 0)
    val kept0 = Dedup.readSegments(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq
    val idx0 = Dedup.readPhashIndex(spark, idx).count()
    // full replay of the SAME batchId (crash between index write and
    // checkpoint commit): both segments overwritten, nothing doubled
    Dedup.phashIncrementalCommit(media.filter($"media_id" < off), out, idx, 0)
    assert(Dedup.readSegments(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq == kept0)
    assert(Dedup.readPhashIndex(spark, idx).count() == idx0)
    // delivery 2 against the recovered index: every copy dies
    Dedup.phashIncrementalCommit(media.filter($"media_id" >= off), out, idx, 1)
    val all = Dedup.readSegments(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(all == kept0, "a planted copy survived the durable cross-delivery path")
  }

  test("cross-modal apply: media edges drop docs the text detectors keep") {
    import spark.implicits._
    val textOnly = Dedup.dedupApplyAll(spark, Sf0001)
      .select("doc_id").as[Long].collect().toSet
    val joint = Dedup.dedupApplyMultimodal(spark, Sf0001)
      .select("doc_id").as[Long].collect().toSet
    // the union graph can only grow components: the joint corpus is a
    // subset of the text-only corpus
    assert(joint.subsetOf(textOnly),
      s"joint apply kept docs text-only dropped: ${(joint -- textOnly).take(5)}")
    val extraDropped = textOnly -- joint
    assert(extraDropped.nonEmpty,
      "media edges dropped nothing — the cross-modal union is inert")
    // every extra drop is explained by a media edge of SOME modality:
    // the near-dup copy of doc d's image/clip/video is embedded by
    // doc d+1 / d+2 / d+3 respectively — so each extra-dropped doc is
    // a planted doc or its embedding successor
    extraDropped.foreach { d =>
      val img = (d % Multimodal.PhashPlantMod == Multimodal.PhashPlantRes) ||
        ((d - 1) % Multimodal.PhashPlantMod == Multimodal.PhashPlantRes)
      val aud = (d % Multimodal.AudioPlantMod == Multimodal.AudioPlantRes) ||
        ((d - 2) % Multimodal.AudioPlantMod == Multimodal.AudioPlantRes)
      val vid = (d % Multimodal.VideoPlantMod == Multimodal.VideoPlantRes) ||
        ((d - 3) % Multimodal.VideoPlantMod == Multimodal.VideoPlantRes)
      assert(img || aud || vid,
        s"doc $d dropped by the joint apply but touches no media edge")
    }
    graft.store.Checkpoints.free(spark)
  }

  test("detector finds every planted pair; apply drops exactly the dropped side") {
    import spark.implicits._
    val pairs = Dedup.dedupPhash(spark, Sf0001)
      .as[(Long, Long, Long)].collect()
    val plantedDocs = Tables.documents(spark, Sf0001)
      .selectExpr("doc_id").as[Long].collect()
      .filter(_ % Multimodal.PhashPlantMod == Multimodal.PhashPlantRes)
    assert(plantedDocs.nonEmpty)
    val found = pairs.map(p => (p._1, p._2)).toSet
    plantedDocs.foreach { d =>
      assert(found.contains((d, d + Multimodal.PhashPlantOffset)),
        s"planted pair for doc $d not detected")
    }
    assert(pairs.forall(_._3 <= 4))

    val applied = Dedup.dedupPhashApply(spark, Sf0001)
      .as[(Long, Long, Boolean, Boolean)].collect()
    val droppedExpected = pairs.map(_._2).toSet
    assert(applied.count(!_._4) == droppedExpected.size)
    applied.foreach { case (mid, _, _, kept) =>
      assert(kept == !droppedExpected.contains(mid),
        s"media $mid keep flag diverges from the pair report")
    }
    graft.store.Checkpoints.free(spark)
  }
}
