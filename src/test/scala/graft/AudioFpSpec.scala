package graft

import graft.dedup.Dedup
import graft.operators.Multimodal

/** Audio-fingerprint near-dup (r16 verdict #3): the energy-delta
  * fingerprint of a really-WAV-round-tripped clip must equal the
  * generating arithmetic, planted edits must sit inside the detector's
  * Hamming threshold with guaranteed band candidacy, the banded
  * detector must find exactly the pairs the arithmetic replay
  * predicts, and the μ-law companding audit must show REAL but
  * in-threshold lossy drift.
  */
class AudioFpSpec extends SparkSpec {

  private def arithmeticFp(srcId: Long, planted: Boolean): Long = {
    val lv = (0 until Multimodal.AudWindows)
      .map(Multimodal.audWindowLevel(srcId, _, planted))
    (0 until 60).foldLeft(0L)((fp, w) =>
      if (lv(w) > lv(w + 1)) fp | (1L << w) else fp)
  }

  test("fingerprint of the WAV round-tripped clip equals the generating arithmetic") {
    for (sid <- Seq(0L, 3L, 123L, 499L); pl <- Seq(false, true)) {
      val fp = Multimodal.audioFp60(
        Multimodal.decodeWavU8(Multimodal.audWavBytes(sid, pl)))
      assert(fp == arithmeticFp(sid, pl),
        s"decoded fingerprint diverges from arithmetic for ($sid, $pl)")
    }
  }

  test("a planted 2-window edit flips at most 4 bits and shares two full bands") {
    for (sid <- Seq(3L, 23L, 243L)) {
      val base = arithmeticFp(sid, planted = false)
      val ed = arithmeticFp(sid, planted = true)
      assert(java.lang.Long.bitCount(base ^ ed) <= 4,
        s"doc $sid edit flipped more than 4 bits")
      // windows 13 and 47 touch bits {12,13} and {46,47} only — bands
      // 1 (bits 15-29) and 2 (bits 30-44) must be bit-identical, so
      // band candidacy is guaranteed
      assert((base >> 15 & 32767) == (ed >> 15 & 32767))
      assert((base >> 30 & 32767) == (ed >> 30 & 32767))
    }
  }

  test("mu-law companding keeps every fingerprint inside the detector's reach") {
    import spark.implicits._
    val rows = Multimodal.mmAudioUlawSurvival(spark, Sf0001)
      .as[(Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2), "a companded copy left the Hamming threshold")
    assert(rows.forall(_._3), "a companded copy lost all four bands")
    // and the drift is genuinely nonzero somewhere — the audit must be
    // exercising real lossy quantization, not comparing a fingerprint
    // against itself through a secretly-lossless path
    val drift = (0L until 500L).map { sid =>
      val wav = Multimodal.audWavBytes(sid, planted = false)
      val base = Multimodal.audioFp60(Multimodal.decodeWavU8(wav))
      val comp = Multimodal.audioFp60(Multimodal.ulawRoundTripU8(wav))
      java.lang.Long.bitCount(base ^ comp)
    }
    assert(drift.exists(_ > 0), "mu-law path produced zero drift everywhere — lossless?")
    assert(drift.max <= 4)
  }

  test("incremental: every edited copy dies against the fingerprint INDEX, never a re-decode") {
    import spark.implicits._
    val out = Dedup.dedupAudioIncremental(spark, Sf0001)
      .as[(Long, Long)].collect()
    val off = Multimodal.AudioPlantOffset
    // delivery 2 (the planted copies) must be fully deduplicated by
    // the cross-delivery index path: zero second-delivery survivors
    assert(!out.exists(_._2 == 2L),
      s"planted copies survived delivery 2: ${out.filter(_._2 == 2L).mkString(",")}")
    assert(out.forall(r => r._1 < off && r._2 == 1L))
    // delivery-1 survivors agree with the batch detector's pairs
    val fps = Multimodal.mmAudioFingerprints(spark, Sf0001)
    val baseDropped = Dedup.dedupAudioPairsDf(
        fps.filter($"media_id" < off))
      .select($"media_b").as[Long].collect().toSet
    val nBases = fps.filter($"media_id" < off).count()
    assert(out.length == nBases - baseDropped.size)
    assert(out.forall(r => !baseDropped.contains(r._1)))
    // replay idempotence: a batch whose own delta already landed must
    // not dedup against itself (the same-media_id exclusion)
    val d2 = fps.filter($"media_id" >= off)
    val (s2a, delta2) = Dedup.audioStepDelta(d2, Dedup.phashEmptyIndex(spark))
    val (s2b, _) = Dedup.audioStepDelta(d2, delta2)
    assert(s2a.select("media_id").as[Long].collect().sorted.toSeq ==
      s2b.select("media_id").as[Long].collect().sorted.toSeq,
      "replay against own delta changed decisions")
    graft.store.Checkpoints.free(spark)
  }

  test("durable audio commit: replay overwrites its own segments, decisions unchanged") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("audio_commit")
    val (out, idx) = (s"$root/out", s"$root/idx")
    val media = Multimodal.audioMediaCorpus(spark, Sf0001)
    val off = Multimodal.AudioPlantOffset
    Dedup.audioIncrementalCommit(media.filter($"media_id" < off), out, idx, 0)
    val kept0 = Dedup.readSegments(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq
    val idx0 = Dedup.readPhashIndex(spark, idx).count()
    Dedup.audioIncrementalCommit(media.filter($"media_id" < off), out, idx, 0)
    assert(Dedup.readSegments(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq == kept0)
    assert(Dedup.readPhashIndex(spark, idx).count() == idx0)
    Dedup.audioIncrementalCommit(media.filter($"media_id" >= off), out, idx, 1)
    val all = Dedup.readSegments(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(all == kept0, "a planted copy survived the durable cross-delivery path")
  }

  test("detector finds every planted pair; apply drops exactly the dropped side") {
    import spark.implicits._
    val pairs = Dedup.dedupAudio(spark, Sf0001)
      .as[(Long, Long, Long)].collect()
    val plantedDocs = Tables.documents(spark, Sf0001)
      .selectExpr("doc_id").as[Long].collect()
      .filter(_ % Multimodal.AudioPlantMod == Multimodal.AudioPlantRes)
    assert(plantedDocs.nonEmpty)
    val found = pairs.map(p => (p._1, p._2)).toSet
    plantedDocs.foreach { d =>
      assert(found.contains((d, d + Multimodal.AudioPlantOffset)),
        s"planted pair for doc $d not detected")
    }
    assert(pairs.forall(_._3 <= 4))

    val applied = Dedup.dedupAudioApply(spark, Sf0001)
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
