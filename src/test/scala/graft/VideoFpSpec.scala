package graft

import graft.dedup.Dedup
import graft.operators.Multimodal

/** Video near-dup via per-frame phash + frame vote (r16 verdict #4):
  * the dHash of a really-BMP-round-tripped frame must equal the
  * generating arithmetic, planted copies must vote exactly 2-of-3
  * (retouched frames in, the scene cut out), and the detector must
  * find exactly the pairs the arithmetic replay predicts.
  */
class VideoFpSpec extends SparkSpec {

  private def arithmeticFrameFp(srcId: Long, f: Int, planted: Boolean): Long = {
    val lv = (0 to 60).map(Multimodal.vidBlockLevel(srcId, f, _, planted))
    (0 until 60).foldLeft(0L)((fp, k) =>
      if (lv(k) > lv(k + 1)) fp | (1L << k) else fp)
  }

  test("frame dHash of the BMP round-tripped raster equals the generating arithmetic") {
    for (sid <- Seq(0L, 11L, 123L, 499L); f <- Seq(0, 2, 4); pl <- Seq(false, true)) {
      val clip = Multimodal.encodeVideoFp(sid, pl)
      val bytes = java.util.Arrays.copyOfRange(clip,
        f * Multimodal.BmpBytes, (f + 1) * Multimodal.BmpBytes)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      assert(Multimodal.dhash60(img) == arithmeticFrameFp(sid, f, pl),
        s"decoded frame dHash diverges from arithmetic for ($sid, f=$f, $pl)")
    }
  }

  test("planted copies: retouched frames within threshold, the cut frame far outside") {
    for (sid <- Seq(11L, 31L, 251L)) {
      for (f <- Seq(0, 2)) {
        val ham = java.lang.Long.bitCount(
          arithmeticFrameFp(sid, f, planted = false) ^
            arithmeticFrameFp(sid, f, planted = true))
        assert(ham <= 4, s"doc $sid frame $f retouch at hamming $ham > 4")
      }
      val cutHam = java.lang.Long.bitCount(
        arithmeticFrameFp(sid, 4, planted = false) ^
          arithmeticFrameFp(sid, 4, planted = true))
      assert(cutHam > 4, s"doc $sid scene cut landed at hamming $cutHam <= 4 — " +
        "the vote is not being exercised")
    }
  }

  test("JPEG recompression keeps every sampled frame inside the detector's reach") {
    import spark.implicits._
    val rows = Multimodal.mmVideoJpegSurvival(spark, Sf0001)
      .as[(Long, Int, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), "a recompressed frame left the Hamming threshold")
    assert(rows.forall(_._4), "a recompressed frame lost all four bands")
    // the drift is genuinely nonzero somewhere — real lossy cycles
    val drift = for (sid <- 0L until 100L; f <- Seq(0, 2, 4)) yield {
      val raster = Multimodal.vidFrameRaster(sid, f, planted = false)
      val base = Multimodal.dhash60(raster)
      val jf = Multimodal.dhash60(Multimodal.decodeJpegDirect(
        Multimodal.jpegBytesOf(raster)))
      java.lang.Long.bitCount(base ^ jf)
    }
    assert(drift.exists(_ > 0), "JPEG path produced zero drift everywhere — lossless?")
    assert(drift.max <= 4)
  }

  test("incremental: every copy dies by frame vote against the INDEX, never a re-decode") {
    import spark.implicits._
    val out = Dedup.dedupVideoIncremental(spark, Sf0001)
      .as[(Long, Long)].collect()
    val off = Multimodal.VideoPlantOffset
    assert(!out.exists(_._2 == 2L),
      s"planted copies survived delivery 2: ${out.filter(_._2 == 2L).mkString(",")}")
    assert(out.forall(r => r._1 < off && r._2 == 1L))
    // delivery-1 survivors agree with the batch detector's voted pairs
    val fps = Multimodal.mmVideoFingerprints(spark, Sf0001)
    val baseDropped = Dedup.dedupVideoPairsDf(
        fps.filter($"media_id" < off))
      .select($"media_b").as[Long].collect().toSet
    val nBases = fps.filter($"media_id" < off)
      .select("media_id").distinct().count()
    assert(out.length == nBases - baseDropped.size)
    assert(out.forall(r => !baseDropped.contains(r._1)))
    // replay idempotence: a batch whose own delta already landed must
    // not dedup against itself (the same-media_id exclusion)
    val d2 = fps.filter($"media_id" >= off)
    val (s2a, delta2) = Dedup.videoStepDelta(d2, Dedup.videoEmptyIndex(spark))
    val (s2b, _) = Dedup.videoStepDelta(d2, delta2)
    assert(s2a.select("media_id").distinct().as[Long].collect().sorted.toSeq ==
      s2b.select("media_id").distinct().as[Long].collect().sorted.toSeq,
      "replay against own delta changed decisions")
    graft.store.Checkpoints.free(spark)
  }

  test("durable video commit: replay overwrites its own segments, decisions unchanged") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("video_commit")
    val (out, idx) = (s"$root/out", s"$root/idx")
    val media = Multimodal.videoMediaCorpus(spark, Sf0001)
    val off = Multimodal.VideoPlantOffset
    Dedup.videoIncrementalCommit(media.filter($"media_id" < off), out, idx, 0)
    val kept0 = Dedup.readSegments(spark, out)
      .select("media_id").distinct().as[Long].collect().sorted.toSeq
    val idx0 = Dedup.readVideoIndex(spark, idx).count()
    Dedup.videoIncrementalCommit(media.filter($"media_id" < off), out, idx, 0)
    assert(Dedup.readSegments(spark, out)
      .select("media_id").distinct().as[Long].collect().sorted.toSeq == kept0)
    assert(Dedup.readVideoIndex(spark, idx).count() == idx0)
    Dedup.videoIncrementalCommit(media.filter($"media_id" >= off), out, idx, 1)
    val all = Dedup.readSegments(spark, out)
      .select("media_id").distinct().as[Long].collect().sorted.toSeq
    assert(all == kept0, "a planted copy survived the durable cross-delivery path")
  }

  test("detector finds every planted pair at vote 2-of-3; apply drops the copy") {
    import spark.implicits._
    val pairs = Dedup.dedupVideo(spark, Sf0001)
      .as[(Long, Long, Long)].collect()
    val plantedDocs = Tables.documents(spark, Sf0001)
      .selectExpr("doc_id").as[Long].collect()
      .filter(_ % Multimodal.VideoPlantMod == Multimodal.VideoPlantRes)
    assert(plantedDocs.nonEmpty)
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    plantedDocs.foreach { d =>
      val vote = byPair.get((d, d + Multimodal.VideoPlantOffset))
      assert(vote.contains(2L),
        s"planted pair for doc $d voted $vote, expected Some(2)")
    }
    assert(pairs.forall(_._3 >= Multimodal.VidMinVote))

    val applied = Dedup.dedupVideoApply(spark, Sf0001)
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
