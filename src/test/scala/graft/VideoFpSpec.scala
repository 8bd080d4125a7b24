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
