package graft.tools

import graft.operators.Multimodal

/** Dev tool: per-frame dHash stability under LOSSY JPEG recompression
  * of the VIDEO fixture rasters — sizes `dedup_video_jpeg`'s survival
  * band (the phash profiling doesn't transfer: the video frames hash
  * from their own salts, so these exact rasters must be measured).
  * Sweeps every sampled frame of every producible id, base and
  * planted, reporting max/mean flipped bits and band-candidacy.
  */
object ProfileVideoJpeg {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    for (q <- Seq(0.9f)) {
      var maxH = 0
      var sumH = 0L
      var frames = 0L
      var over4 = 0
      var noBand = 0
      var worst = (-1L, -1)
      for (sid <- 0L until n.toLong; pl <- Seq(false, true)) {
        if (!pl || sid % Multimodal.VideoPlantMod == Multimodal.VideoPlantRes) {
          for (f <- 0 until Multimodal.VidFrames by Multimodal.VidStride) {
            val raster = Multimodal.vidFrameRaster(sid, f, pl)
            val base = Multimodal.dhash60(raster)
            val jf = Multimodal.dhash60(
              Multimodal.decodeJpegDirect(Multimodal.jpegBytesOf(raster, q)))
            val x = base ^ jf
            val h = java.lang.Long.bitCount(x)
            if (h > maxH) { maxH = h; worst = (sid, f) }
            if (h > 4) over4 += 1
            if (!(0 until 4).exists(b => ((x >> (b * 15)) & 32767L) == 0L))
              noBand += 1
            sumH += h
            frames += 1
          }
        }
      }
      println(f"q=$q%.2f frames=$frames maxHamming=$maxH worst=$worst " +
        f"mean=${sumH.toDouble / frames}%.3f over4=$over4 noBand=$noBand")
    }
  }
}
