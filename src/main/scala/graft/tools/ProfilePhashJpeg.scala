package graft.tools

import graft.operators.Multimodal

/** Dev tool: dHash stability under LOSSY JPEG recompression — the
  * measurement that sizes `dedup_phash_jpeg`'s survival band. For a
  * sweep of synthetic ids, compare the phash-fixture raster's dHash
  * with the dHash of the same raster after a real JPEG
  * encode(quality)→decode cycle, and report the max/mean flipped-bit
  * counts. No Spark session: the quantity is per-row codec math.
  */
object ProfilePhashJpeg {
  def main(args: Array[String]): Unit = {
    javax.imageio.ImageIO.setUseCache(false)
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    for (q <- Seq(0.85f, 0.9f, 0.95f)) {
      var maxH = 0
      var sumH = 0L
      var over4 = 0
      var worst = -1L
      for (sid <- 0L until n.toLong) {
        val base = Multimodal.dhash60(Multimodal.phashRaster(sid, planted = false))
        val jf = Multimodal.dhash60(
          Multimodal.decodeJpegDirect(
            Multimodal.jpegBytesOf(Multimodal.phashRaster(sid, planted = false), q)))
        val h = java.lang.Long.bitCount(base ^ jf)
        if (h > maxH) { maxH = h; worst = sid }
        if (h > 4) over4 += 1
        sumH += h
      }
      println(f"q=$q%.2f n=$n maxHamming=$maxH worst_sid=$worst " +
        f"mean=${sumH.toDouble / n}%.2f over4=$over4")
    }
  }
}
