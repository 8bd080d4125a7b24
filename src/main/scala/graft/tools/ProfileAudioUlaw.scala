package graft.tools

import graft.operators.Multimodal

/** Dev tool: audio-fingerprint stability under LOSSY μ-law companding
  * — the measurement that sizes `dedup_audio_ulaw`'s survival band.
  * For a sweep of synthetic ids (base and planted variants), compare
  * the clip's fingerprint from the lossless WAV decode with the
  * fingerprint of the same clip after a real ULAW encode→decode
  * cycle, and report max/mean flipped-bit counts plus the worst
  * band-candidacy outcome. No Spark session: per-row codec math.
  */
object ProfileAudioUlaw {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    for (planted <- Seq(false, true)) {
      var maxH = 0
      var sumH = 0L
      var over4 = 0
      var noBand = 0
      var worst = -1L
      for (sid <- 0L until n.toLong) {
        if (!planted || sid % Multimodal.AudioPlantMod == Multimodal.AudioPlantRes) {
          val wav = Multimodal.audWavBytes(sid, planted)
          val base = Multimodal.audioFp60(Multimodal.decodeWavU8(wav))
          val comp = Multimodal.audioFp60(Multimodal.ulawRoundTripU8(wav))
          val x = base ^ comp
          val h = java.lang.Long.bitCount(x)
          if (h > maxH) { maxH = h; worst = sid }
          if (h > 4) over4 += 1
          if (!(0 until 4).exists(b => ((x >> (b * 15)) & 32767L) == 0L)) noBand += 1
          sumH += h
        }
      }
      val rows = if (planted) n / Multimodal.AudioPlantMod else n
      println(f"planted=$planted n=$rows maxHamming=$maxH worst_sid=$worst " +
        f"mean=${sumH.toDouble / rows}%.3f over4=$over4 noBand=$noBand")
    }
  }
}
