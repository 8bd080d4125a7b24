package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._

/** The real-decoder multimodal path: ImageIO must parse the handwritten
  * BMPs, the raster features must equal the generating arithmetic, and
  * undecodable payloads must fail loudly (dead-letterable), not decode
  * to garbage.
  */
class MultimodalSpec extends SparkSpec {

  test("ImageIO round-trip: decoded raster equals the generating arithmetic") {
    val row = MediaRow(7L, "image/bmp", Multimodal.encodeBmp(7L, 123L))
    val f = Multimodal.decodeImage(row)
    assert(f.width == 16 && f.height == 16)
    assert(f.byte_len == Multimodal.BmpBytes)
    val expectedSum = (0 until 256).map(i => (i * 37 + 7L * 11 + 123L) % 256).sum
    assert(f.mean_luma == expectedSum.toDouble / (255.0 * 256))
    // deterministic
    assert(Multimodal.decodeImage(row) == f)
  }

  test("mm_features: full pipeline over documents, distributed decode") {
    import spark.implicits._
    val rows = Multimodal.mmFeatures(spark, Sf0001)
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, len, w, h, luma) =>
      len == Multimodal.BmpBytes && w == 16 && h == 16 &&
        luma >= 0.0 && luma <= 1.0
    })
    // spot-check one row against the arithmetic, computed independently
    val (docId, textLen) = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].head()
    val expected = (0 until 256).map(i => (i * 37 + docId * 11 + textLen) % 256)
      .sum.toDouble / (255.0 * 256)
    val got = rows.toMap2(docId)._4
    assert(got == expected, s"doc $docId: got $got expected $expected")
  }

  test("undecodable payload fails loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(MediaRow(1L, "image/bmp", "not an image".getBytes))
    }
  }

  private implicit class TupleOps(rows: Array[(Long, Long, Int, Int, Double)]) {
    def toMap2: Map[Long, (Long, Int, Int, Double)] =
      rows.map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
  }
}
