package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("typed mapPartitions decode path agrees with the column-expression twin") {
    import spark.implicits._
    val media = Tables.documents(spark, Sf0001)
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    val typed = Multimodal.decodeAll(media)
      .select("media_id", "byte_len", "content_hash", "width", "height", "mean_luma")
      .as[(Long, Long, String, Int, Int, Double)].collect().toMap2
    val cols = Multimodal.mmFeatures(spark, Sf0001)
      .as[(Long, Long, String, Int, Int, Double)].collect().toMap2
    assert(typed == cols)
  }

  test("decode stub is deterministic and metadata-shaped") {
    val f = Multimodal.decodeStub(MediaRow(7L, "image", "hello".getBytes("UTF-8")))
    val g = Multimodal.decodeStub(MediaRow(7L, "image", "hello".getBytes("UTF-8")))
    assert(f == g)
    assert(f.byte_len == 5 && f.width == 5 && f.height == 35)
    assert(f.mean_luma >= 0.0 && f.mean_luma <= 1.0)
  }

  private implicit class TupleOps(rows: Array[(Long, Long, String, Int, Int, Double)]) {
    def toMap2: Map[Long, (Long, String, Int, Int, Double)] =
      rows.map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap
  }
}
