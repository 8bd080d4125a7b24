package graft.operators

import graft.Tables
import graft.functions.TextFunctions.hash60
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators (north-star extensions): media as opaque
  * `binary` payloads with typed metadata, decoded/feature-extracted in
  * batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * DETERMINISTIC FAKE decoder (clearly marked): it derives "features"
  * from payload length and content hash only. Everything around it —
  * schema, binary column handling, per-partition batch shape,
  * partitioning — is real Spark plumbing: swap `decodeStub` for a JNI /
  * library call and the pipeline is production-shaped. At 100 TB the
  * payloads live in the parquet as binary chunks; the decode pass is
  * narrow (no shuffle) and parallelizes by file split.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the Spark-side model
    * of an image/audio/video column).
    */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (fake, deterministic — see decodeStub). */
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      content_hash: String, width: Int, height: Int, mean_luma: Double)

  /** STUB — deterministic fake decode. A real build replaces this body
    * with an actual codec; the signature (one media row in, one feature
    * row out, called per-partition in batches) is the real contract.
    */
  def decodeStub(m: MediaRow): MediaFeatures = {
    val len = m.payload.length.toLong
    val h = graft.functions.TextHash.hash60(m.payload)
    val md5Hex = java.security.MessageDigest.getInstance("MD5")
      .digest(m.payload).map(b => f"$b%02x").mkString
    MediaFeatures(m.media_id, m.kind, len,
      md5Hex, (len % 640).toInt, (len * 7 % 480).toInt, (h % 256).toDouble / 255.0)
  }

  /** Typed per-partition decode path (the mapPartitions batch shape a
    * real codec needs — amortizes decoder init across a partition).
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows => rows.map(decodeStub) }
  }

  /** Documents-as-media: treat the text bytes as an opaque payload and
    * run the (fake) decode as pure column expressions — this is the
    * oracle-checked twin of `decodeAll` (same arithmetic, codegen'd).
    */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        col("text").cast(BinaryType).as("payload"))
      .select(col("media_id"),
        octet_length(col("payload")).cast(LongType).as("byte_len"),
        md5(col("payload")).as("content_hash"),
        hash60(col("payload")).as("hash60"))
      .select(col("media_id"), col("byte_len"), col("content_hash"),
        (col("byte_len") % 640).cast(IntegerType).as("width"),
        (col("byte_len") * 7 % 480).cast(IntegerType).as("height"),
        ((col("hash60") % 256).cast(DoubleType) / 255.0).as("mean_luma"))
      .orderBy(col("media_id"))
}
