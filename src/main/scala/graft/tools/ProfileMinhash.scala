package graft.tools

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the MinHash-LSH dedup pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warmup count")(Tables.documents(spark, dir).count())
    val sh = time("shingles only") {
      val d = Tables.documents(spark, dir)
        .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      d.select(sum(size(col("sh")))).head(); d
    }
    val docs = time("shingles+minhash persist") {
      val d = sh.select(col("doc_id"), col("sh"), minhashSig(col("sh"), 16).as("sig")).persist()
      d.count(); d
    }
    val bands = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(7))).as("band"), col("sig"))
      .withColumn("band_key", concat_ws("|",
        transform(slice(col("sig"), col("band") * 2 + 1, lit(2)),
          x => x.cast("string"))))
      .select(col("doc_id"), col("band"), col("band_key"))
    val cand = time("candidates") {
      val c = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().persist()
      println(s"  n_candidates = ${c.count()}"); c
    }
    time("verify join") {
      cand
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .select((size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("j"))
        .filter(col("j") >= 0.5).count()
    }
    spark.stop()
  }
}
