package graft.tools

import graft.Tables
import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: where does the exact O(n²) pair scan spend its time —
  * kernel flops or partitioning? Compares the as-registered plan with a
  * stream-side repartition (the fixture parquet is one row group → one
  * split → one task without it).
  */
object ProfileExact {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.embeddings(spark, dir)
    val aug = Similarity.augmentedEmbeddings(emb)
    noop(Similarity.dedupEmbeddingDf(emb, 0.45)) // warm-up
    time("exact 0.45 as-is")(noop(Similarity.dedupEmbeddingDf(emb, 0.45)))
    time("exact 0.45 repart-32")(noop(
      Similarity.dedupEmbeddingDf(emb.repartition(32), 0.45)))
    time("exact 090 aug as-is")(noop(Similarity.dedupEmbeddingDf(aug, 0.90)))
    time("exact 090 aug repart-32")(noop(
      Similarity.dedupEmbeddingDf(aug.repartition(32), 0.90)))
    Similarity.dedupEmbeddingDf(emb, 0.45).explain("formatted")
    spark.stop()
  }
}
