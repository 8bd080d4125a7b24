package graft.tools

import graft.Tables
import graft.similarity.{LshParams, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the 0.9-threshold LSH showcase. */
object ProfileLsh090 {
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

    val aug = Similarity.augmentedEmbeddings(Tables.embeddings(spark, dir))
    val n = time("count")(aug.count())
    val params = LshParams.derive(n, 0.90, 0.9999, 4)
    println(s"n=$n params=$params admission=${LshParams.randomAdmission(params)}")
    val full = time("warm full")(
      { noop(Similarity.dedupEmbeddingLshDf(aug, 0.90, params, 4096, 4)); () })
    time("full lsh 090")(noop(Similarity.dedupEmbeddingLshDf(aug, 0.90, params, 4096, 4)))
    val keyed = time("bucket table build+ckpt")(
      Similarity.lshBucketTable(aug, params, 4096, 4).localCheckpoint())
    time("bucket table count")(println(keyed.count()))
    val cand = keyed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_a"))
      .join(keyed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b")),
        Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
    time("cand pre-distinct count")(println(cand.count()))
    val dcand = cand.distinct()
    time("cand distinct count")(println(dcand.count()))
    time("exact 090 twin")(noop(Similarity.dedupEmbeddingDf(aug, 0.90)))
    spark.stop()
  }
}
