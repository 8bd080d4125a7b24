package graft.tools

import graft.Tables
import graft.similarity.{LshParams, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the embedding-LSH dedup pipeline. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.embeddings(spark, dir)
    val n = time("count")(emb.count())
    val params = LshParams.derive(n, 0.45)
    println(s"n=$n params=$params")

    import graft.functions.LshBucketsExpr
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def lshCol(c: org.apache.spark.sql.Column, b: Int, t: Int, off: Int = 0) =
      ColumnBridge.column(LshBucketsExpr(ColumnBridge.expression(c), b, t, off))

    val ids = emb
      .select(col("vec_id"),
        posexplode(lshCol(col("embedding"), params.planesPerTable, params.nTables))
          .as(Seq("tbl", "bucket")))
    time("ids noop")(noop(ids))
    time("ids noop 2nd")(noop(ids))

    val sizes = ids.groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("bsz"))
    time("sizes noop")(noop(sizes))

    val keyed = ids.select(col("vec_id"), col("tbl"), col("bucket"))
    val cand = keyed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_a"))
      .join(keyed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b")),
        Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
    time("cand (no distinct) noop")(noop(cand))
    val dist = cand.distinct()
    time("cand distinct noop")(noop(dist))

    val refined = dist
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")),
        Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")),
        Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.45)
    time("refine noop")(noop(refined))

    time("full query noop")(noop(Similarity.dedupEmbeddingLsh(spark, dir)))
    time("full query noop 2nd")(noop(Similarity.dedupEmbeddingLsh(spark, dir)))
    time("exact 0.45 noop")(noop(Similarity.dedupEmbedding(spark, dir, 0.45)))
    spark.stop()
  }
}
