package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: clustering-family timings + loop round count at sf0.1. */
object ReproCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    // round count of the production loop shape (propagate + jump)
    val pairs = graft.dedup.Dedup.dedupSimhash(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("u", "v").localCheckpoint(true)
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("root", col("node")).localCheckpoint(true)
    var converged = false; var i = 0
    while (!converged && i < 100) {
      val viaNbr = edges.join(labels.withColumnRenamed("node", "v"), "v")
        .select(col("u").as("node"), col("root"))
      val propagated = labels.union(viaNbr)
        .groupBy(col("node")).agg(min(col("root")).as("root"))
      val compressed = propagated
        .select(col("node").as("rnode"), col("root").as("rroot"))
      val next = propagated.join(compressed, col("root") === col("rnode"))
        .select(col("node"), col("rroot").as("root")).localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("root", "prev"), "node")
        .filter(col("root") =!= col("prev")).count()
      labels = next; converged = changed == 0; i += 1
      println(s"round $i changed=$changed")
    }
    println(s"rounds=$i")
    spark.stop()
  }
}
