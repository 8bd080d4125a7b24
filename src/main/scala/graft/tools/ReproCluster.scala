package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev repro: full registered clustering queries at sf0.1. */
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
    for (q <- Seq("dedup_clusters_simhash", "dedup_clusters", "dedup_apply",
        "dedup_clusters_embedding")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"$q%-28s rows=$n%-8d ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    spark.stop()
  }
}
