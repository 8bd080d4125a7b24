package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the mechanism that keeps a
  * fact⋈fact join from scanning the unfiltered side in full at 100 TB:
  * Catalyst plants a bloom filter built from the SELECTIVE side's join
  * keys as a pre-shuffle filter on the big side. Size thresholds
  * normally gate the rewrite to genuinely large scans; the spec lowers
  * them to prove the machinery fires and stays result-identical.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom-filter runtime filter fires on a filtered fact-fact join and preserves results") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // force a shuffle join — runtime filters target non-broadcast joins
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def query = {
        val ord = Tables.orders(spark, Sf001)
          .filter(col("o_orderpriority") === "1-URGENT")
        Tables.lineitem(spark, Sf001)
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Cols.dsum(col("l_quantity")).as("qty"))
      }
      val optimized = query.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.toLowerCase.contains("mightcontain"),
        s"no bloom runtime filter in:\n${optimized.take(2000)}")
      val withFilter = query.collect()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = query.collect()
      assert(withFilter.map(_.toString).sorted.sameElements(without.map(_.toString).sorted))
      assert(withFilter.nonEmpty)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
