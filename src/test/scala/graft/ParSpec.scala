package graft

import org.apache.spark.sql.functions._

/** The split-bound spread guard's two-sided contract: it widens an
  * under-split relation to the session's parallelism, and it is the
  * IDENTITY — same DataFrame object, no added exchange — once input
  * splits already reach it (the at-scale case, where the guard must
  * never tax the plan).
  */
class ParSpec extends SparkSpec {

  test("under-split input is spread to defaultParallelism") {
    val para = spark.sparkContext.defaultParallelism
    val one = spark.range(100).toDF("id").coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    val spread = Par.spread(one)
    assert(spread.rdd.getNumPartitions == para)
    // content untouched
    assert(spread.agg(sum(col("id"))).head.getLong(0) == 4950L)
  }

  test("well-split input passes through untouched — no exchange added at scale") {
    val para = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).toDF("id").repartition(para + 2)
    val spread = Par.spread(wide)
    assert(spread eq wide, "spread must be the identity when splits >= cores")
  }
}
