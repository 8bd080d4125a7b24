package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: the pre-shuffle layout a 100 TB
  * deployment uses for the recurring fact⋈fact join — both tables
  * bucketed on the join key at write time, so the join needs NO exchange
  * at read time (SURVEY §4: "co-locate joins via bucketing").
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without any shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, Sf0001).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, Sf0001).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // force the shuffle-join path (broadcast would hide the exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val planned = joined.queryExecution.executedPlan.toString
      assert(!planned.contains("Exchange hashpartitioning(l_orderkey") &&
        !planned.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$planned")

      // and it computes the same result as the plain join
      val expected = Tables.lineitem(spark, Sf0001)
        .join(Tables.orders(spark, Sf0001), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toSet
      assert(joined.as[(String, Long)].collect().toSet == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
