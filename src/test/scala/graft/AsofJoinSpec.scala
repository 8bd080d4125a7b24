package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("asof: each probe row gets the greatest build time <= its own, inclusive") {
    import spark.implicits._
    val build = Seq((1L, 10L, "a"), (1L, 20L, "b"))
      .toDF("k", "t", "payload")
    val probe = Seq((1L, 5L), (1L, 10L), (1L, 15L), (1L, 25L), (2L, 30L))
      .toDF("k", "t")
    val got = AsofJoin.asofJoin(probe, build, "k", "t", "bt")
      .orderBy(col("k"), col("t"))
      .select(col("k"), col("t"), col("bt"), col("payload"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "" else r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 5L, -1L, ""),       // before any build row -> no match
      (1L, 10L, 10L, "a"),     // equal time matches (inclusive <=)
      (1L, 15L, 10L, "a"),
      (1L, 25L, 20L, "b"),
      (2L, 30L, -1L, "")))     // key with no build rows -> no match
  }

  test("asof plan: window over one key shuffle, no pair explosion") {
    val plan = AsofJoin.asofPurchaseJoin(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"))
  }

  test("asof on events: purchases match themselves as most recent at own ts") {
    // every purchase row, probed AT its own timestamp, must match itself
    // (or a same-instant purchase with a larger event_id)
    val ev = Tables.events(spark, Sf0001)
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val selfProbe = purch.select(col("user_id"), col("ts"), col("purchase_id").as("expect_id"))
    val got = AsofJoin.asofJoin(selfProbe, purch, "user_id", "ts", "purchase_ts")
    assert(got.filter(col("purchase_id") =!= col("expect_id")).count() == 0)
    assert(got.filter(col("purchase_ts") =!= col("ts")).count() == 0)
  }
}
