package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("range count: exact half-open [t-lookback, t) semantics across bucket edges") {
    import spark.implicits._
    // lookback 100µs; build points chosen to straddle bucket boundaries
    val build = Seq(0L, 50L, 99L, 100L, 150L, 199L, 200L, 300L)
      .toDF("t_us")
    val probe = Seq(
      (1L, 100L),  // [0,100)   -> 0,50,99          = 3
      (2L, 150L),  // [50,150)  -> 50,99,100        = 3
      (3L, 200L),  // [100,200) -> 100,150,199      = 3
      (4L, 201L),  // [101,201) -> 150,199,200      = 3
      (5L, 350L),  // [250,350) -> 300              = 1
      (6L, 1000L)  // empty window                  = 0 (kept)
    ).toDF("probe_id", "t_us")
    val got = RangeJoin.rangeCountBefore(probe, build, 100L)
      .collect().map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("n_preceding"))
      .toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L, 6L -> 0L))
  }

  test("fully duplicate probe rows each keep their own count (no silent merge)") {
    import spark.implicits._
    val build = Seq(10L, 20L, 30L).toDF("t_us")
    // two byte-identical probe rows: each must emit its own row with
    // the per-row count (2), not one merged row with a doubled sum (4)
    val probe = Seq(("dup", 25L), ("dup", 25L), ("solo", 35L))
      .toDF("tag", "t_us")
    val got = RangeJoin.rangeCountBefore(probe, build, 100L)
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[Long]("n_preceding")))
    assert(got.sorted.toSeq == Seq(("dup", 2L), ("dup", 2L), ("solo", 3L)),
      s"got ${got.toSeq}")
  }

  test("burst query matches the naive cross-range formulation at sf0.001") {
    val ev = Tables.events(spark, Sf0001)
    val naive = ev.filter(col("event_type") === "error")
      .select(col("event_id"), Cols.epochUs(col("ts")).as("p_us"))
      .join(ev.select(Cols.epochUs(col("ts")).as("b_us")),
        col("b_us") >= col("p_us") - 60000000L && col("b_us") < col("p_us"),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("b_us")).as("n_preceding"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = RangeJoin.rangeJoinBurst(spark, Sf0001)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_preceding")).toMap
    assert(got == naive)
    assert(got.values.sum > 0) // the window actually catches events
  }

  test("bucketed plan is nested-loop-free; the naive one is not") {
    val bucketed = RangeJoin.rangeJoinBurst(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!bucketed.contains("BroadcastNestedLoop"))
    assert(!bucketed.contains("CartesianProduct"))
    val ev = Tables.events(spark, Sf0001)
    val naive = ev.filter(col("event_type") === "error")
      .select(Cols.epochUs(col("ts")).as("p_us"))
      .join(ev.select(Cols.epochUs(col("ts")).as("b_us")),
        col("b_us") >= col("p_us") - 60000000L && col("b_us") < col("p_us"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoop") || naive.contains("CartesianProduct"))
  }
}
