package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each probe row the payload of the build row
  * with the greatest `time` <= the probe's `time` for the same key —
  * the "most recent prior state" join (sensor reading → latest
  * calibration, event → latest config change, trade → latest quote).
  *
  * Spark has no ASOF JOIN operator, and the naive encoding —
  * a non-equi range join + per-probe-row max — plans as a
  * broadcast-nested-loop over probe×build per key. This implementation
  * composes existing operators into the UNION-AS-EVENT-STREAM form
  * instead: tag build rows 0 and probe rows 1, union, and run ONE
  * running `last(payload, ignoreNulls)` window per key ordered by
  * (time, tag). Each probe row then carries the most recent build
  * payload at-or-before its own timestamp (build sorts before probe at
  * equal time ⇒ inclusive <=, matching DuckDB `ASOF ... ON p.t >= b.t`).
  *
  * Scale shape: one hash shuffle of probe+build on the key, one
  * in-partition sort — exactly a sort-merge join's cost, with no pair
  * explosion and no second pass (the running frame is evaluated
  * incrementally, O(rows) per partition). At 100 TB the key must be
  * higher-cardinality than the parallelism (true for device/user/symbol
  * keys); a single globally-hot key would need the salt-by-time-range
  * variant of the same idea (bounded lookback re-broadcast per salt).
  *
  * Build-side contract: at most one row per (key, time) — pre-aggregate
  * upstream (as `asofPurchaseJoin` does) or the match is ambiguous in
  * ANY engine's as-of semantics.
  */
object AsofJoin {

  /** Generic form. `build`'s columns other than `key` ride along as the
    * payload; its `time` column is emitted as `buildTimeAs`. Result =
    * probe columns ++ (buildTimeAs, remaining build columns), null when
    * no build row precedes the probe row.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String, time: String,
      buildTimeAs: String): DataFrame = {
    val payNames = buildTimeAs +: build.columns.filterNot(c => c == key || c == time).toSeq
    val pay = struct(
      col(time).as(buildTimeAs) +:
        build.columns.filterNot(c => c == key || c == time).map(col).toSeq: _*)
    val b = build.select(col(key), col(time), lit(0).as("__src"), pay.as("__p"))
    val p = probe.select(probe.columns.map(col).toSeq :+ lit(1).as("__src"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(time), col("__src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(probe.columns.map(col).toSeq ++
        payNames.map(n => col(s"__m.$n").as(n)): _*)
  }

  /** Registered query: every non-purchase event joined as-of to the same
    * user's most recent purchase (the "state at event time" question the
    * reference answers with correlated LATERAL scans per device —
    * cf. /root/reference/src/data_storage/database.py:348-383's
    * latest-per-device loop). Build side pre-aggregated to one row per
    * (user_id, ts) so the match is deterministic in every engine.
    */
  def asofPurchaseJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val probe = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val build = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    asofJoin(probe, build, "user_id", "ts", "purchase_ts")
      .orderBy(col("event_id"))
  }
}
