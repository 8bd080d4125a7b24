package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A hot key (one device
  * producing 100× the events, one shingle in every document) funnels its
  * whole group through a single reducer; salting spreads it over
  * `buckets` partial groups and merges the partials — turning the
  * straggler task into `buckets` even tasks. Works for any decomposable
  * aggregate (sum/count/min/max); pair with AQE skew-join handling for
  * the join-side equivalent.
  */
object Salting {

  /** Deterministic per-row salt in [0, buckets) derived from the row's
    * own columns — no RNG state, so retries/recomputations agree.
    */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** groupBy(key).agg(sum(value), count(*)) with salting. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      buckets: Int): DataFrame = {
    val salted = df
      .withColumn("__salt", salt(buckets, key, value))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
    salted
      .groupBy(col("__key"))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }
}
