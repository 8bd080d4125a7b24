package graft.analytics

import graft.Cols._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** General relational query surface over the TPC-H-ish star schema.
  *
  * The reference's own schema is a single denormalized hypertable
  * (SURVEY.md §2.5 — it performs no SQL joins), but the engine must
  * still provide general join/agg machinery; these queries exercise it
  * the way the DuckDB-oracle harness checks it.
  *
  * Scale notes (100 TB design intent):
  *  - only the FIXED-size dimensions (region = 5 rows, nation = 25 rows)
  *    carry a forced broadcast hint. customer/supplier/part grow with
  *    scale factor, so the decision is left to AQE /
  *    autoBroadcastJoinThreshold: at small SF the optimizer broadcasts
  *    them anyway (same plan), at 100 TB it falls back to a shuffle join
  *    instead of OOMing the driver on a forced hint;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key once and
  *    Catalyst/AQE picks sort-merge with both sides partitioned by key;
  *  - all aggregates are partial (map-side combine) by construction of
  *    groupBy.agg; top-k is TakeOrderedAndProject (no global sort).
  */
object Relational {

  /** Q1-style pricing summary (cf. reference device_summary init.sql:163-176
    * shape: full-table grouped rollup). Exact decimal sums → deterministic.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= tsLit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast(DecimalType(38, 4))).cast(DoubleType).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Q3-style: top 10 orders by revenue for one market segment.
    * customer scales with SF → no forced broadcast, AQE decides;
    * lineitem⋈orders shuffles once.
    */
  def q3TopRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, dir)
      .filter(col("o_orderdate") < tsLit("1998-01-01"))
    val li   = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > tsLit("1998-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
        .cast(DecimalType(38, 4))).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-style: revenue per nation for one region — the 6-way join.
    * region/nation are fixed-size → forced broadcast; supplier/customer
    * scale with SF → AQE decides; only lineitem⋈orders must shuffle.
    */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
    val supp   = Tables.supplier(s, dir)
    val cust   = Tables.customer(s, dir)
    val ord    = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= tsLit("1996-01-01") &&
              col("o_orderdate") <  tsLit("1997-01-01"))
    val li     = Tables.lineitem(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust,
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
        .cast(DecimalType(38, 4))).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Semi join: orders that contain at least one high-value line
    * (EXISTS), counted per order status. left_semi keeps only the probe
    * side — no row multiplication, safe at fact×fact scale.
    */
  def joinSemiOrders(s: SparkSession, dir: String): DataFrame = {
    val bigLines = Tables.lineitem(s, dir).filter(col("l_extendedprice") > 50000)
      .select(col("l_orderkey"))
    Tables.orders(s, dir)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Anti join: customers with no order since 2001 (NOT EXISTS). */
  def joinAntiCustomers(s: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= tsLit("2001-01-01"))
      .select(col("o_custkey"))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_inactive"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Global top-k: TakeOrderedAndProject, not a full sort (O3 analog at
    * relational scale — each executor keeps a k-heap, driver merges k×p).
    */
  def topkOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Q6-style: pure filter + global aggregate — the "how much scan does
    * the filter skip" probe. All three predicates reach the parquet
    * reader as PushedFilters; row-group min/max stats skip on shipdate.
    */
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum((dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast(DecimalType(38, 4))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Dimension-enrichment agg: avg lineitem price per part brand
    * (J1 analog — fact enriched from a dimension). part scales with SF,
    * so broadcast is AQE's call, not a forced hint. */
  def brandPriceAgg(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(s, dir)
    Tables.lineitem(s, dir)
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        davg(col("l_extendedprice")).as("avg_price"),
        dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))
  }
}
