package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one session per suite, configured identically to
  * Verify/Bench (NTZ timestamps, UTC, non-ANSI, AQE).
  */
trait SparkSpec extends AnyFunSuite {
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001  = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // match the mains: sort shuffle writer, never per-reducer bypass
    // files (see Bench.scala's builder for the measured rationale)
    .config("spark.shuffle.sort.bypassMergeThreshold", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
