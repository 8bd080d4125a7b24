package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one session per suite, configured identically to
  * Verify/Bench — all three build through [[GraftSession]] (r15
  * verdict #3), so the scale-critical confs exist in exactly one place.
  */
trait SparkSpec extends AnyFunSuite {
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001  = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = GraftSession.local("4")
    .appName(getClass.getSimpleName)
    .getOrCreate()
}
