package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column helpers shared by the query library.
  *
  * Cross-engine determinism policy: parquet `double` money/measure
  * columns carry 2-decimal values. Summing them as doubles is
  * order-dependent (different partial-aggregation orders give results
  * differing in the low bits, which breaks the driver's hash compare
  * against the DuckDB oracle). So every SUM/AVG over such a column is
  * computed on an exact DECIMAL cast — bit-identical in any engine and
  * any aggregation order — and only the final result is cast back to
  * double. MIN/MAX/first/last pick existing values and need no cast.
  */
object Cols {
  /** Exact 2-decimal view of a measure column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent exact sum of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Order-independent exact mean of a 2-decimal double column.
    * Exact decimal sum, one final double division (IEEE-deterministic).
    */
  def davg(c: Column): Column =
    (sum(dec2(c)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Sample stddev via exact decimal moments: sqrt((Σx² − (Σx)²/n)/(n−1)).
    * Both Σ are exact decimals, so the final double arithmetic is
    * engine-independent — unlike built-in stddev whose streaming update
    * order differs per engine/partitioning.
    */
  def dstddev(c: Column): Column = {
    val sx  = sum(dec2(c)).cast(DoubleType)
    val sxx = sum((dec2(c) * dec2(c)).cast(DecimalType(38, 4))).cast(DoubleType)
    val n   = count(c).cast(DoubleType)
    when(n > 1, sqrt((sxx - sx * sx / n) / (n - lit(1.0))))
  }

  /** Timestamp literal matching the NTZ reading of the parquet tables
    * (naive timestamps, interpreted as UTC end-to-end).
    */
  def tsLit(iso: String): Column = lit(iso).cast("timestamp_ntz")

  /** Epoch microseconds of an NTZ timestamp (session TZ is UTC, so the
    * NTZ→instant cast is the identity mapping).
    */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))
}
