package graft

import org.apache.spark.sql.DataFrame

/** Split-bound-parallelism guard, shared by every CPU-heavy narrow
  * scan in the query library.
  *
  * The failure mode it closes: a small corpus written as ONE parquet
  * file is one input split, so a plan whose cost is dominated by
  * per-row compute (hashing, n-gram stats, digest expressions) runs as
  * ONE task and serializes on a single core — bench parallelism
  * (cpu/wall) ≈ 1 instead of ≈ cores. At real scale input splits far
  * exceed cores and the guard is a no-op (`getNumPartitions` already ≥
  * `defaultParallelism`), so production plans never pay the extra
  * round-robin shuffle; on the local fixtures the shuffled relation is
  * the narrow projection being spread (ids + small derived columns),
  * so the shuffle it does pay is negligible next to the compute it
  * parallelizes.
  *
  * `repartition(n)` with an EXPLICIT target is used deliberately: AQE
  * honors user-specified partition counts (it only coalesces
  * ENSURE_REQUIREMENTS / unspecified-count shuffles), so the spread
  * survives adaptive re-planning.
  */
object Par {
  /** `df` spread to at least the session's default parallelism; the
    * identity when its plan already has enough input splits.
    */
  def spread(df: DataFrame): DataFrame = {
    val para = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < para) df.repartition(para) else df
  }
}
