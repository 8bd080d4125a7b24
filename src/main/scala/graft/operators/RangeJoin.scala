package graft.operators

import graft.Cols.epochUs
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval) join WITHOUT an equality key — the join shape
  * Catalyst can only plan as a broadcast-nested-loop / cartesian
  * product, because there is no equi-predicate to hash or sort-merge
  * on. (With an equi key alongside the range — "same device within 10
  * minutes" — vanilla SMJ on the key + a post-join filter is already
  * the right plan; this operator exists for the keyless case.)
  *
  * The standard fix, composed from existing operators: EPOCH-BUCKET the
  * time axis at the lookback width, expand each probe row to the two
  * buckets its window can overlap, equi-join on the bucket id, and
  * refine with the exact range predicate. Every build row lands in ONE
  * bucket and each candidate pair arises from exactly one bucket match,
  * so there is no dedup step; the pair space shrinks from |probe|·|build|
  * to pairs within adjacent buckets. At 100 TB that is the difference
  * between an unrunnable cross join and one shuffle on a well-spread
  * integer key (a global event burst makes a hot bucket — AQE skew-join
  * splits it; the refine stays a codegen'd filter).
  */
object RangeJoin {

  /** Generic core: for each probe row, count build rows whose `t_us`
    * falls in [probe.t_us - lookbackUs, probe.t_us). Probe columns ride
    * through; zero-match probe rows are kept with n_preceding = 0.
    * `build` must carry exactly one column `t_us` (epoch micros).
    *
    * The post-join regroup keys on a synthetic per-row id minted BEFORE
    * the bucket explode — not on the probe's own columns — so two fully
    * identical probe rows each produce their own (correct) count
    * instead of silently merging into one row with a doubled sum. The
    * id never leaves the operator.
    *
    * Cluster-determinism constraint: `monotonically_increasing_id` is
    * stable only while the upstream partitioning is — if a probe task
    * is recomputed after a partial shuffle fetch (executor loss,
    * speculation), recomputed rows can take different ids. That is
    * harmless here ONLY because the id is consumed within this one
    * stage pair and never joined back; if the operator ever needs to
    * persist or re-join the id, mint it deterministically instead
    * (row_number over a total order, or a hash of the full row plus a
    * per-row occurrence index).
    */
  def rangeCountBefore(probe: DataFrame, build: DataFrame,
      lookbackUs: Long): DataFrame = {
    val keyCols = probe.columns.filterNot(_ == "t_us").map(col).toSeq
    val b = build.select(
      (col("t_us") / lookbackUs).cast(LongType).as("bk"),
      col("t_us").as("b_us"))
    probe
      .withColumn("__probe_id", monotonically_increasing_id())
      .withColumn("pbk", (col("t_us") / lookbackUs).cast(LongType))
      .withColumn("jb", explode(array(col("pbk") - 1, col("pbk"))))
      .join(b,
        col("jb") === col("bk") &&
          col("b_us") >= col("t_us") - lookbackUs &&
          col("b_us") < col("t_us"),
        "left")
      .groupBy(col("__probe_id") +: col("t_us") +: keyCols: _*)
      .agg(count(col("b_us")).as("n_preceding"))
      .drop("__probe_id", "t_us")
  }

  /** Registered query: global burst detection — every error event with
    * the count of ALL events (any device) in the preceding 60 seconds.
    * Keyless by construction: the question spans devices, so there is
    * no equi column to lean on (cf. the reference's anomaly queries,
    * which only ever correlate within one device —
    * /root/reference/src/data_storage/init.sql:156-160).
    */
  def rangeJoinBurst(s: SparkSession, dir: String): DataFrame = {
    val lookbackUs = 60L * 1000000L
    val build = Tables.events(s, dir).select(epochUs(col("ts")).as("t_us"))
    val probe = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"), epochUs(col("ts")).as("t_us"))
    rangeCountBefore(probe, build, lookbackUs)
      .select(col("event_id"), col("ts"), col("n_preceding"))
      .orderBy(col("event_id"))
  }
}
