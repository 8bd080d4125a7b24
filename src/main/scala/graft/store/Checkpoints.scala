package graft.store

import org.apache.spark.sql.SparkSession

/** Lifetime management for eagerly-materialized intermediates.
  *
  * Several operators (`Dedup.dedupNgramJaccard`, `dedupMinhashLshDf`,
  * `dedupClustersDf`, `Similarity.lshBucketTable`/`dedupEmbeddingLshDf`)
  * eagerly `localCheckpoint(true)` small intermediates so multi-consumer
  * plans materialize them once instead of recomputing a CPU-heavy
  * upstream per consumer, and so iterative loops truncate lineage.
  *
  * The cost of that idiom: a local checkpoint's blocks live in the
  * block manager until the RDD object is garbage-collected and the
  * ContextCleaner's weak-reference queue drains — which on a large-heap
  * driver that never triggers a full GC can be "the rest of the
  * session". A long-lived session running many such queries (a bench
  * sweep, a notebook, a multi-query job) therefore accumulates dead
  * blocks that squeeze the unified memory pool's execution side.
  *
  * `free(spark)` releases them deterministically: it unpersists every
  * RDD the context still tracks as persistent. Call it BETWEEN queries
  * (a query's own checkpointed intermediates must stay alive while its
  * job runs; once its action returns they are garbage). Verify and
  * Bench call this after each query; any embedding application should
  * do the same at its own query boundaries.
  */
object Checkpoints {

  /** Unpersist every persistent/checkpointed RDD still registered with
    * the context (blocking, so block-manager memory is measurably freed
    * before the next query starts). Returns the number of RDDs freed.
    *
    * Ordering: the snapshot is blocking-unpersisted FIRST, and only
    * then is the plan cache cleared. The r14 ordering (snapshot →
    * `clearCache()` → blocking unpersist) raced: clearCache kicks off
    * NON-blocking removal of the CacheManager's InMemoryRelation RDD
    * blocks, and a concurrent blocking `unpersist` of the same RDD can
    * then hit `BlockManager.removeBlock` after the async path already
    * deleted the block — blocking mode RETHROWS the resulting
    * "Block rdd_N_P does not exist" SparkException (this killed the
    * r14 driver bench). Unpersisting the snapshot first means nothing
    * else is removing those blocks yet; `clearCache()` afterwards
    * drops the logical-plan → InMemoryRelation entries (without which
    * a re-run of the same query "already cached"-hits a block-less
    * entry: re-computation + fresh codegen — the r13 bug) and its own
    * non-blocking unpersist of already-block-less RDDs is a no-op.
    *
    * Belt-and-braces: each per-RDD unpersist still tolerates the
    * benign block-does-not-exist failure (any OTHER concurrent
    * remover — a ContextCleaner weak-ref drain, an application thread
    * — can race us the same way), because a free must never be able
    * to kill its caller over a block that is already gone.
    */
  def free(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach { rdd =>
      try rdd.unpersist(blocking = true)
      catch {
        case e: org.apache.spark.SparkException if isBlockGone(e) =>
          // already removed by a concurrent (non-blocking) remover —
          // the end state we wanted; swallow
      }
    }
    spark.catalog.clearCache()
    rdds.size
  }

  /** True when the failure (anywhere in its cause chain — blocking
    * master RPCs wrap the executor-side error in "Exception thrown in
    * awaitResult") is the benign "block already gone" case.
    */
  private def isBlockGone(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 8) {
      val m = String.valueOf(t.getMessage)
      // the SPECIFIC block-manager shape ("Block rdd_N_P does not
      // exist", from BlockManager.removeBlock), not any "does not
      // exist": a broken disk store surfaces file-level messages
      // ("File /tmp/blockmgr-.../rdd_3_0 does not exist") that contain
      // the same suffix, and swallowing those would report a clean
      // free() over a genuinely faulted session (review r15)
      if (m.contains("does not exist") && m.contains("Block rdd_"))
        return true
      t = t.getCause
      depth += 1
    }
    false
  }

  /** (cached RDD count, cached bytes in memory, cached bytes on disk) —
    * the block-manager footprint of live checkpoint/persist blocks.
    */
  def storageFootprint(spark: SparkSession): (Int, Long, Long) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }
}
