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
    * The RDD snapshot is taken BEFORE the plan cache is cleared:
    * `catalog.clearCache()` unpersists the CacheManager's
    * InMemoryRelation RDDs NON-blocking and deregisters them from
    * `getPersistentRDDs`, so a snapshot taken after it would never see
    * them and their blocks could still be draining when the next query
    * starts. Snapshotting first, then clearing the cache (drops the
    * logical-plan → InMemoryRelation entries, without which a re-run
    * of the same query would "already cached"-hit a block-less entry:
    * re-computation + fresh codegen for an unchanged query — the r13
    * bug), then blocking-unpersisting the snapshot (idempotent for the
    * ones clearCache already started removing) makes the free
    * deterministic for plan-cache and checkpoint blocks alike.
    */
  def free(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    spark.catalog.clearCache()
    rdds.values.foreach(_.unpersist(blocking = true))
    rdds.size
  }

  /** (cached RDD count, cached bytes in memory, cached bytes on disk) —
    * the block-manager footprint of live checkpoint/persist blocks.
    */
  def storageFootprint(spark: SparkSession): (Int, Long, Long) = {
    val infos = spark.sparkContext.getRDDStorageInfo
    (infos.length, infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }
}
