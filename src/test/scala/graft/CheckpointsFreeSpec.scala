package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.store.Checkpoints
import org.apache.spark.sql.functions._

/** Concurrency stress for `Checkpoints.free`: the r14 driver bench
  * died on `SparkException: Block rdd_N_P does not exist` thrown from
  * a blocking unpersist racing `clearCache()`'s NON-blocking removal
  * of the same blocks. The fix is twofold — free now unpersists its
  * snapshot BEFORE clearing the plan cache (so it cannot race itself),
  * and tolerates the benign block-already-gone failure (so an EXTERNAL
  * concurrent remover cannot kill it either). This suite hammers both:
  * free racing an external clearCache, free racing free, and free
  * racing query teardown, across repeated iterations — any escape of
  * the benign SparkException fails the test.
  */
class CheckpointsFreeSpec extends SparkSpec {

  private def cacheSome(n: Int): Unit = {
    (0 until n).foreach { i =>
      val df = spark.range(500 + i).select(
        col("id"), (col("id") % 7).as("k"))
      df.cache()
      df.count() // materialize the InMemoryRelation blocks
    }
    // plus a localCheckpoint'd intermediate — the operators' idiom
    spark.range(300).select((col("id") * 2).as("v"))
      .localCheckpoint(true).count()
  }

  /** Run `a` and `b` with a start barrier so both hit the block
    * manager in the same window; surface the first throwable.
    */
  private def race(a: () => Unit, b: () => Unit): Option[Throwable] = {
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    @volatile var failure: Option[Throwable] = None
    def wrap(f: () => Unit): Runnable = () => {
      start.await()
      try f()
      catch { case t: Throwable => failure.synchronized {
        if (failure.isEmpty) failure = Some(t) } }
    }
    pool.submit(wrap(a)); pool.submit(wrap(b))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS), "race pool hung")
    failure
  }

  test("free racing an external clearCache never throws (r14 crash shape)") {
    (1 to 15).foreach { it =>
      cacheSome(4)
      val f = race(
        () => spark.catalog.clearCache(),      // non-blocking remover
        () => Checkpoints.free(spark))         // blocking unpersist
      assert(f.isEmpty, s"iteration $it: ${f.map(_.toString).getOrElse("")}")
    }
    Checkpoints.free(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("free racing free never throws") {
    (1 to 15).foreach { it =>
      cacheSome(4)
      val f = race(
        () => { Checkpoints.free(spark); () },
        () => { Checkpoints.free(spark); () })
      assert(f.isEmpty, s"iteration $it: ${f.map(_.toString).getOrElse("")}")
    }
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("free racing per-relation unpersist (query teardown) never throws") {
    (1 to 15).foreach { it =>
      val dfs = (0 until 4).map { i =>
        val df = spark.range(400 + i).select((col("id") % 5).as("g"))
        df.cache(); df.count(); df
      }
      val f = race(
        () => dfs.foreach(_.unpersist(blocking = false)),
        () => { Checkpoints.free(spark); () })
      assert(f.isEmpty, s"iteration $it: ${f.map(_.toString).getOrElse("")}")
    }
    Checkpoints.free(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("free still clears the plan cache (r13 bug stays fixed)") {
    val df = spark.range(1000).select((col("id") % 3).as("k"))
    df.cache(); df.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    val n = Checkpoints.free(spark)
    assert(n >= 1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // a block-less dangling CacheManager entry would make this re-plan
    // against a dead InMemoryRelation; a cleared cache plans fresh
    val again = spark.range(1000).select((col("id") % 3).as("k"))
    assert(again.queryExecution.executedPlan.toString
      .indexOf("InMemoryTableScan") == -1,
      "plan cache entry survived free")
  }
}
