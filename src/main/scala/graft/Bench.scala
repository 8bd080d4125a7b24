package graft

import org.apache.spark.sql.SparkSession

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Per-round benchmark main (driver contract): times the headline
  * queries on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Harness policy:
  *  - every query runs 3×, min-of-3 reported (min-of-N is the standard
  *    estimator for "cost of the plan" under scheduler noise);
  *  - a failing run is LOUD: the exception is recorded per query in an
  *    `errors` field (mirroring CORRECTNESS_r0N's per-query `err`) and
  *    printed to stderr — a crashed query is excluded from `queries`/
  *    `total` so it can never shrink the total into looking healthy;
  *  - between queries the harness frees any checkpoint/persist blocks
  *    the previous query left behind (`Checkpoints.free`) so each
  *    query is measured against a clean block manager — the same state
  *    a standalone run sees. SPARK_GRAFT_BENCH_FREE=0 disables this
  *    (the A/B lever that exposed the r4 session-state effect; see
  *    COVERAGE.md's bench-methodology note).
  *
  * Every individual run is logged to stderr with the block-manager
  * footprint at its end, and all three raw times ride the JSON line in
  * a `runs` field — min-of-3 alone cannot distinguish "one cold run"
  * from "every run slow" after the fact.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (data), SPARK_GRAFT_CPUS (local[N]),
  * SPARK_GRAFT_BENCH_FREE (default 1),
  * SPARK_GRAFT_BENCH_QUERIES (comma-separated override of the query
  * list/order — used for the order-variance probes).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val freeBetween = sys.env.getOrElse("SPARK_GRAFT_BENCH_FREE", "1") == "1"
    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.benchQueries)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: materializes every row of the final plan (sorts,
    // projections, limits included) without writing — unlike count(),
    // which lets Catalyst prune all columns and drop top-level sorts.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JVM+Spark warm-up (codegen, parquet footers, broadcast machinery)
    // outside the timed loop — scan+agg, broadcast+SMJ join, window paths
    Seq("q1_pricing_summary", "q5_region_revenue", "w2_moving_avg")
      .foreach(n => run(SparkEntry.queries(n)(spark, sfDir)))
    // …plus the broadcast-nested-loop cosine kernel: the O(n²) dedup
    // twins' hot loop is JIT-sensitive (measured 30s first-execution vs
    // 7.5s steady-state at n=12 000 — C2 compilation of the codegen'd
    // pair loop), so warm it on a small slice to keep run 1 comparable
    run(graft.similarity.Similarity.dedupEmbeddingDf(
      graft.Tables.embeddings(spark, sfDir).limit(2000), 0.9))
    graft.store.Checkpoints.free(spark)
    val errors = mutable.LinkedHashMap.empty[String, String]
    def footprint(): String = {
      val (n, mem, disk) = graft.store.Checkpoints.storageFootprint(spark)
      f"cachedRdds=$n memMB=${mem / 1e6}%.1f diskMB=${disk / 1e6}%.1f"
    }
    // Per-run process-CPU and GC deltas: the discriminator between "the
    // query did more work" (cpu inflates with wall — recompute/GC) and
    // "the environment stalled the JVM" (wall inflates, cpu flat — the
    // r4 dedup_embedding_090 pathology: a multi-minute host-side
    // throughput-degradation window reproduced locally on the r5
    // machine with PSI zero, 96% idle, and a concurrently-launched
    // fresh process spinning at full 32-core speed).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuSeconds(): Double = osBean.getProcessCpuTime / 1e9
    def gcSeconds(): Double =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum / 1e3
    def benchOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Option[(String, (Double, Seq[Double]))] = {
      // Each run's timing includes everything the query does itself;
      // the between-run block-manager cleanup happens OUTSIDE the
      // timed window so the measurement stays "cost of the plan".
      def once(i: Int): Option[Double] = {
        val (cpu0, gc0) = (cpuSeconds(), gcSeconds())
        val t0 = System.nanoTime()
        val r =
          try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
              System.err.println(s"[bench] $name run $i FAILED: $msg")
              errors(name) = msg
              None
          }
        // one line per RUN (not just the min): a bench artifact that
        // only carries min-of-3 can't distinguish "one cold run" from
        // "every run slow" after the fact — exactly the ambiguity that
        // made r4's dedup_embedding_090 driver reading undiagnosable
        System.err.println(
          f"[bench] $name run $i ${r.map(t => f"$t%.2fs").getOrElse("ERR")}%-8s " +
            f"cpu=${cpuSeconds() - cpu0}%.1fs gc=${gcSeconds() - gc0}%.2fs ${footprint()}")
        if (freeBetween) graft.store.Checkpoints.free(spark)
        r
      }
      val times = (1 to 3).flatMap(once)
      // all-runs-failed => no timing row; the error entry carries it
      if (times.isEmpty) None else Some(name -> (times.min, times))
    }
    val results = names.flatMap { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          errors(name) = "unknown query name"
          System.err.println(s"[bench] $name: unknown query name")
          None
        case Some(fn) => benchOne(name, fn)
      }
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, (_, ts)) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString(",\"runs\":{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }.mkString(",\"errors\":{", ",", "}")
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$runsJson$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
