package graft

/** DRIFT CLASSIFIER — extracted from Bench's inline verdict loop (r16
  * verdict #1) so a spec can replay RECORDED artifact columns through
  * the exact production logic. Bench feeds it per-run measurements;
  * the function is pure (no Spark, no clock, no env).
  *
  * A run is an OUTLIER when its cpu exceeds 1.5× the query's min-cpu
  * (by ≥1 s) or its wall exceeds 2× the min-wall (by ≥1 s). Each
  * outlier is classified by the FIRST discriminator that fires,
  * ordered most- to least-specific:
  *
  *   recompute    — ≥1.2× AND ≥20 more tasks than the cleanest run (a
  *                  persisted/cached stage was re-executed — the r13
  *                  dedup_chunks driver-outlier hypothesis, now a
  *                  measurement; the absolute floor keeps ±1-2
  *                  straggler task-end events from the async listener
  *                  bus out of the most alarming class)
  *   cold-codegen — run 1 compiling its plan for the first time
  *                  (expected; not cache thrash)
  *   recompile    — ≥10 Janino compilations on a LATER run of the same
  *                  query (codegen-cache thrash)
  *   jit-warmup   — ≥50% of the cpu excess is HotSpot compiler-thread
  *                  time (run 1 of a cold plan; benign)
  *   mem-dilution — this run's mem-calibration ≥2× the session
  *                  baseline AND ≥25 ms absolute (memory-bandwidth
  *                  contention; the floor keeps a 10 ms baseline's
  *                  noise from counting as contention). TESTED BEFORE
  *                  tier-warmup (r16 verdict #1): the r16 driver
  *                  artifact's dedup_embedding_lsh_090 run 2 — 603 s
  *                  cpu, jit 3.1 s (0.5% of the excess), mem probe at
  *                  3.3× baseline — got the benign tier-warmup label
  *                  because the warmup window was consulted first. A
  *                  fired dilution probe is direct evidence about the
  *                  environment; the warmup window is only a prior.
  *   sys-dilution — this run's syscall probe ≥3× the session baseline
  *                  AND ≥10 µs absolute: file-metadata latency (footer
  *                  reads, file opens — what the many-small-reads
  *                  serve rows wait on; the r16 run-E wall-only shape)
  *   cpu-dilution — this run's spin-calibration ≥1.5× baseline
  *                  (work-rate dilution: steal / SMT / throttle)
  *   tier-warmup  — a cpu outlier on the 1st/2nd execution after the
  *                  plan's cold compile, tasks FLAT, no dilution probe
  *                  fired, AND jit explains a material fraction of the
  *                  cpu excess: ≥0.3 s absolute AND ≥5% of the excess
  *                  (r16 verdict #1 — the bare 0.3 s floor admitted a
  *                  603 s-cpu run whose jit was 0.5% of the excess).
  *                  This is the r15 driver artifact's 12 "plan-work"
  *                  run-2 shape, root-caused r16 by two probes
  *                  (COVERAGE.md): compiler-thread burn plus app
  *                  threads running freshly-loaded generated classes
  *                  at interpreter/C1 speed until C2 lands.
  *   native-burn  — ≥50% of the cpu excess is native-thread time
  *                  (concurrent-GC treadmill)
  *   plan-work    — a cpu outlier with MORE TASKS (≥20 above the
  *                  cleanest run, below recompute's 1.2× bar) that
  *                  none of the above explains: the run measurably did
  *                  more Spark work (the only class that indicts a
  *                  plan)
  *   cpu-unattributed — a cpu outlier with FLAT tasks that nothing
  *                  above explains: the same scheduled work took more
  *                  cpu, which identical plan + identical data cannot
  *                  cause — in-run ambient contention the post-run
  *                  probe samples missed (the r16 driver tx_nb_langid
  *                  run 2: cpu 7× on 153-of-153 flat tasks, probes
  *                  clean, judge's quiet re-bench reproduced the
  *                  floor). Flagged for adjudication, but does NOT
  *                  indict the plan: before r17 these landed in
  *                  plan-work, and every one the judges adjudicated
  *                  (r15 ×12, r16 ×1) proved ambient.
  *   stall        — a WALL-only outlier (cpu flat) nothing above
  *                  explains: the JVM spent the excess not running
  *                  (the jit/native tests are cpu-excess ratios, so
  *                  they are only consulted for cpu outliers — on a
  *                  flat-cpu run their denominators are ~0 and they
  *                  would fire vacuously)
  *
  * Sub-second excesses are not classified (left "ok"): a <1 s cpu and
  * <1 s wall excess is scheduler jitter, not a drift event.
  */
object BenchDrift {

  /** One accepted run's measured columns. `run` is the ORIGINAL
    * attempt number (1-based), not the index in the accepted vector:
    * when run 1 is stall-dropped and retried, the first ACCEPTED run
    * may still be the one that compiled the plan cold, and the
    * cold-codegen test must see that (classifying it "recompile" —
    * cache thrash — was the r14 bug).
    */
  final case class RunCols(run: Int, wall: Double, cpu: Double,
      tasks: Long, codegen: Long, jit: Double, nativeCpu: Double,
      spin: Double, mem: Double, sys: Double)

  /** Session-start min-of-3 probe baselines (see Bench's spinCalib /
    * memCalib / syscallCalib docs).
    */
  final case class Baselines(spin: Double, mem: Double, sysUs: Double)

  /** Classify each accepted run of one query. `stallRuns` carries the
    * original attempt numbers of stall-RECORDED attempts of the same
    * query (from Bench's stall_windows); a stall KEPT after retry
    * exhaustion appears in BOTH lists with the SAME run number, so
    * completed-execution counting must dedupe by run number (r16
    * ADVICE #4 — the double count closed the tier-warmup window one
    * execution early and misclassified a genuine run-2 settling
    * transient).
    */
  def classify(rs: Seq[RunCols], stallRuns: Seq[Int],
      b: Baselines): Seq[String] = {
    val minCpu = rs.map(_.cpu).min
    val minWall = rs.map(_.wall).min
    val minTasks = rs.map(_.tasks).min
    val minNative = rs.map(_.nativeCpu).min
    val minJit = rs.map(_.jit).min
    // cold-codegen is benign only for the FIRST attempt that actually
    // executed this query's plan. The test is on the ORIGINAL attempt
    // number, not the accepted-vector index (r14 ADVICE): a
    // stall-dropped or errored attempt before an accepted run shifts
    // the index but — when the earlier attempt never completed a run
    // (errored pre-compile) — the compile on the first accepted run
    // is still the session's first for this plan. Any attempt that
    // COMPLETED (accepted earlier, or stall-recorded) already paid the
    // compile, so a later ≥10-class burst is genuine cache thrash.
    def firstExecution(r: RunCols): Boolean =
      !rs.exists(_.run < r.run) && !stallRuns.exists(_ < r.run)
    // completed executions of this plan before attempt r — DISTINCT
    // run numbers across accepted and stall-recorded attempts (a kept
    // stall is in both); the tier-warmup window is the first TWO
    // executions, where the r16 probes measured the settling transient
    def executionsBefore(r: RunCols): Int =
      (rs.filter(_.run < r.run).map(_.run) ++
        stallRuns.filter(_ < r.run)).distinct.size
    rs.map { r =>
      val cpuExcess = r.cpu - minCpu
      val cpuOut = r.cpu > 1.5 * minCpu && cpuExcess >= 1.0
      val wallOut = r.wall > 2 * minWall && r.wall - minWall >= 1.0
      val tasksFlat = r.tasks - minTasks < 20
      if (!cpuOut && !wallOut) "ok"
      else if (minTasks > 0 && r.tasks >= 1.2 * minTasks &&
        r.tasks - minTasks >= 20) "recompute"
      else if (r.codegen >= 10) {
        if (firstExecution(r)) "cold-codegen" else "recompile" }
      else if (cpuOut && r.jit - minJit >= 0.5 * cpuExcess) "jit-warmup"
      else if (r.mem >= 2 * b.mem && r.mem >= 0.025) "mem-dilution"
      else if (r.sys >= 3 * b.sysUs && r.sys >= 10.0) "sys-dilution"
      else if (r.spin >= 1.5 * b.spin) "cpu-dilution"
      else if (cpuOut && tasksFlat && executionsBefore(r) <= 1 &&
        r.jit >= 0.3 && r.jit >= 0.05 * cpuExcess) "tier-warmup"
      else if (cpuOut && r.nativeCpu - minNative >= 0.5 * cpuExcess)
        "native-burn"
      else if (cpuOut && !tasksFlat) "plan-work"
      else if (cpuOut) "cpu-unattributed"
      else "stall"
    }
  }
}
