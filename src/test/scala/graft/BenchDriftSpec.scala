package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.BenchDrift.{Baselines, RunCols, classify}

/** Replays RECORDED bench-artifact columns through the production
  * drift classifier (r16 verdict #1's done-criterion). Fixtures are
  * copied verbatim from:
  *  - the r16 DRIVER artifact (repo bench_artifact.json, total
  *    69.653 s, baselines spin 0.078 / mem 0.009 / sys 5.5 µs) — the
  *    session whose `dedup_embedding_lsh_090` run 2 (603 s cpu, jit
  *    3.1 s = 0.5% of the excess, mem probe 3.3× baseline) got the
  *    benign tier-warmup label because the warmup window was tested
  *    before the dilution probes;
  *  - the r16 probe-A (free-ON decay) and probe-B (free-OFF) fixture
  *    artifacts — the tier-settling root-cause evidence, which must
  *    keep its benign verdicts under the reordered classifier.
  *
  * Columns are (wall, cpu, tasks, codegen, jit, nativeCpu, spin, mem,
  * sys); probe A/B predate the syscall column, so sys=0 there (probe
  * can't fire — same as the artifact's absence of evidence).
  */
class BenchDriftSpec extends AnyFunSuite {

  private def runs(rows: (Double, Double, Long, Long, Double, Double,
      Double, Double, Double)*): Seq[RunCols] =
    rows.zipWithIndex.map { case ((w, c, t, cg, j, n, sp, m, sy), i) =>
      RunCols(i + 1, w, c, t, cg, j, n, sp, m, sy)
    }

  private val driverB = Baselines(spin = 0.078, mem = 0.009, sysUs = 5.5)
  private val probeAB = Baselines(spin = 0.076, mem = 0.010, sysUs = 5.3)
  private val probeBB = Baselines(spin = 0.078, mem = 0.010, sysUs = 5.3)

  // ------------------------------------------------------------------
  // The r16 misclassification itself (verdict #1's named done-check):
  // run 2's mem probe (0.030 ≥ 2×0.009 and ≥0.025) and sys probe
  // (22.6 ≥ 3×5.5 and ≥10) both fired while jit was immaterial —
  // dilution must win over the warmup window. Run 3 was already
  // mem-dilution and must stay so.
  test("r16 driver dedup_embedding_lsh_090: runs 2 and 3 are mem-dilution") {
    val rs = runs(
      (12.265, 151.85, 207, 54, 5.336, 10.283, 0.079, 0.028, 16.466),
      (44.503, 603.04, 207, 0, 3.118, 11.598, 0.078, 0.030, 22.631),
      (51.619, 678.01, 207, 0, 1.063, 60.496, 0.135, 0.122, 13.987))
    assert(classify(rs, Nil, driverB) ===
      Seq("ok", "mem-dilution", "mem-dilution"))
  }

  // tx_nb_langid run 2: cpu 66.5 vs 9.4 min on 153-of-153 FLAT tasks,
  // jit 1.4 s (2.5% of the excess — fails materiality), every probe
  // clean. Identical plan + identical data + flat tasks cannot be
  // "more Spark work", so this must NOT land in plan-work (the class
  // that indicts a plan — the judge's quiet re-bench reproduced the
  // 1.2 s floor); it is the in-run-contention-the-probes-missed shape.
  test("r16 driver tx_nb_langid: flat-task cpu outlier is cpu-unattributed") {
    val rs = runs(
      (1.749, 14.24, 153, 47, 1.324, 2.026, 0.077, 0.022, 5.632),
      (4.986, 66.49, 153, 0, 1.407, 9.227, 0.078, 0.023, 5.490),
      (1.724, 9.43, 153, 0, 0.501, 4.118, 0.085, 0.024, 5.796))
    assert(classify(rs, Nil, driverB) ===
      Seq("cold-codegen", "cpu-unattributed", "ok"))
  }

  test("r16 driver tx_repetition: run-3 flat-task outlier likewise") {
    val rs = runs(
      (2.061, 27.02, 67, 3, 1.212, 3.112, 0.077, 0.021, 5.044),
      (0.596, 2.91, 67, 0, 0.046, 0.264, 0.076, 0.020, 4.187),
      (0.854, 5.85, 67, 0, 0.248, 0.273, 0.077, 0.022, 4.548))
    assert(classify(rs, Nil, driverB) ===
      Seq("tier-warmup", "ok", "cpu-unattributed"))
  }

  // Driver rows where the mem probe fired on what r16 labeled
  // tier-warmup — the precedence fix relabels them as the ambient
  // dilution the adjudication proved they were.
  test("r16 driver fired-probe rows relabel to mem-dilution") {
    val knnGraph = runs(
      (1.507, 18.68, 38, 5, 2.050, 2.561, 0.079, 0.026, 5.426),
      (1.008, 9.62, 38, 0, 1.503, 1.536, 0.078, 0.026, 4.875),
      (0.741, 5.74, 38, 0, 1.038, 1.681, 0.077, 0.023, 5.180))
    assert(classify(knnGraph, Nil, driverB) ===
      Seq("mem-dilution", "mem-dilution", "ok"))
    val knnGraphLsh = runs(
      (3.301, 43.57, 118, 19, 3.958, 5.876, 0.078, 0.028, 6.699),
      (8.201, 164.20, 118, 0, 1.765, 16.554, 0.077, 0.028, 7.664),
      (2.099, 16.30, 118, 0, 2.195, 2.991, 0.077, 0.027, 10.113))
    assert(classify(knnGraphLsh, Nil, driverB) ===
      Seq("cold-codegen", "mem-dilution", "ok"))
    val dedupChunks = runs(
      (3.803, 22.13, 200, 40, 5.705, 6.643, 0.077, 0.027, 6.558),
      (12.404, 120.56, 200, 0, 5.015, 6.371, 0.079, 0.025, 15.023),
      (19.235, 26.70, 200, 0, 1.438, 5.926, 0.095, 0.023, 4.968))
    assert(classify(dedupChunks, Nil, driverB) ===
      Seq("ok", "mem-dilution", "stall"))
  }

  // Benign labels that must survive the reorder: jit-warmup (jit ≥50%
  // of excess) still outranks the dilution probes, and a MATERIAL
  // tier-warmup (probe B emb_knn_graph_lsh run 2: jit 1.54 s = 17% of
  // a 9.3 s excess, probes clean) still classifies as settling.
  test("probe-A/B fixture verdicts hold under the reordered classifier") {
    // probe A tx_nb_langid run 1: jit delta 1.58 ≥ 0.5 × 2.6 excess
    val aLangid = runs(
      (1.431, 7.39, 153, 0, 2.404, 3.288, 0.080, 0.023, 0.0),
      (1.354, 5.79, 153, 0, 1.292, 1.377, 0.082, 0.025, 0.0),
      (1.124, 4.79, 153, 0, 0.827, 1.942, 0.080, 0.023, 0.0))
    assert(classify(aLangid, Nil, probeAB) ===
      Seq("jit-warmup", "ok", "ok"))
    val bKnnLsh = runs(
      (4.057, 41.96, 118, 15, 7.263, 8.600, 0.078, 0.022, 0.0),
      (1.908, 19.75, 118, 0, 1.543, 1.562, 0.076, 0.022, 0.0),
      (1.395, 10.47, 118, 0, 1.162, 1.207, 0.078, 0.028, 0.0))
    assert(classify(bKnnLsh, Nil, probeBB) ===
      Seq("cold-codegen", "tier-warmup", "ok"))
    val bEmbTopk = runs(
      (1.605, 10.83, 38, 21, 5.946, 6.054, 0.079, 0.030, 0.0),
      (0.818, 4.14, 38, 0, 1.879, 2.530, 0.077, 0.026, 0.0),
      (0.713, 2.63, 38, 0, 1.104, 1.355, 0.080, 0.029, 0.0))
    assert(classify(bEmbTopk, Nil, probeBB) ===
      Seq("cold-codegen", "jit-warmup", "ok"))
    val bChunks = runs(
      (6.241, 49.55, 200, 50, 27.629, 23.749, 0.076, 0.024, 0.0),
      (2.169, 10.96, 200, 0, 5.952, 5.194, 0.081, 0.028, 0.0),
      (1.879, 9.45, 200, 0, 4.606, 4.330, 0.079, 0.030, 0.0))
    assert(classify(bChunks, Nil, probeBB) ===
      Seq("cold-codegen", "ok", "ok"))
  }

  // Probe A dedup_exact_runs_apply run 1: the mem probe fired (0.026 ≥
  // 2×0.010 and ≥0.025) on a settling-window run — under the judge's
  // prescribed precedence ("dilution whenever their probes fire") the
  // fired probe wins. Both labels are benign; the relabel just states
  // which evidence was direct.
  test("probe A dedup_exact_runs_apply: fired mem probe outranks the window") {
    val rs = runs(
      (2.163, 20.88, 243, 0, 3.255, 5.376, 0.082, 0.026, 0.0),
      (1.557, 6.58, 243, 0, 1.055, 1.825, 0.083, 0.032, 0.0),
      (1.479, 6.09, 243, 0, 1.092, 1.482, 0.099, 0.030, 0.0))
    assert(classify(rs, Nil, probeAB) ===
      Seq("mem-dilution", "ok", "ok"))
  }

  // ------------------------------------------------------------------
  // r16 ADVICE #4: a stall KEPT after retry exhaustion is appended to
  // the accepted runs AND remains in stall_windows with the SAME run
  // number; counting it twice closed the two-execution tier-warmup
  // window one run early. Synthetic shape: run 1 accepted AND
  // stall-recorded (kept), run 2 a genuine settling transient (flat
  // tasks, material jit, probes clean). executionsBefore(run 2) must
  // be 1 (distinct run numbers), keeping the window open.
  test("kept stall counts once toward the tier-warmup window") {
    val rs = runs(
      (9.0, 12.0, 100, 40, 4.0, 1.0, 0.078, 0.012, 5.0),
      (4.0, 30.0, 100, 0, 3.0, 1.0, 0.078, 0.012, 5.0),
      (2.0, 10.0, 100, 0, 0.5, 1.0, 0.078, 0.012, 5.0))
    // run 1 kept-after-retries: also present in stall_windows as run 1
    assert(classify(rs, stallRuns = Seq(1), driverB) ===
      Seq("cold-codegen", "tier-warmup", "ok"))
    // sanity: a DISTINCT completed stall attempt (run 1 stalled and was
    // dropped, runs 2-4 accepted) still closes the window at the third
    // execution — run 4 with the same transient shape is past it
    val rs2 = Seq(
      RunCols(2, 4.0, 30.0, 100, 0, 3.0, 1.0, 0.078, 0.012, 5.0),
      RunCols(3, 4.0, 30.0, 100, 0, 3.0, 1.0, 0.078, 0.012, 5.0),
      RunCols(4, 4.5, 31.0, 100, 0, 3.1, 1.0, 0.078, 0.012, 5.0),
      RunCols(5, 2.0, 10.0, 100, 0, 0.5, 1.0, 0.078, 0.012, 5.0))
    val v2 = classify(rs2, stallRuns = Seq(1), driverB)
    assert(v2(0) === "tier-warmup") // executionsBefore = 1 (the stall)
    assert(v2(1) === "tier-warmup" || v2(1) === "cpu-unattributed")
    assert(v2(2) === "cpu-unattributed") // window closed at 3 priors
  }

  // plan-work now requires the run to have DONE more (≥20 extra tasks
  // below recompute's 1.2× bar): the only evidence that indicts a plan.
  test("plan-work requires extra tasks; recompute still wins at 1.2x") {
    val extraTasks = runs(
      (2.0, 10.0, 200, 0, 0.1, 1.0, 0.078, 0.012, 5.0),
      (4.0, 25.0, 230, 0, 0.1, 1.0, 0.078, 0.012, 5.0)) // +30 tasks, <1.2×
    assert(classify(extraTasks, Nil, driverB) === Seq("ok", "plan-work"))
    val recompute = runs(
      (2.0, 10.0, 200, 0, 0.1, 1.0, 0.078, 0.012, 5.0),
      (4.0, 25.0, 400, 0, 0.1, 1.0, 0.078, 0.012, 5.0)) // 2× tasks
    assert(classify(recompute, Nil, driverB) === Seq("ok", "recompute"))
  }

  test("sys-dilution fires on the syscall probe for wall-only outliers") {
    val rs = runs(
      (1.0, 5.0, 50, 0, 0.1, 1.0, 0.078, 0.012, 5.0),
      (4.0, 5.2, 50, 0, 0.1, 1.0, 0.078, 0.012, 40.0)) // wall 4×, sys 7×
    assert(classify(rs, Nil, driverB) === Seq("ok", "sys-dilution"))
  }
}
