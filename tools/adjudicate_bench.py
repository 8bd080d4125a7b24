#!/usr/bin/env python3
"""Classify bench drift mechanically from the full-fidelity artifact.

The r11→r12 loop: the driver's bench showed 2–4× cpu drift on
untouched code that the builder's gate could not reproduce, and the
artifact carried no column that could say WHY. r12 added the
discriminators (runsNativeCpu, memCalib, oldGenPostGCMB, heapMaxMB);
this tool reads them together and names the mechanism per query, so
the next verdict adjudicates drift from data instead of prose.

Usage:
  adjudicate_bench.py ARTIFACT.json [BASELINE.json] [--floor 1.0]

ARTIFACT is a full-fidelity bench artifact (bench_artifact.json as the
driver leaves it in the repo root, or a SPARK_GRAFT_ARTIFACT capture).
BASELINE is optional: either another full artifact or a GATE_rN.json
pair (gateRuns schema, per-query minima taken across both runs).

Classification per drifting query (cpu ratio vs baseline > 1.3 at
>= floor s min-cpu; without a baseline, every query >= floor):
  native-burn        minNativeCpu/minCpu > 0.25 — process cpu the Java
                     threads never saw: concurrent-GC / native treadmill
  bandwidth          memCalib > 2.5 x session memBaseline — the probe
                     ran slower beside this query: memory-bandwidth
                     dilution local to this point in the session
  bandwidth-session  the ARTIFACT's own memBaseline is > 2.5 x the
                     BASELINE artifact's — the whole session ran on a
                     diluted box, so per-query memCalib (measured
                     against the same diluted floor) cannot see it;
                     every drifting row is suspect
  metadata-latency   sysCalib > 3 x session syscallBaselineUs (and
                     >= 10 us absolute) — file-metadata ops ran slower
                     beside this query; the wall-only shape of the
                     many-small-reads serve rows (r16)
  metadata-session   the ARTIFACT's own syscallBaselineUs is > 3 x the
                     BASELINE artifact's — the whole session ran in a
                     syscall-degraded window
  recompile          per-run codegen counts above baseline — cache churn
  jit-warmup         min JIT time > 0.5 x min cpu — compiler, not plan
  plan-work          discriminators flat AND the run completed more
                     tasks: the query really did more work; read the
                     plan, not the environment
  cpu-unattributed   discriminators flat at FLAT task counts: identical
                     plan + identical data cannot do "more work" on the
                     same tasks — in-run contention the probes missed
                     (every pre-r17 plan-work the judges adjudicated
                     proved ambient); adjudicate, don't indict
  wall-only          admitted on min-WALL ratio > 1.5 at flat cpu (the
                     r16 shape a cpu-ratio gate can never see); paired
                     with whichever probe fired, or wall-stall(cpu
                     flat) when none did — environment, not plan
Session flags: heap geometry, post-GC live set, spin/mem/syscall
baselines.
"""
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def load_minima(path):
    a = json.load(open(path))
    if "gateRuns" in a:  # GATE_rN.json pair
        runs = a["gateRuns"]
        qs = set(runs[0]["minCpu"])
        for r in runs[1:]:
            qs &= set(r["minCpu"])
        mems = [r.get("memBaseline") for r in runs if r.get("memBaseline")]
        spins = [r.get("spinBaseline") for r in runs if r.get("spinBaseline")]
        syss = [r.get("syscallBaselineUs") for r in runs
                if r.get("syscallBaselineUs")]
        # codegen: only queries the baseline actually measured — a gate
        # run from an older artifact schema has no codegenTotal, and
        # defaulting it to 0 would spuriously classify every >10-class
        # query as 'recompile' (missing != zero)
        cg = {}
        for q in qs:
            vals = [r["codegenTotal"][q] for r in runs
                    if q in r.get("codegenTotal", {})]
            if vals:
                cg[q] = min(vals)
        return {
            "minCpu": {q: min(r["minCpu"][q] for r in runs) for q in qs},
            "minWall": {q: min(r["minWall"][q] for r in runs)
                        for q in qs if all(q in r.get("minWall", {})
                                           for r in runs)},
            "codegenTotal": cg,
            "memBaseline": min(mems) if mems else None,
            "spinBaseline": min(spins) if spins else None,
            "syscallBaselineUs": min(syss) if syss else None,
        }
    return {
        "minCpu": {q: min(v) for q, v in a.get("runsCpu", {}).items()},
        "minWall": {q: min(v) for q, v in a.get("runs", {}).items()},
        "codegenTotal": {q: sum(v) for q, v in
                         a.get("runsCodegen", {}).items()},
        "memBaseline": a.get("memBaseline") or None,
        "spinBaseline": a.get("spinBaseline") or None,
        "syscallBaselineUs": a.get("syscallBaselineUs") or None,
    }


def main():
    argv = sys.argv[1:]
    args, floor, i = [], 1.0, 0
    while i < len(argv):
        x = argv[i]
        if x.startswith("--floor"):
            if "=" in x:
                floor = float(x.split("=", 1)[1])
            else:  # space-separated form: --floor 1.0
                i += 1
                floor = float(argv[i])
        else:
            args.append(x)
        i += 1
    if not args:
        sys.exit(__doc__.split("Usage:")[1].split("\n\n")[0].strip())
    art = json.load(open(args[0]))
    base = load_minima(args[1]) if len(args) > 1 else None

    min_cpu = {q: min(v) for q, v in art.get("runsCpu", {}).items()}
    if not min_cpu:
        sys.exit(f"ERROR: {args[0]} has no runsCpu — not a full-fidelity "
                 "bench artifact (a GATE_rN.json passed as ARTIFACT?)")
    min_wall = {q: min(v) for q, v in art.get("runs", {}).items()}
    min_native = {q: min(v) for q, v in
                  art.get("runsNativeCpu", {}).items()}
    min_jit = {q: min(v) for q, v in art.get("runsJit", {}).items()}
    codegen = {q: sum(v) for q, v in art.get("runsCodegen", {}).items()}
    mem_calib = art.get("memCalib", {})
    mem_base = art.get("memBaseline")
    if mem_base == 0:
        print("NOTE: artifact memBaseline is 0 — bandwidth probe broken "
              "or absent; the bandwidth discriminator is DISABLED")
        mem_base = None
    sys_calib = art.get("sysCalib", {})
    sys_base = art.get("syscallBaselineUs") or None

    # session-level dilution: the artifact's own baseline vs the
    # baseline artifact's. Within a uniformly contaminated session
    # memCalib ~= its own inflated memBaseline, so the per-query check
    # can NEVER fire — only this cross-artifact comparison can.
    session_dilution = None
    if base and mem_base and base.get("memBaseline"):
        session_dilution = mem_base / base["memBaseline"]
    sys_session = None
    if base and sys_base and base.get("syscallBaselineUs"):
        sys_session = sys_base / base["syscallBaselineUs"]

    rows = []
    for q in sorted(min_cpu):
        cpu = min_cpu[q]
        if cpu < floor:
            continue
        ratio = None
        wall_ratio = None
        if base and q in base["minCpu"]:
            ratio = cpu / max(base["minCpu"][q], 0.001)
            # wall-only admission (r16): the metadata-latency shape
            # inflates wall while cpu stays flat (threads blocked in
            # syscalls burn no cpu), so a cpu-ratio gate alone can
            # never surface it — admit rows whose min-wall drifts
            # >1.5x even at flat cpu
            bw = base.get("minWall", {}).get(q)
            w = min_wall.get(q)
            if bw and w and w >= 1.0:
                wall_ratio = w / max(bw, 0.001)
            if ratio <= 1.3 and (wall_ratio is None or wall_ratio <= 1.5):
                continue
        causes = []
        native_share = min_native.get(q, 0.0) / max(cpu, 0.001)
        if native_share > 0.25:
            causes.append(f"native-burn({native_share:.0%})")
        mc = mem_calib.get(q)
        if mc is not None and mem_base and mc > 2.5 * mem_base:
            causes.append(f"bandwidth({mc / mem_base:.1f}x)")
        if session_dilution and session_dilution > 2.5:
            causes.append(f"bandwidth-session({session_dilution:.1f}x)")
        sc = sys_calib.get(q)
        if sc is not None and sys_base and sc > 3 * sys_base and sc >= 10.0:
            causes.append(f"metadata-latency({sc / sys_base:.1f}x)")
        if sys_session and sys_session > 3:
            causes.append(f"metadata-session({sys_session:.1f}x)")
        # recompile is only meaningful against a baseline's MEASURED
        # codegen count — without one (no baseline, or an older-schema
        # baseline with no codegen column for this query), first-compile
        # counts would flag every query that emits any generated code
        if base and q in base["codegenTotal"] and \
                codegen.get(q, 0) > base["codegenTotal"][q] + 10:
            causes.append(f"recompile({codegen.get(q, 0)})")
        if min_jit.get(q, 0.0) > 0.5 * cpu:
            causes.append("jit-warmup")
        wall_only = (ratio is None or ratio <= 1.3) and \
            wall_ratio is not None and wall_ratio > 1.5
        if wall_only:
            causes.append(f"wall-only(x{wall_ratio:.2f})")
            if len(causes) == 1:
                # wall drifted, cpu flat, no probe fired: the JVM spent
                # the excess not running — environment, not plan
                causes.append("wall-stall(cpu flat)")
        if not causes:
            # mirror BenchDrift.classify's PER-RUN tasksFlat test: the
            # run whose drift we are attributing here is the min-cpu
            # run (its best execution still drifted vs baseline), so
            # compare ITS task count against the query's min — a task
            # spike on some OTHER run must not flip flat → plan-work
            # (r17 ADVICE #2)
            tv_flat = art.get("runsTasks", {}).get(q)
            rc = art.get("runsCpu", {}).get(q)
            if tv_flat and rc and len(tv_flat) == len(rc):
                drift_tasks = tv_flat[rc.index(min(rc))]
                flat = drift_tasks - min(tv_flat) < 20
            else:
                flat = bool(tv_flat) and max(tv_flat) - min(tv_flat) < 20
            causes.append("cpu-unattributed(tasks flat)" if flat
                          else "plan-work")
        # r14: the artifact carries its OWN per-run classification
        # (driftVerdicts) and per-run task counts — surface both so
        # this tool's cross-session adjudication and the bench's
        # within-session one are read together. A task-count jump is
        # the decisive recompute signal (a persisted stage was
        # re-executed); steady-state task counts are run-to-run
        # identical for every query, so any spread is signal.
        extra = ""
        iv = art.get("driftVerdicts", {}).get(q)
        if iv:
            extra += f"  inline={','.join(iv)}"
        tv = art.get("runsTasks", {}).get(q)
        if tv and len(set(tv)) > 1:
            shaped = (max(tv) >= 1.2 * min(tv) and
                      max(tv) - min(tv) >= 20)
            extra += f"  tasks={tv}" + (" RECOMPUTE-SHAPED" if shaped else "")
        rows.append((q, cpu, min_wall.get(q), ratio, causes, extra))

    hdr = "drifting" if base else "all >= floor"
    print(f"# {args[0]} — {hdr} queries (floor {floor}s cpu)")
    for q, cpu, wall, ratio, causes, extra in rows:
        r = f" x{ratio:.2f}" if ratio else ""
        print(f"{q:32s} cpu {cpu:7.2f} wall {wall:6.2f}{r}  "
              f"{', '.join(causes)}{extra}")
    if not rows:
        print("(none drifting — every baseline-matched query >= floor "
              "reproduces within 1.3x)" if base else
              f"(no query reached {floor}s min-cpu)")

    old_gen = art.get("oldGenPostGCMB", {})
    worst_live = max(old_gen.values()) if old_gen else None
    worst_mem = max(mem_calib.values()) if mem_calib else None
    print(f"\nsession: heapMaxMB={art.get('heapMaxMB')} "
          f"postGC-live-set max={worst_live}MB "
          f"spin={art.get('spinBaseline')} "
          f"mem={mem_base}..{worst_mem} "
          f"stalls={len(art.get('stall_windows', []))} "
          f"retries={sum(art.get('retries', {}).values()) if art.get('retries') else 0}")
    if session_dilution and session_dilution > 2.5:
        print(f"WARNING: session memBaseline {mem_base} is "
              f"{session_dilution:.1f}x the baseline artifact's "
              f"{base['memBaseline']} — the WHOLE session ran "
              "bandwidth-diluted; treat every cpu reading as suspect "
              "and re-run on a quiet box")
    if base and base.get("spinBaseline") and art.get("spinBaseline") and \
            art["spinBaseline"] > 2.0 * base["spinBaseline"]:
        print(f"WARNING: spin baseline {art['spinBaseline']} is >2x the "
              f"baseline artifact's {base['spinBaseline']} — cpu "
              "oversubscription during the session")
    if mem_base and worst_mem and worst_mem > 2.5 * mem_base:
        print("WARNING: memory-bandwidth probe degraded >2.5x during the "
              "session — ambient contention; treat cpu drift as suspect")
    if sys_session and sys_session > 3:
        print(f"WARNING: session syscall baseline {sys_base}us is "
              f"{sys_session:.1f}x the baseline artifact's "
              f"{base['syscallBaselineUs']}us — the WHOLE session ran in "
              "a file-metadata-degraded window; walls of many-small-"
              "reads queries are suspect")
    worst_sys = max(sys_calib.values()) if sys_calib else None
    if sys_base and worst_sys and worst_sys > 3 * sys_base and \
            worst_sys >= 10.0:
        print(f"WARNING: syscall probe degraded to {worst_sys}us "
              f"(baseline {sys_base}us) during the session — "
              "file-metadata latency onset mid-run; wall-only drift on "
              "serve rows is ambient, not plan")
    if worst_live and art.get("heapMaxMB") and \
            worst_live > 0.40 * art["heapMaxMB"]:
        print("WARNING: post-GC live set exceeds 40% of heap — G1 "
              "concurrent-mark treadmill territory (check native-burn)")


if __name__ == "__main__":
    main()
