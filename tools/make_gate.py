#!/usr/bin/env python3
"""Merge the two back-to-back gate bench artifacts into one
machine-readable file (the r11 verdict ask: the reproducibility
evidence lived in COVERAGE prose; the judge should be able to diff the
pair mechanically).

Usage: make_gate.py run1.json run2.json GATE_rN.json

Output schema:
  gateRuns: [ {per-query minWall/minCpu/codegen sums, totals, spin/mem
               baselines, heapMaxMB}, ... one per run ]
  cpuRatio: per-query max(minCpu)/min(minCpu) across the runs
  residue:  queries with minCpu >= residue_floor (1.0s) in either run
            whose cpuRatio > 1.3 — the non-reproducing set, explicit
            instead of prose
"""
import json
import sys


def summarize(path):
    a = json.load(open(path))
    return {
        "artifact": path,
        "total": a.get("value"),
        "spinBaseline": a.get("spinBaseline"),
        "memBaseline": a.get("memBaseline"),
        "syscallBaselineUs": a.get("syscallBaselineUs"),
        "heapMaxMB": a.get("heapMaxMB"),
        "codegenCacheMaxEntries": a.get("codegenCacheMaxEntries"),
        "warmup": a.get("warmup"),
        "minWall": {q: min(v) for q, v in a.get("runs", {}).items()},
        "minCpu": {q: min(v) for q, v in a.get("runsCpu", {}).items()},
        "codegenTotal": {q: sum(v) for q, v in a.get("runsCodegen", {}).items()},
        "minNativeCpu": {q: min(v) for q, v in a.get("runsNativeCpu", {}).items()},
        "stalls": len(a.get("stall_windows", [])),
        "retries": sum(a.get("retries", {}).values()) if a.get("retries") else 0,
    }


def main():
    r1, r2, out = sys.argv[1], sys.argv[2], sys.argv[3]
    s1, s2 = summarize(r1), summarize(r2)
    qs = sorted(set(s1["minCpu"]) & set(s2["minCpu"]))
    ratio = {}
    for q in qs:
        a, b = s1["minCpu"][q], s2["minCpu"][q]
        lo, hi = min(a, b), max(a, b)
        # floor lo at one artifact quantum (0.001s) so a zero reading
        # yields a huge finite ratio instead of None — a query reading
        # 0.0 in one run and seconds in the other is the MOST
        # non-reproducing case and must land in residue, not fall out
        ratio[q] = round(hi / max(lo, 0.001), 3)
    floor = 1.0
    residue = sorted(
        q for q in qs
        if max(s1["minCpu"][q], s2["minCpu"][q]) >= floor
        and ratio[q] > 1.3)
    doc = {
        "gateRuns": [s1, s2],
        "cpuRatio": ratio,
        "residue_floor_cpu_sec": floor,
        "residue": residue,
        "within_1p3x": sum(1 for q in qs if ratio[q] <= 1.3),
        "queries_compared": len(qs),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{out}: {doc['within_1p3x']}/{len(qs)} queries min-cpu within "
          f"1.3x across the gate pair; residue (>= {floor}s cpu): {residue}")


if __name__ == "__main__":
    main()
