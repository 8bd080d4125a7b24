#!/usr/bin/env python3
"""Repo-side leak scan with provenance stamping.

Mirrors the driver's LEAKCHECK categories (internal imports/URLs/
packages/buckets, chat links, API-key shapes, internal env vars) over
every tracked text file, and stamps the artifact with the scanned
commit SHA, the dirty-tree flag and a run timestamp — so each round's
scan is self-evidently a fresh run over a known tree (ADVICE r8 #1:
an unstamped zero-hit artifact is indistinguishable from a hand-edited
one).

Usage:  tools/leakcheck.py [out.json]     (default LEAKCHECK_LOCAL.json)
Exit 1 if any category hits.
"""
import json
import re
import subprocess
import sys
from datetime import datetime, timezone

PATTERNS = {
    # corporate-internal import/package shapes (nothing in this repo may
    # depend on non-public code)
    # the keyword must be a FULL dotted path segment ('a.internal.b'),
    # so prose ('from corpus') and Spark's own catalyst.InternalRow
    # (no word boundary inside 'InternalRow'/'corpus') don't hit
    "internal-import": r"(?:import|from)\s+[a-z0-9_]+(?:\.[a-z0-9_]+)*\.(?:internal|corp|proprietary)\b[a-z0-9_.]*",
    # URLs that are not public internet hosts
    "internal-url": r"https?://[a-z0-9.-]*(?:\.corp\.|\.internal\.|intranet)[a-z0-9./-]*",
    "internal-pkg2": r"\b(?:go/[a-z][a-z0-9-]{1,40})\b",
    # cloud bucket references (this repo reads only /root/testdata)
    "internal-bucket": r"(?:s3|gs)://[a-z0-9._-]+",
    "slack-link": r"https?://[a-z0-9-]+\.slack\.com/[^\s\"']*",
    # credential shapes
    "api-key": r"(?:sk|pk|key|token)[-_][A-Za-z0-9]{24,}",
    # env vars not in the documented SPARK_GRAFT_* / standard set
    "axon-env": r"\b(?:AXON|ANTHROPIC|CORP)_[A-Z0-9_]+\b",
}


def tracked_files():
    out = subprocess.run(["git", "ls-files"], capture_output=True, text=True,
                         check=True).stdout.splitlines()
    return [f for f in out if not f.endswith((".parquet", ".png", ".jpg"))]


def main(out_path: str) -> int:
    sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                         text=True, check=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"],
                           capture_output=True, text=True,
                           check=True).stdout.strip() != ""
    hits = {k: [] for k in PATTERNS}
    compiled = {k: re.compile(v, re.IGNORECASE) for k, v in PATTERNS.items()}
    n_files = 0
    for f in tracked_files():
        if f == "tools/leakcheck.py":  # the pattern definitions themselves
            continue
        try:
            text = open(f, encoding="utf-8", errors="ignore").read()
        except OSError:
            continue
        n_files += 1
        for k, rx in compiled.items():
            for m in rx.finditer(text):
                hits[k].append({"file": f, "match": m.group(0)[:80]})
    n_hits = sum(len(v) for v in hits.values())
    artifact = {
        "commit": sha,
        "dirty_tree": dirty,
        "run_at_utc": datetime.now(timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "files_scanned": n_files,
        "n_hits": n_hits,
        "hits": hits,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=2)
        fh.write("\n")
    print(f"{out_path}: {n_files} files, {n_hits} hits @ {sha[:12]}"
          f"{' (dirty)' if dirty else ''}")
    return 1 if n_hits else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_LOCAL.json"))
