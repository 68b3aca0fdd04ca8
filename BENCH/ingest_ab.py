#!/usr/bin/env python
"""Controlled A/B of this session's incremental changes -> BENCH/INGEST_AB.json.

Alternates the ingest worker (update 8k-doc delta + compact, local[4],
fresh copy of the same persisted 800k index per sample) between the
PRE-session code (a git-archive snapshot of f39594d under /tmp/admarus_old)
and HEAD, back-to-back in one window — the same isolation methodology as
TID_AB/SHARD_AB. Bounds what the crash-protocol reorder (update) and the
split-fold compaction (compact) actually cost or save, independent of
window noise and of the index-layout difference vs the committed
INGEST.json (whose fixture indexes were built at the measurement
parallelism, not copied from one local[32] build).

Usage: python BENCH/ingest_ab.py   (INGEST_AB_ROUNDS=3 by default; the
old snapshot must already exist at /tmp/admarus_old)
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD = os.environ.get("INGEST_AB_OLD", "/tmp/admarus_old")
ROUNDS = int(os.environ.get("INGEST_AB_ROUNDS", "3"))
CPUS = os.environ.get("INGEST_AB_CPUS", "4")
OUT = os.path.join(REPO, "BENCH", "INGEST_AB.json")

if not os.path.isdir(OLD):
    raise SystemExit(f"old snapshot missing at {OLD} (git archive <commit> | tar -x)")

samples = {"old": [], "head": []}
for r in range(ROUNDS):
    for variant, root in (("old", OLD), ("head", REPO)):
        out = subprocess.run(
            [sys.executable, os.path.join(root, "BENCH", "ingest_bench.py"),
             "--worker", CPUS],
            capture_output=True, text=True, cwd=root,
        )
        if out.returncode != 0:
            print(out.stderr[-3000:], flush=True)
            raise SystemExit(f"worker failed: variant={variant}")
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        samples[variant].append(
            {"update_sec": rec["update_sec"], "compact_sec": rec["compact_sec"]}
        )
        print(f"[round {r + 1}/{ROUNDS}] {variant}: update {rec['update_sec']}s "
              f"compact {rec['compact_sec']}s", flush=True)

report = {
    "cpus": int(CPUS),
    "n_delta": int(os.environ.get("SPARK_GRAFT_INGEST_DOCS", "8000")),
    "old_commit": os.environ.get("INGEST_AB_OLD_COMMIT", "f39594d"),
    "note": "pre-session vs HEAD incremental code, alternated back-to-back; "
            "same index fixture (one local[32] build copied), same window",
    "samples": samples,
    "min": {
        v: {
            "update_sec": min(s["update_sec"] for s in samples[v]),
            "compact_sec": min(s["compact_sec"] for s in samples[v]),
        }
        for v in samples
    },
}
with open(OUT, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report["min"]), flush=True)
