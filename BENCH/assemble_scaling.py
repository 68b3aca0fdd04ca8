#!/usr/bin/env python
"""Assemble BENCH/SCALING.json from individual worker JSON files.

Usage: python BENCH/assemble_scaling.py [-o OUT.json] /tmp/sb_*.json
Workers are the output of `python scale_bench.py --worker N` (one JSON line).
Per-level minimum is used (one-sided environmental noise on the shared VM).
"""

import json
import os
import sys


def main(paths: list[str]) -> None:
    runs: dict[int, list[dict]] = {}
    skipped = []
    for p in paths:
        try:
            with open(p) as f:
                # one JSON object per file (sb_*.json) OR one per line
                # (scale_bench's per-sample JSONL)
                recs = [json.loads(l) for l in f if l.strip()]
            for r in recs:
                runs.setdefault(int(r["cpus"]), []).append(r)
            if not recs:
                skipped.append(p)
        except (OSError, ValueError, KeyError):
            skipped.append(p)
    if skipped:
        print(f"warning: skipped unreadable/unparseable inputs: {skipped}", file=sys.stderr)
    if not runs:
        raise SystemExit(
            "no usable worker samples — pass the JSON files written by "
            "`python scale_bench.py --worker N` (e.g. /tmp/sb_*.json)"
        )
    levels = sorted(runs)
    best = {c: min(rs, key=lambda r: r["build_sec"]) for c, rs in runs.items()}
    qbest = {
        c: min(qs)
        for c, rs in runs.items()
        if (qs := [r["query_sec"] for r in rs if r.get("query_sec") is not None])
    }
    thr = {c: best[c]["n_docs"] / best[c]["build_sec"] for c in levels}
    n_q = 10

    def eff(metric, lo, hi):
        if lo not in metric or hi not in metric:
            return None
        return round((metric[hi] / metric[lo]) / (hi / lo), 3)

    qps = {c: n_q / qbest[c] for c in qbest}
    pairs = [(lo, hi) for lo in levels for hi in levels if hi == 4 * lo]
    report = {
        "n_docs": best[levels[0]]["n_docs"],
        "total_tokens": best[levels[0]]["total_tokens"],
        "samples": {f"local{c}": sorted(round(r["build_sec"], 2) for r in runs[c]) for c in levels},
        "build_sec_min": {f"local{c}": round(best[c]["build_sec"], 2) for c in levels},
        "build_docs_per_sec": {f"local{c}": round(thr[c], 1) for c in levels},
        "stage_sec": {f"local{c}": best[c].get("stage_sec") for c in levels},
        "query_batch_sec_min": {f"local{c}": round(qbest[c], 2) for c in qbest},
        "scaling_efficiency": {
            **{f"build_{lo}_to_{hi}": eff(thr, lo, hi) for lo, hi in pairs},
            "build_2_to_32": eff(thr, 2, 32),
            **{f"query_{lo}_to_{hi}": eff(qps, lo, hi) for lo, hi in pairs},
        },
    }
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")

if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv[:1] == ["-o"]:
        OUT_PATH = argv[1]
        argv = argv[2:]
    main(argv)
