#!/usr/bin/env python
"""Measure the batched search_many decode-pruning (union of member-query
masks, VERDICT r4 'what's wrong' #1) on a realistic-vocabulary index.

Reads the index a scale_bench worker left behind (default
/tmp/admarus_scale_idx_4: 800k docs, 200k-term Heaps vocabulary), runs the
scale query batch once with pruning and once with wand='off', and reports
kept/total blocks plus wall seconds and a result-parity check. Evidence row
for BENCH/PLANS.md §7.

Usage: python BENCH/batch_prune_stats.py [index_dir]
"""

from __future__ import annotations

import json
import sys
import time

from admarus_spark.search.engine import SearchEngine
from admarus_spark.session import get_spark
from scale_bench import QUERY_BATCH

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/admarus_scale_idx_4"


def main() -> None:
    spark = get_spark(app_name="batch_prune_stats")
    eng = SearchEngine(spark, IDX)
    qmap = {f"q{i}": q for i, q in enumerate(QUERY_BATCH)}
    eng.search_many(qmap, 10).collect()  # warm plans/workers

    def run(wand: str):
        t0 = time.time()
        rows = eng.search_many(qmap, 10, wand=wand).collect()
        return time.time() - t0, sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 9)) for r in rows
        )

    sec_full, res_full = run("off")
    sec_pruned, res_pruned = run("auto")
    prune = eng.last_batch_prune or {}
    report = {
        "index": IDX,
        "queries": len(qmap),
        "blocks_total": prune.get("blocks_total"),
        "blocks_kept": prune.get("blocks_kept"),
        "reduction_pct": (
            round(100.0 * (1 - prune["blocks_kept"] / prune["blocks_total"]), 1)
            if prune.get("blocks_total")
            else None
        ),
        "full_decode_terms": prune.get("full_terms"),
        "greedy_terms": prune.get("greedy_terms"),
        "terms": prune.get("terms"),
        "batch_sec_full": round(sec_full, 2),
        "batch_sec_pruned": round(sec_pruned, 2),
        "results_match": res_full == res_pruned,
    }
    print(json.dumps(report, indent=2))
    with open("BENCH/BATCH_PRUNE.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
